import pytest


@pytest.fixture(scope="session")
def spark():
    from go_cdc_chunkers_spark.session import get_spark

    s = get_spark(app="tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
