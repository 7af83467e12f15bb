"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship end-to-end slice -- synthesize the deterministic
clips table (BASELINE.json input_hint shape), chunk it with fastcdc-v1.0.0
through the vectorized pandas-UDF kernel, and return the per-algo
measure + distribution metrics row (SURVEY.md build plan step 2).

queries(): one entry per implemented operator (SURVEY.md section 2). EVERY
query carries an exact DuckDB oracle: relational / dedup / text / embedding
operators directly; CDC / sketch / frame-feature queries by materializing
their non-SQL intermediate relation (chunks, sketch pieces, centroids,
integer frame features) to a deterministic parquet path that the oracle SQL
reads back (the cutpoint scan itself is pinned byte-for-byte by the
126-case golden suite, tests/test_golden.py).

Column names are aliased identically in Spark and SQL so the driver's
order-insensitive value-hash comparison holds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_cdc_chunkers_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return EQ.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return EQ.QUERIES


def oracle_sql() -> dict[str, str]:
    return EQ.ORACLES
