"""SparkSession factory tuned for this engine.

Local defaults target the sandbox (local[N], single JVM); on a real cluster
the same settings apply except master/memory come from spark-submit. Knobs:

  - shuffle.partitions ~ cores locally; at 100 TB scale this is set to
    ~2-3x total executor cores (and AQE coalesces down after each shuffle).
  - Arrow batch size bounds Python-worker memory for the binary `bytes`
    column: batch_bytes ~ maxRecordsPerBatch x avg clip size x executor
    cores. 256 rows x ~128 KiB ~ 32 MiB per core -- the analogue of the
    reference's pooled scan buffers (chunkers.go:112-152: memory scales
    with concurrency, not row count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "go-cdc-chunkers-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 256,
    extra: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # Executor Python workers don't inherit the driver's sys.path -- only
    # its environment. A driver that imported this package via sys.path
    # manipulation (or from a cwd other than the repo root) would get
    # ModuleNotFoundError in every UDF. Propagate the package's parent dir
    # explicitly; on a real cluster --py-files (tools/package.py) replaces
    # this, and spark-submit's own PYTHONPATH handling wins.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in py_path.split(os.pathsep):
        py_path = pkg_parent + (os.pathsep + py_path if py_path else "")
    # Respect an externally-provided master: under spark-submit the Python
    # driver is spawned BY the JVM (PYSPARK_GATEWAY_PORT is set) and
    # --master already lives in the JVM conf; calling .master() here would
    # override the cluster master with local[N] on every deployment. The
    # env check (not SparkConf().contains("spark.master")) matters: in a
    # plain-python process the first session leaks spark.master into the
    # gateway JVM's system properties, so a conf probe would pin every
    # later get_spark(cpus=...) in that process to the FIRST call's level.
    b = SparkSession.builder
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        b = b.master(f"local[{cpus}]")
    b = (
        b.appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        # Vectorized parquet reads buffer columnarReaderBatchSize ROWS per
        # task; the default 4096 assumes narrow rows. This engine's tables
        # carry multi-KB binary audio cells, so 4096 x ~21 KB x n_cores
        # concurrent tasks OOMed a 1g spark-submit heap at local[8]
        # (measured: chunks_pcm reading the 18k-clip corpus). 512 bounds
        # the per-task scan buffer at ~10 MB for such tables while leaving
        # narrow-table scans whole-stage-codegen'd and fast.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.executorEnv.PYTHONPATH", py_path)
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
