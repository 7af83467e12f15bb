"""SparkSession factory tuned for this engine.

Local defaults target the sandbox (local[N], single JVM); on a real cluster
the same settings apply except master/memory come from spark-submit. Knobs:

  - shuffle.partitions ~ cores locally; at 100 TB scale this is set to
    ~2-3x total executor cores (and AQE coalesces down after each shuffle).
  - Arrow batches are bounded by BYTES (maxBytesPerBatch = 32 MiB per
    in-flight batch per core -- the analogue of the reference's pooled
    scan buffers, chunkers.go:112-152: memory scales with concurrency,
    not row count), with a secondary row cap; narrow relations batch by
    the thousands instead of being throttled to the widest table's safe
    row count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "go-cdc-chunkers-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 4096,
    arrow_batch_bytes: int = 4 << 20,
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
        # Python-worker memory is bounded by BYTES per Arrow batch (the
        # direct knob, Spark 4's maxBytesPerBatch), not by a row cap sized
        # for the widest table: the old 256-row cap kept binary audio
        # batches at ~32 MiB but throttled every narrow relation (tokens,
        # chunk rows, verified pairs) to tiny batches that waste the
        # vectorized kernels. The 4 MiB default is the measured sweet spot
        # for the chunking boundary on this box (1/2/4/8/16/32 MiB sweep:
        # 2-8 MiB within noise of each other, 4x smaller per-worker
        # footprint than the old row-cap math); the row cap stays as a
        # secondary guard for pathological many-tiny-row batches.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(arrow_batch_bytes))
        # Mid-size joins: let the planner (and AQE, at runtime) choose a
        # shuffled hash join instead of always sort-merge -- build sides
        # here are bounded relations (signatures, candidate pairs, band
        # buckets), and skipping both sorts is a straight win; spill safety
        # comes from the same per-partition bounds AQE coalescing enforces.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        # k=128 MinHash aggregates carry 129 columns; the default
        # codegen.maxFields=100 makes Catalyst drop whole-stage codegen for
        # every operator around them (measured 1.4x on a 2M-row x 128-agg
        # probe). 200 covers the widest relation this engine plans.
        .config("spark.sql.codegen.maxFields", "200")
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
