"""P1 file-tree source: the reference's primary input is a directory of
files (cmd/cdcbench/bench.go walks a tree, one chunker per file). Spark's
binaryFile source gives the same shape declaratively -- one row per file,
content as a binary column -- with partition-parallel reads and Catalyst
handling file listing/splitting.

At 100 TB the same reader works unchanged: binaryFile is splittable across
executors at file granularity (matching the reference's file-level
parallelism), and `pathGlobFilter`/`recursiveFileLookup` push the tree walk
into the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def clips_from_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    codec: str = "pcm_s16le",
    sr_hz: int = 16000,
) -> DataFrame:
    """Directory of audio payload files -> the clips schema
    (BASELINE.json input_hint). clip_id is the file path; dur_ms is derived
    from the payload length for raw PCM (0 for opaque codecs -- the decode
    stage owns it)."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    dur = (
        (F.length("content") / 2 / sr_hz * 1000).cast("int")
        if codec == "pcm_s16le"
        else F.lit(0)
    )
    return df.select(
        F.col("path").alias("clip_id"),
        F.col("content").alias("bytes"),
        F.lit(sr_hz).alias("sr_hz"),
        dur.alias("dur_ms"),
        F.lit(codec).alias("codec"),
        F.lit("").alias("transcript"),
    )
