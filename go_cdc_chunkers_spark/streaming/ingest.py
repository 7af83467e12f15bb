"""Structured Streaming ingest for the clips pipeline.

The reference is a pure batch library (no watermarks/session windows --
SURVEY.md section 2 notes the omission is deliberate), but a web-scale
training-data pipeline ingests continuously, so the chunking + signature
stages are exposed as streaming transformations too:

    readStream(clips dir) -> chunk (same pandas UDF; stateless, so it is
    streaming-safe) -> per-micro-batch signature/metrics via foreachBatch.

Stateless narrow stages (chunking, shingling, banding) run directly on the
stream; the aggregating stages (minhash groupBy, candidate join, CC) are
batch jobs over the accumulated table -- the standard lambda split for
dedup: streaming appends to `chunks`, the clustering job runs on a schedule
over the full table with stage resume (plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..cdc.opts import ChunkerOpts
from ..operators.chunking import chunk_clips

CLIPS_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("dur_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
    T.StructField("transcript", T.StringType()),
])


def stream_clips(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_chunks(clips_stream: DataFrame, algorithm: str = "fastcdc-v1.0.0",
                  opts: ChunkerOpts | None = None) -> DataFrame:
    """Stateless streaming chunking: identical operator as batch (the kernel
    carries no cross-row state, so boundaries match the batch run exactly)."""
    return chunk_clips(clips_stream, algorithm, opts)


def run_ingest_to_memory(spark: SparkSession, path: str, query_name: str,
                         algorithm: str = "fastcdc-v1.0.0",
                         opts: ChunkerOpts | None = None):
    """Drive the stream synchronously to completion into an in-memory sink
    (test/smoke harness). Returns the StreamingQuery (stopped)."""
    q = (
        stream_chunks(stream_clips(spark, path), algorithm, opts)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
