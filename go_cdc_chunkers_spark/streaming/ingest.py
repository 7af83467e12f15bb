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
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cdc.opts import ChunkerOpts
from ..operators.chunking import chunk_clips, make_chunk_udf

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
                  opts: ChunkerOpts | None = None,
                  normalize_pcm: bool = False) -> DataFrame:
    """Stateless streaming chunking: identical operator as batch (the kernel
    carries no cross-row state, so boundaries match the batch run exactly).
    normalize_pcm chunks the decoded PCM stream via the same decode-fused
    UDF as the batch pipeline (chunk_clips codec_col)."""
    return chunk_clips(clips_stream, algorithm, opts,
                       codec_col="codec" if normalize_pcm else None)


TS_CLIPS_SCHEMA = T.StructType(
    list(CLIPS_SCHEMA.fields) + [T.StructField("event_ts", T.TimestampType())]
)


def stream_clips_with_ts(spark: SparkSession, path: str,
                         max_files_per_trigger: int = 1) -> DataFrame:
    """Clips stream carrying an event-time column (ingest timestamp in
    production; written into the parquet for tests)."""
    return (
        spark.readStream.schema(TS_CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_chunk_stats(
    clips_stream: DataFrame,
    algorithm: str = "fastcdc-v1.0.0",
    opts: ChunkerOpts | None = None,
    window_dur: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Event-time windowed chunk statistics with a watermark for late data:
    per window, chunk count, total bytes, and HLL approx-distinct digests
    (the streaming analogue of stats.measure; exact distinct is a batch
    job over the accumulated table -- the lambda split in the module
    docstring). Append-mode safe: windows finalize once the watermark
    passes window end, late rows inside the watermark still count."""
    udf = make_chunk_udf(algorithm, opts)
    chunks = (
        clips_stream.select(ts_col, F.posexplode_outer(udf(F.col("bytes"))).alias("chunk_idx", "_c"))
        .filter(F.col("chunk_idx").isNotNull())
        .select(
            ts_col,
            F.col("_c.length").alias("length"),
            F.col("_c.chunk_hash").alias("chunk_hash"),
        )
    )
    return (
        chunks.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur))
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("length").cast("long").alias("total_bytes"),
            F.approx_count_distinct("chunk_hash").alias("approx_unique_chunks"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_chunks",
            "total_bytes",
            "approx_unique_chunks",
        )
    )


def streaming_exact_dedup(
    clips_stream: DataFrame,
    algorithm: str = "fastcdc-v1.0.0",
    opts: ChunkerOpts | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Stateful streaming exact chunk dedup: first occurrence of each
    chunk_hash within the watermark horizon survives; re-ingested duplicate
    chunks are dropped across micro-batches. State is bounded by the
    watermark (dropDuplicatesWithinWatermark), which is what keeps this
    runnable forever on a 10^12-clip ingest -- global-history dedup is the
    batch job over the accumulated chunks table (module docstring)."""
    udf = make_chunk_udf(algorithm, opts)
    chunks = (
        clips_stream.select(
            "clip_id", ts_col, F.posexplode_outer(udf(F.col("bytes"))).alias("chunk_idx", "_c")
        )
        .filter(F.col("chunk_idx").isNotNull())
        .select(
            "clip_id",
            ts_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("_c.length").alias("length"),
            F.col("_c.chunk_hash").alias("chunk_hash"),
        )
    )
    return chunks.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["chunk_hash"]
    )


def run_ingest_to_memory(spark: SparkSession, path: str, query_name: str,
                         algorithm: str = "fastcdc-v1.0.0",
                         opts: ChunkerOpts | None = None,
                         normalize_pcm: bool = False):
    """Drive the stream synchronously to completion into an in-memory sink
    (test/smoke harness). Returns the StreamingQuery (stopped)."""
    q = (
        stream_chunks(stream_clips(spark, path), algorithm, opts,
                      normalize_pcm=normalize_pcm)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
