"""Streaming ingest: chunk boundaries from the streaming path must equal the
batch path (the kernel is stateless, so streaming == batch by construction;
this pins it)."""

from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
from go_cdc_chunkers_spark.operators.chunking import chunk_clips
from go_cdc_chunkers_spark.sources import clips as clips_src
from go_cdc_chunkers_spark.streaming.ingest import run_ingest_to_memory

OPTS = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)


def test_streaming_chunks_equal_batch(spark, tmp_path):
    src = str(tmp_path / "clips.parquet")
    clips_src.write_clips_parquet(src, n_base=12, dup_frac=0.2, near_frac=0.2,
                                  n_const=1, seed=5)
    run_ingest_to_memory(spark, str(tmp_path), "stream_out", opts=OPTS)
    got = sorted(
        (r.clip_id, r.chunk_idx, r.offset, r.length)
        for r in spark.sql("SELECT * FROM stream_out").collect()
    )
    batch = chunk_clips(spark.read.parquet(src), "fastcdc-v1.0.0", OPTS)
    want = sorted(
        (r.clip_id, r.chunk_idx, r.offset, r.length) for r in batch.collect()
    )
    assert got == want and len(got) > 0
