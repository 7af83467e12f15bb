"""Pipeline oversized-clip routing (PipelineConfig.max_cell_bytes): clips
bigger than one Arrow-cell budget detour through the bounded-memory ranged
chunker (operators/bigfile.py) inside the chunks_pcm stage; everything
downstream must be unaffected -- identical chunk relation, identical
component labels vs the whole-buffer run -- and the routing must be
observable in lineage (bigfile_stitch row with fallback counts)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
from go_cdc_chunkers_spark.sources import clips as clips_src

SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
          "codec string, transcript string")
CELL = 64 << 10  # 64 KB cell budget; base clips are 4.8-38 KB, small path


@pytest.fixture(scope="module")
def corpus(spark):
    rows, truth = clips_src.generate_clips(
        n_base=16, dup_frac=0.3, near_frac=0.2, n_const=0, seed=9)
    # one oversized clip (~3.2x the cell budget -> >2 ranges) + an edited
    # near-dup of it, also oversized: the big tail must not just chunk, it
    # must CLUSTER through the same downstream stages
    rng = np.random.default_rng(77)
    n = (int(CELL * 3.2)) // 2
    pcm = (rng.standard_normal(n) * 8000).astype("<i2")
    big = dict(clip_id="big-00000000", bytes=pcm.tobytes(), sr_hz=16000,
               dur_ms=n * 1000 // 16000, codec="pcm_s16le",
               transcript="giant clip of white noise content")
    near = dict(big, clip_id="big-00000000-near",
                bytes=clips_src.edit_pcm_bytes(big["bytes"], 4, seed=5))
    rows = rows + [big, near]
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in rows], SCHEMA)
    df.cache().count()
    return df


def _run(spark, df, wd, max_cell_bytes):
    pipe = Pipeline(spark, wd, PipelineConfig(max_cell_bytes=max_cell_bytes))
    comps = pipe.run(df)
    return pipe, {r.clip_id: r.component_id for r in comps.collect()}


def test_ranged_routing_matches_whole_buffer(spark, corpus, tmp_path):
    pipe_w, label_whole = _run(spark, corpus, str(tmp_path / "whole"), None)
    pipe_r, label_ranged = _run(spark, corpus, str(tmp_path / "ranged"), CELL)

    # identical labels, and the oversized near-dup pair really clustered
    assert label_ranged == label_whole
    assert label_ranged["big-00000000"] == label_ranged["big-00000000-near"]

    # chunk relation byte-identical (the bigfile stitch guarantee holds
    # through the routing + clip_id mapping)
    def chunk_rows(pipe):
        return sorted(
            (r.clip_id, r.chunk_idx, r.offset, r.length, bytes(r.chunk_hash))
            for r in spark.read.parquet(pipe._path("chunks_pcm")).collect())

    assert chunk_rows(pipe_r) == chunk_rows(pipe_w)

    # the big tail actually took the ranged path: >1 range per big clip
    cand = spark.read.parquet(pipe_r._path("bigfile_cand"))
    per_file = cand.groupBy("clip_id").agg(
        F.max("n_ranges").alias("n")).collect()
    assert len(per_file) == 2 and all(r.n >= 3 for r in per_file), per_file

    # telemetry: bigfile_stitch lineage row, zero fallbacks on this content
    lin = [json.loads(line) for line in
           open(f"{pipe_r.workdir}/lineage.jsonl")]
    stitch = [r for r in lin if r["stage"] == "bigfile_stitch"]
    assert len(stitch) == 1
    assert stitch[0]["rows_out"] == 2  # two oversized clips routed
    assert stitch[0]["bigfile_fallback_files"] == 0


def test_max_cell_bytes_with_empty_big_tail(spark, tmp_path):
    """max_cell_bytes set but nothing exceeds it: the ranged stages run
    over empty relations end to end, output equals a plain run."""
    rows, _ = clips_src.generate_clips(
        n_base=6, dup_frac=0.3, near_frac=0.0, n_const=0, seed=5)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in rows], SCHEMA)
    _pipe, labels = _run(spark, df, str(tmp_path / "cell"), 10 << 20)
    _pipe2, plain = _run(spark, df, str(tmp_path / "plain"), None)
    assert labels == plain


def test_max_cell_bytes_validation(spark, tmp_path):
    df = spark.createDataFrame([("a", bytearray(b"xy"), 16000, 1,
                                 "pcm_s16le", "t")], SCHEMA)
    pipe = Pipeline(spark, str(tmp_path / "bad"),
                    PipelineConfig(max_cell_bytes=1024))  # < 2x max_size 2048
    with pytest.raises(ValueError, match="max_cell_bytes"):
        pipe.run(df)
