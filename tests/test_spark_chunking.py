"""Spark chunking stage correctness: the pandas-UDF path must emit exactly
the kernel's (and therefore the reference's) chunks, independent of
partitioning / Arrow batching (the buffer-equivalence analogue,
buffer_test.go:59-114)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.cdc import kernels
from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts, resolve
from go_cdc_chunkers_spark.operators import chunking, stats
from go_cdc_chunkers_spark.sources import clips as clips_src

OPTS = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)


@pytest.fixture(scope="module")
def clips_df(spark):
    rows, _ = clips_src.generate_clips(n_base=30, dup_frac=0.2, near_frac=0.2,
                                       n_const=2, seed=7)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in rows],
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    df.cache().count()
    return df, rows


@pytest.mark.parametrize("algo", ["fastcdc-v1.0.0", "jc-v1.1.0", "ultracdc-v1.0.0", "kfastcdc"])
def test_spark_chunks_match_kernel(spark, clips_df, algo):
    df, rows = clips_df
    opts = OPTS if algo != "kfastcdc" else ChunkerOpts(
        min_size=256, normal_size=1024, max_size=8192,
        key=bytes((i * 7 + 3) & 0xFF for i in range(32)))
    got = (
        chunking.chunk_clips(df, algo, opts)
        .orderBy("clip_id", "chunk_idx")
        .collect()
    )
    r = resolve(algo, opts)
    want = []
    for row in rows:
        for idx, (o, ln, h) in enumerate(kernels.split_chunks(r, row["bytes"])):
            want.append((row["clip_id"], idx, o, ln, h))
    want.sort()
    got_t = [(x.clip_id, x.chunk_idx, x.offset, x.length, bytes(x.chunk_hash)) for x in got]
    assert got_t == want
    # sha256 digests truly are content digests
    d = rows[0]["bytes"]
    first = next(x for x in got if x.clip_id == rows[0]["clip_id"] and x.chunk_idx == 0)
    assert bytes(first.chunk_hash) == hashlib.sha256(d[: first.length]).digest()


def test_partitioning_invariance(spark, clips_df):
    df, _ = clips_df
    a = chunking.chunk_clips(df.repartition(1), "fastcdc-v1.0.0", OPTS)
    b = chunking.chunk_clips(df.repartition(13), "fastcdc-v1.0.0", OPTS)
    ra = sorted((x.clip_id, x.chunk_idx, x.offset, x.length) for x in a.collect())
    rb = sorted((x.clip_id, x.chunk_idx, x.offset, x.length) for x in b.collect())
    assert ra == rb


def test_chunking_plan_is_narrow_and_vectorized(spark, clips_df):
    """Plan shape: ArrowEvalPython (vectorized), no shuffle, no row-wise
    BatchEvalPython."""
    df, _ = clips_df
    plan = chunking.chunk_clips(df, "fastcdc-v1.0.0", OPTS)._jdf.queryExecution().executedPlan().toString()
    # exactly ONE Python stage: a duplicated ArrowEvalPython means Catalyst
    # re-extracted the UDF (e.g. into a pre-Generate filter) and the kernel
    # would run twice per row.
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # narrow: scan -> udf -> generate -> project


def test_measure_dedup_ratio_on_duplicated_corpus(spark):
    """cmd/cdc/cdc_test.go:43-58: a corpus where every file appears twice
    dedups to ratio 0.5."""
    rows, _ = clips_src.generate_clips(n_base=10, dup_frac=0.0, near_frac=0.0,
                                       n_const=0, seed=3)
    doubled = [(r["clip_id"], bytearray(r["bytes"])) for r in rows] + [
        (r["clip_id"] + "-copy", bytearray(r["bytes"])) for r in rows
    ]
    df = spark.createDataFrame(doubled, "clip_id string, bytes binary")
    m = stats.measure(chunking.chunk_clips(df, "fastcdc-v1.0.0", OPTS)).collect()[0]
    assert abs(m.dedup_ratio - 0.5) < 1e-9
    assert m.total_bytes == 2 * m.unique_bytes


def test_resync_monotonic(spark):
    """More edits -> (weakly) less shared coverage; light analogue of
    cmd/cdc/cdc_test.go:60-87."""
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()

    def edited(n_edits, seed):
        r = np.random.default_rng(seed)
        out = np.frombuffer(base, np.uint8)
        for _ in range(n_edits):
            pos = int(r.integers(0, len(out)))
            out = np.concatenate([out[:pos], r.integers(0, 256, 1, dtype=np.uint8), out[pos:]])
        return out.tobytes()

    df0 = spark.createDataFrame([("orig", bytearray(base))], "clip_id string, bytes binary")
    oc = chunking.chunk_clips(df0, "fastcdc-v1.0.0", OPTS)
    shares = []
    for n_edits in (2, 64):
        dfe = spark.createDataFrame(
            [("ed", bytearray(edited(n_edits, 1)))], "clip_id string, bytes binary"
        )
        ec = chunking.chunk_clips(dfe, "fastcdc-v1.0.0", OPTS)
        shares.append(stats.resync_shared(oc, ec).collect()[0].shared_pct)
    assert shares[0] > 0.5  # 2 edits: most bytes still shared
    assert shares[1] <= shares[0] + 1e-9


def test_empty_bytes_yields_no_chunk_rows(spark):
    df = spark.createDataFrame(
        [("empty", bytearray(b"")), ("tiny", bytearray(b"\x42"))],
        "clip_id string, bytes binary",
    )
    out = chunking.chunk_clips(df, "fastcdc-v1.0.0", OPTS).collect()
    ids = {x.clip_id for x in out}
    assert ids == {"tiny"}
    tiny = [x for x in out if x.clip_id == "tiny"]
    assert len(tiny) == 1 and tiny[0].length == 1 and tiny[0].offset == 0


def test_fingerprint_cuts_hash_matches_kernel(spark, clips_df):
    """Q11 profile parity: the Spark-side cuts_hash (sha256 over LE-uint64
    lengths in chunk order) must equal the kernel fingerprint's cuts_hash
    (itself golden-pinned vs the reference, tests/golden_test.go:52-92)."""
    df, rows = clips_df
    r = resolve("fastcdc-v1.0.0", OPTS)
    chunks = chunking.chunk_clips(df, "fastcdc-v1.0.0", OPTS)
    got = {row.clip_id: row.cuts_hash
           for row in chunking.fingerprint_by_clip(chunks).collect()}
    for rec in rows:
        want = kernels.fingerprint(r, bytes(rec["bytes"]))["cuts_hash"]
        assert got[rec["clip_id"]] == want, rec["clip_id"]


def test_clips_from_files_tree(spark, tmp_path, clips_df):
    """P1 file-tree source (binaryFile): files land in the clips schema and
    chunk identically to the same bytes through the parquet path."""
    from go_cdc_chunkers_spark.sources.files import clips_from_files

    df, rows = clips_df
    d = tmp_path / "tree" / "sub"
    d.mkdir(parents=True)
    for i, rec in enumerate(rows[:4]):
        p = (d if i % 2 else d.parent) / f"{rec['clip_id']}.pcm"
        p.write_bytes(bytes(rec["bytes"]))
    files = clips_from_files(spark, str(tmp_path / "tree"), glob="*.pcm")
    assert files.count() == 4
    got = {
        row.clip_id.split("/")[-1].removesuffix(".pcm"): (row.n_chunks, row.total_bytes)
        for row in chunking.fingerprint_by_clip(
            chunking.chunk_clips(files, "fastcdc-v1.0.0", OPTS)
        ).collect()
    }
    want = {
        row.clip_id: (row.n_chunks, row.total_bytes)
        for row in chunking.fingerprint_by_clip(
            chunking.chunk_clips(df, "fastcdc-v1.0.0", OPTS)
        ).collect()
        if row.clip_id in got
    }
    assert got == want and len(got) == 4
