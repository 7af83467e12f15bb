"""Incremental dedup vs a bucketed chunk store (operators/incremental.py).

Pins the two properties that make the store usable at 10^14 chunk rows:
  1. correctness -- per-clip dup/novel accounting matches a Python
     recomputation from the same chunk relation, across full-copy /
     partial-overlap / fully-novel batch clips;
  2. plan shape -- probing the store NEVER shuffles it: the store-side
     FileScan reads the persisted bucketing (Bucketed: true) and the only
     Exchange in a probe plan is on the new-batch side.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
from go_cdc_chunkers_spark.operators import chunking, incremental

OPTS = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def no_broadcast(spark):
    """Force the scale-representative SortMergeJoin shape (at sandbox sizes
    Spark would broadcast the store, which inverts the plan under test)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Bucketed store of 10 clips + a 3-clip new batch: one exact copy of a
    store clip, one sharing a 20 KB prefix with a store clip, one novel."""
    rng = np.random.default_rng(7)
    store_clips = [(f"s{i}", bytearray(rng.integers(0, 256, 40_000, dtype=np.uint8)))
                   for i in range(10)]
    new_clips = [
        ("n_copy", bytearray(store_clips[0][1])),
        ("n_partial", bytearray(bytes(store_clips[1][1][:20_000])
                                + bytes(rng.integers(0, 256, 20_000, dtype=np.uint8)))),
        ("n_novel", bytearray(rng.integers(0, 256, 40_000, dtype=np.uint8))),
    ]
    schema = "clip_id string, bytes binary"
    store_chunks = chunking.chunk_clips(
        spark.createDataFrame(store_clips, schema), "fastcdc-v1.0.0", OPTS)
    new_chunks = chunking.chunk_clips(
        spark.createDataFrame(new_clips, schema), "fastcdc-v1.0.0", OPTS)

    path = str(tmp_path_factory.mktemp("incr") / "chunk_store")
    incremental.write_chunk_store(store_chunks, "t_incr_store", path, n_buckets=8)
    new_mat = new_chunks.cache()
    new_mat.count()
    return {"path": path, "store": spark.table("t_incr_store"), "new": new_mat}


def test_probe_plan_bucketed_single_exchange(spark, corpus, no_broadcast):
    p = plan(incremental.probe_store(corpus["new"], corpus["store"]))
    assert "Bucketed: true" in p
    assert "SortMergeJoin" in p and "LeftSemi" in p
    # the one Exchange is the probe side being shuffled into the store's
    # bucketing; the store scan feeds the join directly
    assert p.count("Exchange") == 1


def test_broadcast_probe_same_rows_no_store_shuffle(spark, corpus, no_broadcast):
    """The small-batch inverted probe returns identical rows with the store
    feeding BroadcastHashJoins directly -- no SortMergeJoin, no store-side
    Exchange or Sort (even with auto-broadcast off: the broadcasts are
    explicit hints)."""
    smj = incremental.probe_store(corpus["new"], corpus["store"])
    inv = incremental.probe_store(corpus["new"], corpus["store"],
                                  broadcast_batch=True)
    key = lambda r: (r["clip_id"], r["chunk_idx"])  # noqa: E731
    assert sorted(map(key, inv.collect())) == sorted(map(key, smj.collect()))
    p = plan(inv)
    assert "SortMergeJoin" not in p
    # the only Exchanges are the two batch-sized distincts
    assert p.count("Exchange hashpartitioning") == 2


def test_exact_report_matches_python(spark, corpus):
    store_hashes = {bytes(r["chunk_hash"])
                    for r in corpus["store"].select("chunk_hash").collect()}
    expected = {}
    for r in corpus["new"].collect():
        e = expected.setdefault(r["clip_id"],
                                dict(n_chunks=0, total_bytes=0, dup_chunks=0, dup_bytes=0))
        e["n_chunks"] += 1
        e["total_bytes"] += r["length"]
        if bytes(r["chunk_hash"]) in store_hashes:
            e["dup_chunks"] += 1
            e["dup_bytes"] += r["length"]

    rep = {r["clip_id"]: r.asDict()
           for r in incremental.exact_dedup_vs_store(
               corpus["new"], corpus["store"]).collect()}
    assert set(rep) == {"n_copy", "n_partial", "n_novel"}
    for cid, e in expected.items():
        got = rep[cid]
        for k in ("n_chunks", "total_bytes", "dup_chunks", "dup_bytes"):
            assert got[k] == e[k], (cid, k, got, e)
        assert got["fully_dup"] == (e["dup_chunks"] == e["n_chunks"])

    assert rep["n_copy"]["fully_dup"] is True
    # shared 20 KB prefix -> some-but-not-all chunks dedup against the store
    assert 0 < rep["n_partial"]["dup_chunks"] < rep["n_partial"]["n_chunks"]
    assert rep["n_novel"]["dup_chunks"] == 0


def test_register_reattaches_existing_store(spark, corpus, no_broadcast):
    """A fresh catalog (new session / restarted job) re-attaches the store
    directory by DDL; data, bucketing, and results are unchanged."""
    before = {(r["clip_id"], r["fully_dup"])
              for r in incremental.exact_dedup_vs_store(
                  corpus["new"], corpus["store"]).collect()}
    spark.sql("DROP TABLE t_incr_store")  # external: files stay on disk
    store2 = incremental.register_chunk_store(
        spark, "t_incr_store", corpus["path"],
        "clip_id STRING, algo STRING, chunk_idx INT, offset BIGINT, "
        "length INT, chunk_hash BINARY",
        n_buckets=8,
    )
    assert "Bucketed: true" in plan(incremental.probe_store(corpus["new"], store2))
    after = {(r["clip_id"], r["fully_dup"])
             for r in incremental.exact_dedup_vs_store(
                 corpus["new"], store2).collect()}
    assert after == before

    # the store is self-describing: re-attachment with a WRONG bucketing or
    # schema raises instead of silently mis-bucketing joins, and appending
    # with a drifted schema fails fast
    with pytest.raises(ValueError, match="n_buckets"):
        incremental.register_chunk_store(spark, "t_wrong", corpus["path"],
                                         n_buckets=16)
    with pytest.raises(ValueError, match="schema_ddl"):
        incremental.register_chunk_store(spark, "t_wrong", corpus["path"],
                                         schema_ddl="other_col STRING")
    with pytest.raises(ValueError, match="mismatch"):
        incremental.write_chunk_store(
            corpus["new"].drop("offset"), "t_incr_store", corpus["path"],
            n_buckets=8, mode="append")
    # a registered table name can never be silently repointed at (or kept
    # serving) a different store directory
    other = corpus["path"] + "_other"
    incremental.write_chunk_store(corpus["new"], "t_other_store", other,
                                  n_buckets=8)
    with pytest.raises(ValueError, match="already registered"):
        incremental.register_chunk_store(spark, "t_incr_store", other)
    # appending to a directory without store metadata refuses outright
    with pytest.raises(FileNotFoundError, match="_store_meta"):
        incremental.write_chunk_store(
            corpus["new"], "t_nometa", corpus["path"] + "_empty",
            n_buckets=8, mode="append")


def test_append_novel_then_batch_fully_dup(spark, corpus):
    n0 = spark.table("t_incr_store").count()
    incremental.append_novel(spark, corpus["new"], "t_incr_store", corpus["path"],
                             n_buckets=8)
    n1 = spark.table("t_incr_store").count()
    novel_hashes = (corpus["new"].select("chunk_hash").distinct().count()
                    - corpus["new"].join(corpus["store"].select("chunk_hash"),
                                         "chunk_hash", "left_semi")
                    .select("chunk_hash").distinct().count())
    assert n1 == n0 + novel_hashes
    # replaying the same batch: everything is now in the store...
    rep = incremental.exact_dedup_vs_store(
        corpus["new"], spark.table("t_incr_store")).collect()
    assert all(r["fully_dup"] for r in rep)
    # ...and a second append is a no-op (nothing novel remains)
    incremental.append_novel(spark, corpus["new"], "t_incr_store", corpus["path"],
                             n_buckets=8)
    assert spark.table("t_incr_store").count() == n1


def test_compact_store_shrinks_files_same_results(spark, tmp_path, no_broadcast):
    """compact_store after appends: duplicate hashes canonicalized, bucket
    file count shrinks, probe results and the bucketed plan shape are
    unchanged, metadata survives (re-registration works)."""
    import os

    rng = np.random.default_rng(3)
    mk = lambda i, n: (f"k{i}", bytearray(  # noqa: E731
        rng.integers(0, 256, n, dtype=np.uint8).tobytes()))
    schema = "clip_id string, bytes binary"
    base = chunking.chunk_clips(
        spark.createDataFrame([mk(i, 30_000) for i in range(4)], schema),
        "fastcdc-v1.0.0", OPTS)
    more = chunking.chunk_clips(
        spark.createDataFrame([mk(i, 30_000) for i in range(4, 8)], schema),
        "fastcdc-v1.0.0", OPTS)
    probe = chunking.chunk_clips(
        spark.createDataFrame([mk(i, 30_000) for i in range(2, 6)], schema),
        "fastcdc-v1.0.0", OPTS).cache()
    probe.count()

    path = str(tmp_path / "cstore")
    incremental.write_chunk_store(base, "t_compact", path, n_buckets=4)
    incremental.append_novel(spark, more, "t_compact", path)
    n_distinct = (spark.table("t_compact").select("chunk_hash")
                  .distinct().count())
    before = {(r["clip_id"], r["chunk_idx"]) for r in
              incremental.probe_store(probe, spark.table("t_compact")).collect()}

    stats = incremental.compact_store(spark, "t_compact", path)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 4  # one file per bucket
    assert stats["rows"] == n_distinct  # dedupe canonicalized repeats
    assert spark.table("t_compact").count() == n_distinct
    after = {(r["clip_id"], r["chunk_idx"]) for r in
             incremental.probe_store(probe, spark.table("t_compact")).collect()}
    assert after == before
    assert "Bucketed: true" in plan(
        incremental.probe_store(probe, spark.table("t_compact")))
    assert not os.path.exists(path + ".compacting")
    assert not os.path.exists(path + ".old")


def test_store_cli_init_report_append_cycle(tmp_path):
    """jobs/store.py end-to-end: init a store from tree A, report tree B
    (one exact copy of an A file, one novel file), append, report again --
    the copy is fully_dup up front, everything is fully_dup after append,
    and the append adds only the novel file's chunks."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    rng = np.random.default_rng(5)
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    for i in range(4):
        (a / f"clip{i}.pcm").write_bytes(
            rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes())
    (b / "dup0.pcm").write_bytes((a / "clip0.pcm").read_bytes())
    (b / "new0.pcm").write_bytes(
        rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes())

    job = Path(__file__).parent.parent / "jobs" / "store.py"
    store = str(tmp_path / "store")
    sizing = ["--min-size", "256", "--normal-size", "1024", "--max-size", "8192"]

    def run(*argv):
        r = subprocess.run(
            [sys.executable, str(job), *argv, "--store", store, "--cpus", "4",
             *sizing],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-800:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    init = run("init", "--path", str(a))
    assert init["rows"] > 0

    rep = run("report", "--path", str(b))
    flags = {Path(c["clip_id"]).name: c["fully_dup"] for c in rep["clips"]}
    assert flags == {"dup0.pcm": True, "new0.pcm": False}
    assert rep["dup_bytes"] == rep["novel_bytes"] == 50_000

    app = run("append", "--path", str(b))
    assert 0 < app["rows_added"] < init["rows"]  # only new0's chunks

    rep2 = run("report", "--path", str(b), "--broadcast-batch")
    assert rep2["fully_dup_clips"] == rep2["n_clips"] == 2

    comp = run("compact")
    assert comp["files_after"] < comp["files_before"]
    rep3 = run("report", "--path", str(b))
    assert rep3["fully_dup_clips"] == 2 and rep3["dup_bytes"] == 100_000
    assert rep3["truncated"] is False and len(rep3["clips"]) == 2

    # --limit bounds only the detail list; aggregates stay exact and the
    # cut is marked (VERDICT r4 item 6)
    lim = run("report", "--path", str(b), "--limit", "1")
    assert lim["truncated"] is True and len(lim["clips"]) == 1
    assert lim["n_clips"] == 2 and lim["dup_bytes"] == rep3["dup_bytes"]
    assert lim["clips"][0]["clip_id"] == min(
        c["clip_id"] for c in rep3["clips"])  # deterministic order

    # chunking params persist with the store: a report WITHOUT sizing flags
    # uses the init-time parameters (identical accounting)...
    r = subprocess.run(
        [sys.executable, str(job), "report", "--path", str(b),
         "--store", store, "--cpus", "4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    rep4 = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep4["dup_bytes"] == rep3["dup_bytes"]
    # ...and CONFLICTING sizing is refused (different sizing = different
    # hashes = silently-wrong dedup accounting)
    r = subprocess.run(
        [sys.executable, str(job), "report", "--path", str(b),
         "--store", store, "--cpus", "4", "--normal-size", "4096",
         "--min-size", "1024", "--max-size", "32768"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode != 0
    assert "conflicts with the store's persisted chunking" in r.stderr


def test_band_store_candidates_and_stop_band_prune(spark, tmp_path_factory, no_broadcast):
    # store: clip A shares band (0, 111) with the new clip X; a boilerplate
    # band (1, 999) is shared by 100 store clips AND new clip Y
    store_rows = [("A", 0, 111), ("B", 0, 222), ("C", 2, 333)]
    store_rows += [(f"junk{i}", 1, 999) for i in range(100)]
    new_rows = [("X", 0, 111), ("X", 1, 123), ("Y", 1, 999)]
    schema = "clip_id string, band_id int, band_hash long"
    path = str(tmp_path_factory.mktemp("bands") / "band_store")
    incremental.write_band_store(
        spark.createDataFrame(store_rows, schema), "t_band_store", path, n_buckets=8)
    store = spark.table("t_band_store")
    new = spark.createDataFrame(new_rows, schema)

    cands = incremental.near_dup_candidates_vs_store(new, store, max_df=10)
    assert "CartesianProduct" not in plan(cands)
    got = {(r["new_clip"], r["store_clip"]) for r in cands.collect()}
    assert got == {("X", "A")}  # Y's only band is a pruned stop-band

    # the stop-band aggregation itself rides the store's bucketing: grouping
    # on (band_id, band_hash) is clustered by the persisted band_hash
    # partitioning, so no Exchange
    hot = (store.groupBy("band_id", "band_hash")
           .agg(F.count_distinct("clip_id").alias("_df"))
           .filter(F.col("_df") > 10))
    assert plan(hot).count("Exchange") == 0


def test_store_cli_band_kind_cycle(tmp_path):
    """jobs/store.py --kind bands: init a band store from tree A, report
    tree B (one NEAR-dup of an A file -- a few byte edits, invisible to
    exact dedup but band-colliding -- plus one novel file), append,
    compact (persists the _band_df sidecar), report again using the
    sidecar-backed probe. Also pins kind mismatch rejection."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    from go_cdc_chunkers_spark.sources.clips import edit_pcm_bytes

    rng = np.random.default_rng(7)
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    payloads = [rng.integers(0, 256, 80_000, dtype=np.uint8).tobytes()
                for _ in range(3)]
    for i, p in enumerate(payloads):
        (a / f"clip{i}.pcm").write_bytes(p)
    (b / "near0.pcm").write_bytes(edit_pcm_bytes(payloads[0], 4, seed=3))
    (b / "new0.pcm").write_bytes(
        rng.integers(0, 256, 80_000, dtype=np.uint8).tobytes())

    job = Path(__file__).parent.parent / "jobs" / "store.py"
    store = str(tmp_path / "bstore")
    base = ["--kind", "bands", "--store", store, "--cpus", "4",
            "--min-size", "256", "--normal-size", "1024", "--max-size", "8192"]

    def run(*argv, expect_fail=False):
        r = subprocess.run([sys.executable, str(job), *argv],
                           capture_output=True, text=True, timeout=600)
        if expect_fail:
            assert r.returncode != 0, r.stdout[-400:]
            return r.stderr
        assert r.returncode == 0, r.stderr[-800:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    init = run("init", "--path", str(a), *base, "--k", "64", "--bands", "16",
               "--rows-per-band", "4", "--buckets", "8")
    assert init["rows"] > 0 and init["signature"]["k"] == 64

    rep = run("report", "--path", str(b), *base)
    assert rep["used_df_sidecar"] is False  # not compacted yet
    names = {Path(p[0]).name for p in rep["pairs"]}
    assert names == {"near0.pcm"}, rep["pairs"]  # near-dup found, novel not
    assert all(Path(p[1]).name == "clip0.pcm" for p in rep["pairs"])

    app = run("append", "--path", str(b), *base)
    assert app["rows_after"] > app["rows_before"]

    comp = run("compact", *base)
    assert comp["kind"] == "bands"
    rep2 = run("report", "--path", str(b), *base)
    assert rep2["used_df_sidecar"] is True  # compaction persisted _band_df
    # post-append the batch's own bands are in the store; the near pair
    # (and self-collisions, filtered to distinct clips) must still surface
    assert {Path(p[0]).name for p in rep2["pairs"]} >= {"near0.pcm"}

    # a chunks-kind command against a bands store is refused
    err = run("report", "--path", str(b), "--store", store, "--cpus", "4",
              "--min-size", "256", "--normal-size", "1024",
              "--max-size", "8192", expect_fail=True)
    assert "different --kind" in err or "bucketed by" in err


def test_store_cli_opts_built_from_any_size_flag():
    """jobs/store.py: chunking opts must be built when ANY size flag is
    given -- --min-size/--max-size without --normal-size previously fell
    back to algorithm defaults while _chunking.json recorded the flags as
    the store's hash-defining parameters (metadata lying about the cut)."""
    import importlib

    store_mod = importlib.import_module("jobs.store")
    from go_cdc_chunkers_spark.cdc.opts import resolve

    base = {"algo": "fastcdc-v1.0.0", "min_size": None, "normal_size": None,
            "max_size": None}
    assert store_mod._opts_of(base) is None  # no flags -> pure defaults

    only_min = dict(base, min_size=1024)
    opts = store_mod._opts_of(only_min)
    assert opts is not None
    r = resolve("fastcdc-v1.0.0", opts)
    assert r.min_size == 1024  # the flag takes effect...
    d = resolve("fastcdc-v1.0.0", None)
    assert (r.normal_size, r.max_size) == (d.normal_size, d.max_size)  # ...rest default


def test_band_store_df_maintained_by_compaction(spark, tmp_path_factory,
                                                no_broadcast):
    """compact_store persists the band document-frequency sidecar for band
    stores; probes passing it (store_df) carry NO store-wide aggregate in
    their plan (the persisted _band_df scan replaces the groupBy), yield
    identical candidates, and an append invalidates the stale sidecar."""
    store_rows = [("A", 0, 111), ("B", 0, 222), ("C", 2, 333)]
    store_rows += [(f"junk{i}", 1, 999) for i in range(100)]
    new_rows = [("X", 0, 111), ("X", 1, 123), ("Y", 1, 999)]
    schema = "clip_id string, band_id int, band_hash long"
    path = str(tmp_path_factory.mktemp("bands") / "band_store_df")
    incremental.write_band_store(
        spark.createDataFrame(store_rows, schema), "t_band_df", path,
        n_buckets=8)

    assert incremental.read_band_df(spark, path) is None  # pre-compaction
    incremental.compact_store(spark, "t_band_df", path)
    bdf = incremental.read_band_df(spark, path)
    assert bdf is not None
    assert ({(r.band_id, r.band_hash, r.df) for r in
             bdf.filter(F.col("df") > 10).collect()} == {(1, 999, 100)})

    store = spark.table("t_band_df")
    new = spark.createDataFrame(new_rows, schema)
    with_df = incremental.near_dup_candidates_vs_store(
        new, store, max_df=10, store_df=bdf)
    recompute = incremental.near_dup_candidates_vs_store(new, store, max_df=10)
    got = {(r["new_clip"], r["store_clip"]) for r in with_df.collect()}
    assert got == {(r["new_clip"], r["store_clip"])
                   for r in recompute.collect()} == {("X", "A")}

    # plan shape: the probe reads the persisted relation (a _band_df file
    # scan appears) and runs no frequency aggregate over the store -- the
    # only count_distinct in the with_df plan is gone
    p_with, p_without = plan(with_df), plan(recompute)
    assert "_band_df" in p_with
    assert "count(distinct" not in p_with.lower()
    assert "count(distinct" in p_without.lower()

    # appends change frequencies -> the sidecar must not survive them
    incremental.write_band_store(
        spark.createDataFrame([("Z", 3, 444)], schema), "t_band_df", path,
        n_buckets=8, mode="append")
    assert incremental.read_band_df(spark, path) is None
