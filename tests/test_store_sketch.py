"""Sketch sidecar on the incremental chunk store (operators/incremental.py
+ operators/sketches.py): dedup-planning estimates without scanning the
store.

Pins: (1) estimate quality against exact ground truth; (2) the no-scan
contract -- estimates come from the sidecar alone, proven by running
against a directory holding ONLY the sidecar; (3) append maintenance is
idempotent under batch replay; (4) compaction rebuilds the sidecar
exactly (the dir would otherwise be lost in the swap); (5) the CLI
estimate verb end to end.
"""
import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators import incremental


def _chunks(spark, ids, name="t"):
    """Synthetic chunk relation: binary chunk_hash (production shape),
    one clip per 50 hashes, deterministic content per integer id."""
    return spark.createDataFrame([(i,) for i in ids], "i long").select(
        F.concat(F.lit(name + "-c"), (F.col("i") / 50).cast("int")
                 .cast("string")).alias("clip_id"),
        F.lit("fastcdc-v1.0.0").alias("algo"),
        (F.col("i") % 50).cast("int").alias("chunk_idx"),
        (F.col("i") * 100).alias("offset"),
        F.lit(100).alias("length"),
        F.unhex(F.sha2(F.concat(F.lit("h"), F.col("i").cast("string")),
                       256)).alias("chunk_hash"),
    )


@pytest.fixture()
def store(spark, tmp_path):
    path = str(tmp_path / "sk_store")
    base = _chunks(spark, range(2000), "s")
    incremental.write_chunk_store(base, "t_sk_store", path, n_buckets=8)
    incremental.write_store_sketch(spark, base, path, k=1024)
    return path


def test_estimates_match_ground_truth(spark, store):
    # batch: 1500 hashes, 1000 overlapping the store's [0, 2000)
    batch = _chunks(spark, range(1000, 2500), "b")
    est = incremental.estimate_vs_store(spark, batch, store)
    assert est["batch_unique_exact"] == 1500
    assert abs(est["store_unique_est"] - 2000) / 2000 < 0.05
    assert abs(est["union_unique_est"] - 2500) / 2500 < 0.05
    # novel uniques: truth 500, batch-side estimator (1500 * (1-c))
    assert abs(est["novel_unique_est"] - 500) / 500 < 0.1
    assert abs(est["novel_unique_est"] - 500) <= 3 * max(
        est["novel_unique_sigma"], 1)  # the error bar is honest
    # containment truth 2/3; k=1024 over a 2500-union: sigma ~ 0.02
    assert abs(est["containment_batch_in_store_est"] - 2 / 3) < 0.06
    assert est["containment_sample_size"] > 300
    # the HLL difference is reported too (store-sizing flavor)
    assert abs(est["novel_unique_est_hll"] - 500) / 500 < 0.3


def test_estimate_reads_sidecar_only(spark, store, tmp_path):
    """A directory holding ONLY the _sketch sidecar must estimate
    identically -- proof the store's bucketed data is never read."""
    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    shutil.copytree(os.path.join(store, incremental._SKETCH_DIR),
                    os.path.join(bare, incremental._SKETCH_DIR))
    batch = _chunks(spark, range(1500, 2200), "b")
    full = incremental.estimate_vs_store(spark, batch, store)
    only = incremental.estimate_vs_store(spark, batch, bare)
    assert full == only


def test_missing_sidecar_raises(spark, tmp_path):
    path = str(tmp_path / "nosketch")
    incremental.write_chunk_store(_chunks(spark, range(100), "s"),
                                  "t_sk_nos", path, n_buckets=4)
    with pytest.raises(FileNotFoundError):
        incremental.estimate_vs_store(spark, _chunks(spark, range(10), "b"),
                                      path)


def test_append_maintains_sketch_and_replay_is_idempotent(spark, store):
    batch = _chunks(spark, range(2000, 2600), "b")
    incremental.append_novel(spark, batch, "t_sk_store", store)
    est1 = incremental.estimate_vs_store(spark, batch, store)
    # the appended batch is now fully contained; union adds nothing
    assert est1["containment_batch_in_store_est"] == 1.0
    assert est1["novel_unique_est"] == 0.0
    reg1 = sorted(map(tuple, spark.read.parquet(
        os.path.join(store, "_sketch", "registers")).collect()))
    bk1 = sorted(r["h"] for r in spark.read.parquet(
        os.path.join(store, "_sketch", "bottomk")).collect())
    # replay the same batch: store rows AND sketch must not change
    incremental.append_novel(spark, batch, "t_sk_store", store)
    reg2 = sorted(map(tuple, spark.read.parquet(
        os.path.join(store, "_sketch", "registers")).collect()))
    bk2 = sorted(r["h"] for r in spark.read.parquet(
        os.path.join(store, "_sketch", "bottomk")).collect())
    assert reg1 == reg2 and bk1 == bk2


def test_compact_rebuilds_sidecar(spark, store):
    incremental.append_novel(spark, _chunks(spark, range(2000, 2400), "b"),
                             "t_sk_store", store)
    out = incremental.compact_store(spark, "t_sk_store", store)
    assert out["rows"] == 2400
    meta = incremental.read_store_sketch_meta(store)
    assert meta == {"k": 1024, "hash_mode": "xxhash64"}
    est = incremental.estimate_vs_store(
        spark, _chunks(spark, range(0, 10), "b"), store)
    assert abs(est["store_unique_est"] - 2400) / 2400 < 0.05


def test_cli_estimate_verb(spark, tmp_path):
    """init -> estimate -> append -> estimate through the real CLI."""
    import numpy as np

    rng = np.random.default_rng(11)
    blocks = [rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
              for _ in range(20)]

    def clips(ids, pick):
        return spark.createDataFrame(
            [(f"c{i}", bytearray(b"".join(blocks[j] for j in pick(i))))
             for i in ids], "clip_id string, bytes binary")

    clips(range(10), lambda i: [i % 20, (i + 1) % 20]).write.parquet(
        str(tmp_path / "b0"))
    clips(range(50, 58), lambda i: [5 + i % 15, (i + 7) % 20]
          ).write.parquet(str(tmp_path / "b1"))
    st = str(tmp_path / "store")

    def run(*a):
        r = subprocess.run(
            [sys.executable, "jobs/store.py", *a, "--cpus", "4"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run("init", "--store", st, "--path", str(tmp_path / "b0"),
        "--format", "parquet")
    est = run("estimate", "--store", st, "--path", str(tmp_path / "b1"),
              "--format", "parquet")
    assert est["sketch_backfilled_from_store"] is False
    ap = run("append", "--store", st, "--path", str(tmp_path / "b1"),
             "--format", "parquet")
    # the estimate's novel-unique prediction must agree with the rows the
    # append actually added (small sets: sketches are exact here)
    assert abs(est["novel_unique_est"] - ap["rows_added"]) <= max(
        3, 0.1 * ap["rows_added"]), (est, ap)
    est2 = run("estimate", "--store", st, "--path", str(tmp_path / "b1"),
               "--format", "parquet")
    assert est2["containment_batch_in_store_est"] == 1.0


def test_estimate_tiny_batch_outside_union_bottomk(spark, store, tmp_path):
    """batch << store at small k: when NO batch hash lands in the union
    bottom-k the containment ratio is NULL (0/0) -- the estimate must
    fall back to the clamped HLL difference with an uninformative error
    bar, not crash on float(None). Deterministic: xxhash64 is a fixed
    function, so the top-hashing ids picked below always miss a k=16
    bottom sketch of a 2000-unique store."""
    small = str(tmp_path / "sk_small")
    base = _chunks(spark, range(2000), "s")
    incremental.write_chunk_store(base, "t_sk_small", small, n_buckets=8)
    incremental.write_store_sketch(spark, base, small, k=16)
    # pick the 3 candidate ids whose chunk_hash hashes HIGHEST -- far
    # above the union's 16th-smallest, so n_b == 0 by construction
    cand = _chunks(spark, range(2000, 2500), "b")
    top = [r["i"] for r in cand
           .withColumn("i", F.monotonically_increasing_id())
           .select((F.xxhash64("chunk_hash")).alias("h"), "i")
           .orderBy(F.desc("h")).limit(3).collect()]
    batch = _chunks(spark, [2000 + int(i) for i in top], "b")
    est = incremental.estimate_vs_store(spark, batch, small)
    assert est["containment_sample_size"] == 0
    assert est["containment_batch_in_store_est"] is None
    assert 0.0 <= est["novel_unique_est"] <= est["batch_unique_exact"]
    # uninformative sigma: the whole batch
    assert est["novel_unique_sigma"] == float(est["batch_unique_exact"])
