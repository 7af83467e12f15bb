"""Physical-plan shape assertions: the properties that make these operators
survive a 100x scale-up, pinned as tests so regressions in plan quality fail
CI, not the cluster.

  - chunking: exactly one ArrowEvalPython, no Exchange (narrow).
  - minhash: exactly one Exchange (the clip_id groupBy) with partial
    aggregation before it; zero Python.
  - bands: projection only on top of the signature aggregate (no extra
    shuffle for band hashing).
  - candidate join: shuffles keyed on (band_id, band_hash), no Python.
  - verification: pure JVM (zip_with/aggregate expressions).
  - parquet scan: filter + column pruning pushed into the scan node.
"""

import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
from go_cdc_chunkers_spark.operators import candidates as cand_ops
from go_cdc_chunkers_spark.operators import chunking, signatures

OPTS = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def clips(spark):
    df = spark.createDataFrame(
        [(f"c{i}", bytearray(bytes([i % 251]) * 3000)) for i in range(20)],
        "clip_id string, bytes binary",
    )
    df.cache().count()
    return df


def test_minhash_single_exchange_no_python(spark, clips):
    chunks = chunking.chunk_clips(clips, "fastcdc-v1.0.0", OPTS)
    sig = signatures.minhash_signatures(chunks, k=32)
    p = plan(sig)
    # one shuffle for the aggregate (plus whatever AQE reads back)
    assert p.count("Exchange hashpartitioning(clip_id") == 1
    assert "partial_min" in p or "HashAggregate" in p
    # the signature aggregate itself adds no Python beyond the chunk UDF
    assert p.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in p


def test_bands_no_extra_shuffle(spark, clips):
    chunks = chunking.chunk_clips(clips, "fastcdc-v1.0.0", OPTS)
    sig = signatures.minhash_signatures(chunks, k=32)
    bands = signatures.lsh_bands(sig, bands=8, rows_per_band=4)
    assert plan(bands).count("Exchange hashpartitioning") == plan(sig).count(
        "Exchange hashpartitioning"
    )


def test_candidate_join_keys(spark):
    bands = spark.createDataFrame(
        [(i % 4, i % 7, f"c{i}", "pcm") for i in range(50)],
        "band_id int, band_hash long, clip_id string, src string",
    )
    cands = cand_ops.candidate_pairs(bands, pair_cap=16)
    p = plan(cands)
    assert "band_id" in p and "band_hash" in p
    assert "Python" not in p  # entire join/verify path is JVM-side


def test_candidate_salted_join_includes_salt_key(spark):
    # The salted hot-bucket join must key on (band, salt group) -- that's
    # the whole point: a hot bucket's pairs spread over G join keys instead
    # of serializing on one task -- and stay JVM-side with no Cartesian.
    bands = spark.createDataFrame(
        [(0, 1, f"c{i}", "pcm") for i in range(50)],
        "band_id int, band_hash long, clip_id string, src string",
    )
    cands = cand_ops.candidate_pairs(bands, pair_cap=8, skew_mode="salted")
    p = plan(cands)
    assert "_sg" in p  # salt group participates in the join key
    assert "xxhash64" in p  # deterministic group assignment
    assert "Python" not in p and "CartesianProduct" not in p


def test_parquet_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in p
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_verification_pure_jvm(spark):
    sig = spark.createDataFrame(
        [("a", [1, 2, 3, 4]), ("b", [1, 2, 9, 9]), ("c", [5, 6, 7, 8])],
        "clip_id string, minhash array<bigint>",
    )
    sim = spark.createDataFrame(
        [("a", 7), ("b", 5), ("c", 1024)], "clip_id string, simhash long"
    )
    cands = spark.createDataFrame(
        [("a", "b", ["pcm"])], "a string, b string, srcs array<string>"
    )
    v = cand_ops.verify_pairs_dual(cands, sig, sig, sim, k=4,
                                   jaccard_threshold=0.5, hamming_threshold=8)
    assert "Python" not in plan(v)
    row = v.collect()[0]
    assert row.jaccard_pcm == 0.5 and row.simhash_ham == 1 and bool(row.is_dup)


def test_ann_scale_paths_no_cartesian(spark):
    """The LSH and IVF search paths must never plan a CartesianProduct:
    LSH candidates come from an equi-join on (band_id, piece); IVF's only
    non-equi join is the intentional broadcast of the tiny centroid table
    (BroadcastNestedLoopJoin is acceptable there; a shuffled cartesian is
    not)."""
    import numpy as np

    from go_cdc_chunkers_spark.operators import similarity

    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") < 5)

    p_lsh = plan(similarity.lsh_bucketed_topk(df, q, k=3))
    assert "CartesianProduct" not in p_lsh

    cents = similarity.ivf_centroids(df, n_centroids=4, iters=0)
    p_ivf = plan(similarity.ivf_topk(df, q, cents, k=3, n_probe=2))
    assert "CartesianProduct" not in p_ivf


def test_simhash_pairs_equi_join_only(spark):
    """SimHash candidate generation joins on (piece_id, piece) -- an
    equi-join, never a cartesian."""
    from go_cdc_chunkers_spark.operators import dedup_text

    docs = spark.createDataFrame(
        [(i, f"w{i} common words here {i}") for i in range(30)],
        "doc_id long, text string",
    )
    p = plan(dedup_text.simhash_pairs(docs, max_hamming=16))
    assert "CartesianProduct" not in p


def test_ivf_seed_selection_is_take_ordered(spark):
    """IVF seeding must plan as TakeOrderedAndProject (per-partition top-k +
    tiny merge), never a single-partition sort/window over the full
    embeddings table -- the round-2 scale-killer. The only tolerated
    single-partition Exchange is over the n_centroids surviving rows."""
    import numpy as np

    from go_cdc_chunkers_spark.operators import similarity

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    ).repartition(8)

    cents = similarity.ivf_centroids(df, n_centroids=4, iters=0)
    p = plan(cents)
    assert "TakeOrderedAndProject" in p
    # The full-table global Sort the old Window required must be gone: any
    # Sort node in this plan may only sit above the 4-row take.
    before_take = p.split("TakeOrderedAndProject")[-1]
    assert "Exchange SinglePartition" not in before_take

    got = cents.collect()
    assert len(got) == 4
    assert sorted(r.centroid_id for r in got) == [1, 2, 3, 4]


def test_audio_fp_pairs_equi_join_only(spark, tmp_path):
    """Spectral-fingerprint matching in its contract usage (fingerprints
    materialized at the stage boundary): exactly one MapInPandas in the
    fingerprint stage, and the matching plan is pure JVM equi-joins --
    zero Python stages, never a CartesianProduct."""
    from go_cdc_chunkers_spark.operators import audio_fp
    from go_cdc_chunkers_spark.sources import clips as clips_src

    rows, _t, _k = clips_src.generate_chord_clips(
        n_base=4, dup_frac=0.25, jitter_frac=0.0, insert_frac=0.0, seed=3)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"])) for r in rows],
        "clip_id string, bytes binary",
    )
    fps = audio_fp.spectral_fingerprints(df)
    assert plan(fps).count("MapInPandas") == 1

    fps.write.mode("overwrite").parquet(str(tmp_path / "fps"))
    pairs = audio_fp.fingerprint_pairs(spark.read.parquet(str(tmp_path / "fps")))
    p = plan(pairs)
    assert "CartesianProduct" not in p
    assert "MapInPandas" not in p and "Python" not in p


def test_containment_stage_pins_explicit_repartition(spark, clips):
    """The containment mapInPandas is CPU-bound Python per row, so its
    parallelism must come from an explicit hash repartition on the pair
    key (shuffle.partitions wide), NOT from AQE's byte-based coalescing --
    AQE merged 233k pairs into 2 partitions split 175k/58k over 2 cores
    (measured, round 5), idling half the cluster on the stage."""
    t = clips.withColumn("transcript", F.concat(F.lit("words for "), "clip_id"))
    verified = spark.createDataFrame(
        [(f"c{i}", f"c{i+1}") for i in range(10)], "a string, b string")
    out = cand_ops.containment_pass(verified, t)
    p = plan(out)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert f"hashpartitioning(a#" in p or "hashpartitioning(a" in p
    # the repartition must carry the explicit width (exempt from AQE
    # coalescing), and the Python stage must sit above it
    assert f", {n_parts})" in p
    assert p.count("MapInPandas") == 1


def test_containment_stage_adaptive_width_from_pair_count(spark, clips):
    """With the exact pair count hinted (the pipeline reads it from the
    verified stage's parquet footers), the explicit repartition sizes to
    ~512 pairs/task instead of a fixed shuffle.partitions width: a tiny
    verified set runs as ONE Python task (no near-empty-task scheduler
    latency), while a large count clamps back to the configured width."""
    t = clips.withColumn("transcript", F.concat(F.lit("words for "), "clip_id"))
    verified = spark.createDataFrame(
        [(f"c{i}", f"c{i+1}") for i in range(10)], "a string, b string")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    p_small = plan(cand_ops.containment_pass(verified, t, n_pairs=10))
    # width 1 plans as a SinglePartition exchange (hashing into one
    # partition is degenerate, Catalyst drops the hashpartitioning)
    assert "SinglePartition" in p_small
    assert f"hashpartitioning(a#" not in p_small or f", {n_parts})" not in p_small
    assert p_small.count("MapInPandas") == 1

    p_big = plan(cand_ops.containment_pass(verified, t, n_pairs=512 * n_parts * 4))
    assert f", {n_parts})" in p_big  # clamped to the configured width
