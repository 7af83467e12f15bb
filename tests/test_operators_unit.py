"""Unit tests for the pipeline operators: MinHash estimator bounds, LSH
banding, SimHash, candidate skew handling, connected components, suffix-array
containment, ANN, multimodal audio features."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators import candidates as cand_ops
from go_cdc_chunkers_spark.operators import components, signatures, similarity
from go_cdc_chunkers_spark.operators.candidates import _sa_contains, _suffix_array


# ---------------------------------------------------------------------------
# suffix array (pure python/numpy)
# ---------------------------------------------------------------------------

def test_suffix_array_correct():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 200))
        s = "".join(chr(97 + int(c)) for c in rng.integers(0, 4, n))
        sa = _suffix_array(s)
        suffixes = sorted(range(len(s)), key=lambda i: s[i:])
        assert list(sa) == suffixes, s


def test_sa_contains_matches_in():
    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(1, 80))
        hay = "".join(chr(97 + int(c)) for c in rng.integers(0, 3, n))
        m = int(rng.integers(0, 6))
        needle = "".join(chr(97 + int(c)) for c in rng.integers(0, 3, m))
        assert _sa_contains(hay, needle) == (needle in hay), (hay, needle)


# ---------------------------------------------------------------------------
# MinHash / LSH / SimHash (Spark)
# ---------------------------------------------------------------------------

def test_minhash_jaccard_estimate(spark):
    # Two sets with known Jaccard 1/3 (|A∩B|=50, |A∪B|=150): the k=256
    # estimate should land within ~3 sigma (sigma = sqrt(j(1-j)/k) ~ 0.029).
    a_items = [("a", f"item-{i}") for i in range(100)]
    b_items = [("b", f"item-{i}") for i in range(50, 150)]
    df = spark.createDataFrame(a_items + b_items, "clip_id string, chunk_hash string")
    sig = signatures.minhash_signatures(df, item_col="chunk_hash", k=256).collect()
    s = {r.clip_id: r.minhash for r in sig}
    est = sum(1 for x, y in zip(s["a"], s["b"]) if x == y) / 256
    assert abs(est - 1 / 3) < 0.09
    # identical sets -> identical signatures
    df2 = spark.createDataFrame(
        [("x", f"i{i}") for i in range(30)] + [("y", f"i{i}") for i in range(30)],
        "clip_id string, chunk_hash string",
    )
    sig2 = {r.clip_id: r.minhash for r in
            signatures.minhash_signatures(df2, item_col="chunk_hash", k=64).collect()}
    assert sig2["x"] == sig2["y"]


def test_lsh_bands_shape_and_collision(spark):
    df = spark.createDataFrame(
        [("x", f"i{i}") for i in range(30)] + [("y", f"i{i}") for i in range(30)],
        "clip_id string, chunk_hash string",
    )
    sig = signatures.minhash_signatures(df, item_col="chunk_hash", k=128)
    bands = signatures.lsh_bands(sig, bands=16, rows_per_band=8)
    rows = bands.collect()
    assert len(rows) == 2 * 16
    byband = {}
    for r in rows:
        byband.setdefault((r.band_id, r.band_hash), []).append(r.clip_id)
    # identical signatures collide in every band
    assert all(len(v) == 2 for v in byband.values())


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog"),
         ("b", "the quick brown fox jumps over the lazy cat"),
         ("c", "completely different words entirely unrelated content here")],
        "clip_id string, transcript string",
    )
    sim = {r.clip_id: r.simhash for r in signatures.simhash64(df).collect()}
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(sim["a"], sim["b"]) < ham(sim["a"], sim["c"])
    assert ham(sim["a"], sim["a"]) == 0


def test_candidate_pairs_skew_star(spark):
    # A hot bucket (identical band rows for 100 clips) must produce star
    # edges (n-1), not the quadratic n(n-1)/2.
    hot = [(0, 12345, f"c{i:03d}", "pcm") for i in range(100)]
    cold = [(1, 777, "x1", "pcm"), (1, 777, "x2", "pcm")]
    bands = spark.createDataFrame(
        hot + cold, "band_id int, band_hash long, clip_id string, src string"
    )
    pairs = cand_ops.candidate_pairs(bands, pair_cap=10).collect()
    hot_pairs = [p for p in pairs if p.a.startswith("c")]
    assert len(hot_pairs) == 99  # star, not 4950
    assert all(p.a == "c000" for p in hot_pairs)
    cold_pairs = [p for p in pairs if p.a == "x1"]
    assert len(cold_pairs) == 1 and cold_pairs[0].b == "x2"
    # connectivity preserved: CC over star == one component
    verts = spark.createDataFrame([(f"c{i:03d}",) for i in range(100)], "clip_id string")
    edges = spark.createDataFrame([(p.a, p.b) for p in hot_pairs], "a string, b string")
    comp = components.connected_components(verts, edges).collect()
    assert len({r.component_id for r in comp}) == 1


def test_candidate_pairs_salted_exact(spark):
    # skew_mode="salted" must produce the EXACT pair set of the naive
    # uncapped self-join -- hot bucket's full clique, cross-band dedup with
    # merged srcs -- while salting the quadratic work across groups.
    n = 120
    hot = [(0, 1, f"c{i:03d}", "pcm") for i in range(n)]
    overlap = [(1, 2, "c000", "text"), (1, 2, "c001", "text")]
    cold = [(1, 3, "x1", "text"), (1, 3, "x2", "text")]
    bands = spark.createDataFrame(
        hot + overlap + cold,
        "band_id int, band_hash long, clip_id string, src string",
    )
    rows = cand_ops.candidate_pairs(
        bands, pair_cap=16, skew_mode="salted", salt_target=8
    ).collect()
    got = {(r.a, r.b): list(r.srcs) for r in rows}
    want = {(f"c{i:03d}", f"c{j:03d}") for i in range(n) for j in range(i + 1, n)}
    want.add(("x1", "x2"))
    assert set(got) == want  # exact clique, no cap, each pair once
    assert got[("c000", "c001")] == ["pcm", "text"]  # cross-band src merge
    assert got[("c000", "c002")] == ["pcm"]
    assert got[("x1", "x2")] == ["text"]  # small buckets untouched
    # determinism (salt groups are xxhash64-derived, not random)
    again = {(r.a, r.b): list(r.srcs) for r in cand_ops.candidate_pairs(
        bands, pair_cap=16, skew_mode="salted", salt_target=8).collect()}
    assert again == got
    with pytest.raises(ValueError):
        cand_ops.candidate_pairs(bands, skew_mode="sorted")


def test_connected_components_chain_and_islands(spark):
    verts = spark.createDataFrame([(f"v{i}",) for i in range(10)], "clip_id string")
    # chain v0-v1-v2-v3, pair v5-v6, islands v4, v7..v9
    edges = spark.createDataFrame(
        [("v0", "v1"), ("v1", "v2"), ("v2", "v3"), ("v5", "v6")], "a string, b string"
    )
    comp = {r.clip_id: r.component_id for r in
            components.connected_components(verts, edges).collect()}
    assert comp["v0"] == comp["v1"] == comp["v2"] == comp["v3"] == "v0"
    assert comp["v5"] == comp["v6"] == "v5"
    assert comp["v4"] == "v4" and comp["v9"] == "v9"


def test_connected_components_checkpoint_dir_identical(spark, tmp_path):
    # The durable parquet lineage cut (checkpoint_dir=...) must yield
    # labels identical to the localCheckpoint default, chain included
    # (multiple rounds -> multiple cut round-trips).
    verts = spark.createDataFrame([(f"v{i:02d}",) for i in range(30)],
                                  "clip_id string")
    edges = spark.createDataFrame(
        [(f"v{i:02d}", f"v{i+1:02d}") for i in range(24)],  # 25-node chain
        "a string, b string",
    )
    base = {(r.clip_id, r.component_id) for r in
            components.connected_components(verts, edges).collect()}
    durable = {(r.clip_id, r.component_id) for r in
               components.connected_components(
                   verts, edges,
                   checkpoint_dir=str(tmp_path / "cc")).collect()}
    assert durable == base
    import os
    kept = sorted(n for n in os.listdir(tmp_path / "cc") if n.startswith("cc_"))
    # storage reclamation: init labels + edges + ONLY the newest merge
    # survive (a 25-node chain needs several rounds, so reclamation fired)
    assert len(kept) == 3, kept
    assert kept[:2] == ["cc_001.parquet", "cc_002.parquet"]


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------

def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = similarity.brute_force_topk(df, df.filter(F.col("vec_id") < 3), k=4).collect()
    v = vecs.astype(np.float64)
    sims = v @ v.T / np.outer(np.linalg.norm(v, axis=1), np.linalg.norm(v, axis=1))
    for q in range(3):
        order = [i for i in np.argsort(-sims[q]) if i != q][:4]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rk) if r.query_id == q]
        assert mine == order, (q, mine, order)


def test_lsh_ann_recall_vs_bruteforce(spark):
    rng = np.random.default_rng(4)
    # clustered vectors so LSH has structure to find
    centers = rng.standard_normal((8, 24)) * 3
    vecs = np.vstack([c + rng.standard_normal((12, 24)) * 0.3 for c in centers]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") < 10)
    bf = similarity.brute_force_topk(df, q, k=3).collect()
    lsh = similarity.lsh_bucketed_topk(df, q, k=3, n_bits=16, bands=8).collect()
    bf_set = {(r.query_id, r.neighbor_id) for r in bf}
    lsh_set = {(r.query_id, r.neighbor_id) for r in lsh}
    recall = len(bf_set & lsh_set) / len(bf_set)
    assert recall >= 0.8, recall


# ---------------------------------------------------------------------------
# multimodal audio
# ---------------------------------------------------------------------------

def test_audio_frame_features_match_numpy(spark):
    from go_cdc_chunkers_spark.operators.multimodal import audio_frame_features

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [("c0", bytearray(pcm.tobytes()), sr, 1000, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    rows = audio_frame_features(df, frame_ms=20).collect()
    assert len(rows) == 50  # 1s / 20ms
    w = sr * 20 // 1000
    f0 = pcm[:w].astype(np.float64) / 32768.0
    want_energy = float(np.sqrt((f0**2).mean()))
    got0 = next(r for r in rows if r.frame_idx == 0)
    assert abs(got0.energy - want_energy) < 1e-6
    # a 440 Hz sine has 2*440 zero crossings/s -> zcr ~ 880/16000
    assert abs(got0.zcr - 880 / 16000) < 0.01


def test_silence_trim_lead_trail_and_all_silent(spark):
    """silence_trim over a clip with 5 leading + 3 trailing silent frames,
    one fully-silent clip (null-branch coverage), and one fully-active
    clip."""
    from go_cdc_chunkers_spark.operators.multimodal import (
        audio_frame_features, silence_trim)

    sr, w = 16000, 320  # 20 ms frames
    loud = (np.full(w, 8000, dtype="<i2"))
    z = np.zeros(w, dtype="<i2")
    mk = lambda *frs: bytearray(np.concatenate(frs).tobytes())  # noqa: E731
    rows = [
        ("mixed", mk(*([z] * 5), *([loud] * 10), *([z] * 3))),
        ("silent", mk(*([z] * 8))),
        ("active", mk(*([loud] * 4))),
    ]
    df = spark.createDataFrame(
        [(c, b, sr, 0, "pcm_s16le") for c, b in rows],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    got = {r["clip_id"]: r.asDict()
           for r in silence_trim(audio_frame_features(df)).collect()}
    assert got["mixed"] == dict(clip_id="mixed", n_frames=18,
                                lead_silence_frames=5, trail_silence_frames=3,
                                active_frames=10, active_span_ms=200)
    assert got["silent"] == dict(clip_id="silent", n_frames=8,
                                 lead_silence_frames=8, trail_silence_frames=8,
                                 active_frames=0, active_span_ms=0)
    assert got["active"]["lead_silence_frames"] == 0
    assert got["active"]["trail_silence_frames"] == 0
    assert got["active"]["active_span_ms"] == 80


def test_image_resize_nearest_exact(spark):
    """Nearest-neighbor resize of a real PPM: output pixels equal the
    numpy-indexed source pixels exactly, and the round-trip re-encode
    decodes back to the same array."""
    from go_cdc_chunkers_spark.operators.multimodal import (
        _encode_ppm, decode_image, image_resize)

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("i0", bytearray(_encode_ppm(img)))], "item_id string, bytes binary")
    row = image_resize(df, out_w=8, out_h=6).collect()[0]
    assert (row.width, row.height) == (8, 6)
    got = decode_image(bytes(row.bytes))
    ys = (np.arange(6) * 12) // 6
    xs = (np.arange(8) * 16) // 8
    assert np.array_equal(got, img[ys[:, None], xs[None, :]])


def test_resample_audio_tone_snr(spark):
    """Linear-interp resample of a 440 Hz tone 16 kHz -> 8 kHz and back up
    to 16 kHz: length scales exactly with the rate ratio and the
    round-tripped tone keeps SNR >= 30 dB vs the ideal (the pipeline's
    per-row invariant bound)."""
    from go_cdc_chunkers_spark.operators.multimodal import resample_audio

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [("c0", bytearray(pcm.tobytes()), sr, 1000, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    down = resample_audio(df, out_sr=8000).collect()[0]
    assert down.sr_hz == 8000 and len(down.bytes) == sr  # half the samples
    df2 = spark.createDataFrame(
        [("c0", bytearray(bytes(down.bytes)), 8000, 1000, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    up = resample_audio(df2, out_sr=sr).collect()[0]
    got = np.frombuffer(bytes(up.bytes), dtype="<i2").astype(np.float64)
    n = len(got)
    ideal = 0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / sr) * 32767
    snr = 10 * np.log10((ideal**2).mean() / ((got - ideal) ** 2).mean())
    assert snr >= 30, snr


def test_image_features_stub_and_fake(spark):
    from go_cdc_chunkers_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [("i0", bytearray(b"\x01\x02\x03\x04\x05\x06\x07\x08"))],
        "item_id string, bytes binary",
    )
    rows = image_features(df, deterministic_fake=True).collect()
    assert rows[0].width > 0 and rows[0].height > 0
    with pytest.raises(Exception):
        image_features(df, deterministic_fake=False).collect()


# ---------------------------------------------------------------------------
# connected components at scale: O(log n) rounds, never silently wrong
# ---------------------------------------------------------------------------

def test_cc_long_chain_converges_logarithmically(spark):
    """A 1000-hop chain: plain hash-min needs ~1000 rounds; with pointer
    doubling the combination must finish in O(log n) -- assert <= 15."""
    n = 1000
    verts = spark.createDataFrame([(f"v{i:04d}",) for i in range(n)], "clip_id string")
    edges = spark.createDataFrame(
        [(f"v{i:04d}", f"v{i+1:04d}") for i in range(n - 1)], "a string, b string"
    )
    labels, rounds = components.connected_components(
        verts, edges, max_iter=50, return_rounds=True
    )
    got = {r.clip_id: r.component_id for r in labels.collect()}
    assert set(got.values()) == {"v0000"}
    assert rounds <= 15, rounds


def test_cc_raises_instead_of_returning_wrong_labels(spark):
    verts = spark.createDataFrame([(f"v{i:03d}",) for i in range(40)], "clip_id string")
    edges = spark.createDataFrame(
        [(f"v{i:03d}", f"v{i+1:03d}") for i in range(39)], "a string, b string"
    )
    with pytest.raises(components.ConvergenceError):
        components.connected_components(verts, edges, max_iter=2)


# ---------------------------------------------------------------------------
# ANN: default 64-bit/8-band geometry is sub-quadratic AND keeps recall
# ---------------------------------------------------------------------------

def test_lsh_default_geometry_candidates_and_recall(spark):
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((10, 24)) * 3
    vecs = np.vstack(
        [c + rng.standard_normal((20, 24)) * 0.3 for c in centers]
    ).astype(np.float32)
    n = len(vecs)  # 200
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") < 10)
    pieces = similarity.sketch_pieces(df)  # defaults: 64 bits, 8x8-bit bands
    cand = similarity.candidates_from_pieces(pieces, q)
    n_cand = cand.count()
    # sub-quadratic: avg candidates per query well below the corpus size
    assert n_cand / 10 < 0.6 * n, n_cand
    lsh = similarity.topk_from_candidates(df, cand, k=3).collect()
    bf = similarity.brute_force_topk(df, q, k=3).collect()
    bf_set = {(r.query_id, r.neighbor_id) for r in bf}
    lsh_set = {(r.query_id, r.neighbor_id) for r in lsh}
    recall = len(bf_set & lsh_set) / len(bf_set)
    assert recall >= 0.8, recall


def test_lsh_bucket_cap_bounds_hot_buckets(spark):
    """60 identical vectors land in one bucket per band; bucket_cap=8 must
    bound candidates per query by ~cap (same deterministic 8 in every band),
    not 59."""
    vec = [float(x) for x in np.linspace(0.1, 1.0, 16)]
    df = spark.createDataFrame(
        [(i, vec) for i in range(60)], "vec_id long, embedding array<float>"
    )
    q = df.filter(F.col("vec_id") < 3)
    pieces = similarity.sketch_pieces(df)
    capped = similarity.candidates_from_pieces(pieces, q, bucket_cap=8)
    per_q = capped.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] <= 8 for r in per_q), per_q
    uncapped = similarity.candidates_from_pieces(pieces, q, bucket_cap=None)
    assert uncapped.groupBy("query_id").count().collect()[0]["count"] == 59


# ---------------------------------------------------------------------------
# SimHash hot-bucket star cap: O(n) edges, identical components
# ---------------------------------------------------------------------------

def test_simhash_hot_bucket_star_cap(spark):
    from go_cdc_chunkers_spark.operators import dedup_text

    n_hot = 200
    rows = [(i, "spam ham eggs " * 10) for i in range(n_hot)]
    rows += [(1000 + j, f"utterly distinct document number {j} with words {j*7}")
             for j in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pieces = dedup_text.simhash_pieces(docs, text_col="text", id_col="doc_id")

    capped = dedup_text.simhash_pairs_from_pieces(pieces, max_hamming=16, pair_cap=64)
    hot_edges = capped.filter((F.col("a") < n_hot) & (F.col("b") < n_hot))
    n_edges = hot_edges.count()
    # multi-hub star (n_hubs=4): members x hubs + hub-hub pairs -- linear in
    # bucket size, never the 19900-edge clique
    n_hubs = 4
    assert n_edges == n_hubs * (n_hot - n_hubs) + n_hubs * (n_hubs - 1) // 2, n_edges

    # identical connectivity: all hot docs in one component either way
    verts = docs.select(F.col("doc_id").cast("string").alias("clip_id"))
    star_edges = capped.select(
        F.col("a").cast("string").alias("a"), F.col("b").cast("string").alias("b")
    )
    comp = components.connected_components(verts, star_edges)
    n_comps = (
        comp.filter(F.col("clip_id").cast("long") < n_hot)
        .select("component_id").distinct().count()
    )
    assert n_comps == 1


def test_simhash_hub_selection_plan_has_no_unbounded_collect(spark):
    """Hot-bucket hub selection must never materialize a whole bucket in
    one aggregation buffer: the plan for simhash_pairs_from_pieces contains
    no collect_list (and no object-hash aggregate, its physical carrier) --
    hubs come from a row_number window over the hot subset, which
    sort-spills instead of buffering O(bucket) rows."""
    from go_cdc_chunkers_spark.operators import dedup_text

    rows = [(i, "spam ham eggs " * 10) for i in range(300)]
    rows += [(1000 + j, f"doc {j} words {j * 7}") for j in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup_text.simhash_pairs_from_pieces(
        dedup_text.simhash_pieces(docs, text_col="text", id_col="doc_id"),
        max_hamming=16, pair_cap=64)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan


def test_ivf_topk_recall_on_clustered_vectors(spark):
    rng = np.random.default_rng(6)
    centers = rng.standard_normal((8, 24)) * 3
    vecs = np.vstack(
        [c + rng.standard_normal((15, 24)) * 0.3 for c in centers]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") < 10)
    cents = similarity.ivf_centroids(df, n_centroids=8, iters=2)
    ivf = similarity.ivf_topk(df, q, cents, k=3, n_probe=2).collect()
    bf = similarity.brute_force_topk(df, q, k=3).collect()
    bf_set = {(r.query_id, r.neighbor_id) for r in bf}
    ivf_set = {(r.query_id, r.neighbor_id) for r in ivf}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.8, recall
    # sub-linear candidates: 2 of 8 probes -> ~1/4 of corpus scored
    assign = similarity.ivf_assign(df, cents)
    sizes = [r["count"] for r in assign.groupBy("centroid_id").count().collect()]
    assert len(sizes) >= 4  # quantizer actually partitions the space


def test_train_sample_deterministic_and_bounded(spark):
    """train_fraction: training input is a deterministic hash-sample --
    same rows on every run, sized ~fraction, shared across PQ subspaces
    (codebooks differ from full-corpus training but encode/score still
    cover everything)."""
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<float>")

    s1 = {r.vec_id for r in similarity.train_sample(df, 0.25).collect()}
    s2 = {r.vec_id for r in similarity.train_sample(df, 0.25).collect()}
    assert s1 == s2  # deterministic
    assert 0.15 * 400 <= len(s1) <= 0.35 * 400, len(s1)  # ~fraction
    assert similarity.train_sample(df, None) is df
    assert similarity.train_sample(df, 1.0) is df
    with pytest.raises(ValueError):
        similarity.train_sample(df, 0.0)

    # sampled training changes only codebooks; encode still covers the
    # full corpus (one (vec, sub) row per vector per subspace)
    cb = similarity.pq_codebooks(df, m=4, ks=4, iters=1, dim=16,
                                 train_fraction=0.25)
    codes = similarity.pq_encode(df, cb, m=4, dsub=4)
    assert codes.count() == 400 * 4
    assert codes.select("vec_id").distinct().count() == 400


def test_pq_topk_refined_recall_and_determinism(spark):
    """PQ ADC + exact re-rank: recall 1.0 at refine=8k on the clustered
    fixture (bare ADC ties within-cluster codes -- that's the documented
    trade); codes are one row per (vector, subspace); two runs bit-equal."""
    rng = np.random.default_rng(6)
    centers = rng.standard_normal((8, 24)) * 3
    vecs = np.vstack(
        [c + rng.standard_normal((15, 24)) * 0.3 for c in centers]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") < 10)
    cb = similarity.pq_codebooks(df, m=4, ks=8, iters=1, dim=24)
    assert cb.count() == 4 * 8

    codes = similarity.pq_encode(df, cb, m=4, dsub=6)
    assert codes.count() == 120 * 4
    assert codes.groupBy("vec_id").count().filter("count != 4").count() == 0

    bf = {(r.query_id, r.neighbor_id)
          for r in similarity.brute_force_topk(df, q, k=3).collect()}
    pq = {(r.query_id, r.neighbor_id)
          for r in similarity.pq_topk(df, q, cb, m=4, dsub=6, k=3,
                                      refine=24).collect()}
    assert len(bf & pq) / len(bf) >= 0.95

    a = sorted(map(tuple, similarity.pq_topk(
        df, q, cb, m=4, dsub=6, k=3).collect()))
    b = sorted(map(tuple, similarity.pq_topk(
        df, q, cb, m=4, dsub=6, k=3).collect()))
    assert a == b

    # IVF-PQ composition: IVF probing restricts the candidate set, PQ
    # scores only those -- results are a subset of each probe's cluster
    cents = similarity.ivf_centroids(df, n_centroids=8, iters=1)
    assign = similarity.ivf_assign(df, cents)
    probes = similarity.ivf_topk(df, q, cents, k=120, n_probe=2)
    cand = probes.select("query_id", "neighbor_id")
    ivfpq = similarity.pq_topk(df, q, cb, m=4, dsub=6, k=3,
                               candidates=cand, refine=12).collect()
    allowed = {(r.query_id, r.neighbor_id) for r in cand.collect()}
    assert {(r.query_id, r.neighbor_id) for r in ivfpq} <= allowed
    assert len({r.query_id for r in ivfpq}) == 10


def test_ivf_centroids_deterministic(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    a = similarity.ivf_centroids(df, n_centroids=4, iters=1).collect()
    b = similarity.ivf_centroids(df, n_centroids=4, iters=1).collect()
    ka = sorted((r.centroid_id, tuple(r.centroid)) for r in a)
    kb = sorted((r.centroid_id, tuple(r.centroid)) for r in b)
    assert ka == kb


# ---------------------------------------------------------------------------
# multimodal: real decoders for uncompressed formats (no codec libs)
# ---------------------------------------------------------------------------

def _wav_bytes(samples: np.ndarray, sr: int) -> bytes:
    pcm = samples.astype("<i2").tobytes()
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    data = b"data" + len(pcm).to_bytes(4, "little") + pcm
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_decode_matches_raw_pcm(spark):
    from go_cdc_chunkers_spark.operators.multimodal import audio_frame_features

    rng = np.random.default_rng(31)
    samples = (rng.standard_normal(16000) * 8000).astype(np.int16)
    df = spark.createDataFrame(
        [("raw", bytearray(samples.tobytes()), 16000, 1000, "pcm_s16le", ""),
         ("wav", bytearray(_wav_bytes(samples, 16000)), 16000, 1000, "wav", "")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    rows = audio_frame_features(df).collect()
    raw = sorted((r.frame_idx, r.energy, r.zcr) for r in rows if r.clip_id == "raw")
    wav = sorted((r.frame_idx, r.energy, r.zcr) for r in rows if r.clip_id == "wav")
    assert raw == wav and len(raw) > 0


def test_ppm_bmp_decode_real_pixels(spark):
    from go_cdc_chunkers_spark.operators.multimodal import (
        _decode_bmp, _decode_ppm, image_features)

    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    ppm = b"P6\n7 5\n255\n" + img.tobytes()
    assert np.array_equal(_decode_ppm(ppm), img)

    # hand-build a 24-bit BMP (bottom-up, BGR, padded rows)
    stride = (7 * 3 + 3) & ~3
    rows = b""
    for y in range(4, -1, -1):
        row = img[y][:, ::-1].tobytes()
        rows += row + b"\x00" * (stride - len(row))
    header = (b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little") + (7).to_bytes(4, "little", signed=True)
              + (5).to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
              + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
              + b"\x00" * 20)
    bmp = header + rows
    assert np.array_equal(_decode_bmp(bmp), img)

    df = spark.createDataFrame(
        [("p", bytearray(ppm)), ("b", bytearray(bmp))], "item_id string, bytes binary"
    )
    got = {r.item_id: (r.width, r.height, r.mean_luma)
           for r in image_features(df).collect()}
    px = img.astype(np.float64)
    want_luma = round(float((0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                             + 0.114 * px[:, :, 2]).mean()), 9)
    assert got["p"] == (7, 5, want_luma) and got["b"] == (7, 5, want_luma)


def test_video_frame_sample_raw_yuv(spark):
    from go_cdc_chunkers_spark.operators.multimodal import video_frame_sample

    rng = np.random.default_rng(33)
    w, h, n_frames = 8, 6, 25
    fsz = int(w * h * 1.5)
    payload = rng.integers(0, 256, fsz * n_frames, dtype=np.uint8).tobytes()
    df = spark.createDataFrame(
        [("v0", bytearray(payload), "yuv420p", w, h, 10.0)],
        "item_id string, bytes binary, pixfmt string, width int, height int, fps double",
    )
    rows = sorted(video_frame_sample(df, every_n=10).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 10, 20]
    assert [r.t_ms for r in rows] == [0, 1000, 2000]
    for r in rows:
        assert bytes(r.frame_bytes) == payload[r.frame_idx * fsz:(r.frame_idx + 1) * fsz]
    # compressed codec -> raises at the decode point
    bad = spark.createDataFrame(
        [("v1", bytearray(b"xx"), "h264", w, h, 10.0)],
        "item_id string, bytes binary, pixfmt string, width int, height int, fps double",
    )
    with pytest.raises(Exception):
        video_frame_sample(bad).collect()


def test_merge_components_equals_full_rerun(spark):
    """Incremental CC (graph contraction): folding a delta into a previous
    labeling yields BIT-identical labels to a full re-run over the union
    graph -- old labels are min ids, so contracted hash-min stays the
    global min. Covers cross old/new edges, merges of two old components
    via a new path, untouched old components, and singleton new clips."""
    from go_cdc_chunkers_spark.operators.components import (
        connected_components, merge_components)

    rng = np.random.default_rng(13)
    n_old, n_all = 150, 200
    ids = [f"v{i:03d}" for i in range(n_all)]
    edges = set()
    while len(edges) < 180:
        a, b = rng.integers(0, n_all, 2)
        if a != b:
            edges.add((ids[min(a, b)], ids[max(a, b)]))
    old_edges = [(a, b) for a, b in edges if a < ids[n_old] and b < ids[n_old]]
    new_edges = [e for e in edges if e not in set(old_edges)]

    vdf = lambda xs: spark.createDataFrame([(x,) for x in xs], "clip_id string")  # noqa: E731
    edf = lambda es: spark.createDataFrame(list(es) or [("_x", "_x")], "a string, b string")  # noqa: E731

    prev = connected_components(vdf(ids[:n_old]), edf(old_edges))
    merged = merge_components(prev, vdf(ids[n_old:]), edf(new_edges))
    full = connected_components(vdf(ids), edf(list(edges)))

    got = sorted((r.clip_id, r.component_id) for r in merged.collect())
    want = sorted((r.clip_id, r.component_id) for r in full.collect())
    assert got == want
    # the contracted graph really is small: labels + delta, not the corpus
    n_prev_components = prev.select("component_id").distinct().count()
    assert n_prev_components < n_old
