"""Spectral landmark fingerprints (operators/audio_fp.py): recall per
variant kind, precision vs ground truth, the channel-complementarity story
(chunk MinHash is blind to amplitude jitter; audio_fp is not), and
determinism/scale-invariance of the landmark extraction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators import audio_fp
from go_cdc_chunkers_spark.sources import clips as clips_src


@pytest.fixture(scope="module")
def chord_corpus():
    return clips_src.generate_chord_clips(
        n_base=12, dup_frac=0.25, jitter_frac=0.25, insert_frac=0.25, seed=31)


def _clips_df(spark, rows):
    return spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"])) for r in rows],
        schema="clip_id string, bytes binary",
    )


def test_recall_and_precision_vs_truth(spark, chord_corpus):
    rows, truth, kinds = chord_corpus
    fps = audio_fp.spectral_fingerprints(_clips_df(spark, rows))
    got = {(r.a, r.b) for r in audio_fp.fingerprint_pairs(fps).collect()}

    # recall: every variant must pair with its base, for EVERY kind
    # (exact, insert, and the CDC-blind jitter kind)
    missed = {}
    for cid, kind in kinds.items():
        base = f"chord-{truth[cid]:08d}"
        pair = (min(base, cid), max(base, cid))
        if pair not in got:
            missed.setdefault(kind, []).append(pair)
    assert not missed, missed

    # precision: every reported pair must be within one truth group
    for a, b in got:
        assert truth[a] == truth[b], (a, b)


def test_chunk_minhash_blind_to_jitter_audio_fp_not(spark):
    """The complementarity story: y = x*(1+e) perturbs every PCM byte, so
    the chunk-digest channel produces NO candidate for the jittered pair;
    the spectral channel recovers it."""
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.operators import candidates, chunking, signatures

    rows, truth, kinds = clips_src.generate_chord_clips(
        n_base=6, dup_frac=0.0, jitter_frac=0.34, insert_frac=0.0, seed=77)
    jitter_pairs = {
        (min(f"chord-{truth[c]:08d}", c), max(f"chord-{truth[c]:08d}", c))
        for c, k in kinds.items() if k == "jitter"
    }
    assert jitter_pairs

    df = _clips_df(spark, rows)
    chunks = chunking.chunk_clips(
        df, "fastcdc-v1.0.0", ChunkerOpts(min_size=64, normal_size=256, max_size=2048))
    bands = signatures.lsh_bands(
        signatures.minhash_signatures(chunks, k=128), 32, 4, src="pcm")
    cdc_cands = {(r.a, r.b) for r in candidates.candidate_pairs(bands).collect()}
    assert not (cdc_cands & jitter_pairs), "jitter unexpectedly CDC-visible"

    fp_pairs = {
        (r.a, r.b)
        for r in audio_fp.fingerprint_pairs(
            audio_fp.spectral_fingerprints(df)).collect()
    }
    assert jitter_pairs <= fp_pairs, jitter_pairs - fp_pairs


def test_scoped_pairs_equal_full_pairs_involving_scope(spark, chord_corpus):
    """Delta mode (scope_clip_ids) returns EXACTLY the full run's pairs
    that involve a scope clip -- same rows, same aligned_matches, same
    match_frac (the restriction is provably lossless for scope-involving
    pairs: every matched hash of such a pair is a hash the scope clip
    carries, so the scoped join sees all its match rows)."""
    rows, truth, kinds = chord_corpus
    fps = audio_fp.spectral_fingerprints(_clips_df(spark, rows)).cache()
    try:
        scope_ids = sorted(kinds)[: max(2, len(kinds) // 2)]  # some variants
        scope = spark.createDataFrame([(c,) for c in scope_ids], "clip_id string")
        full = {(r.a, r.b): (r.aligned_matches, round(r.match_frac, 9))
                for r in audio_fp.fingerprint_pairs(fps).collect()}
        want = {k: v for k, v in full.items()
                if k[0] in set(scope_ids) or k[1] in set(scope_ids)}
        got = {(r.a, r.b): (r.aligned_matches, round(r.match_frac, 9))
               for r in audio_fp.fingerprint_pairs(
                   fps, scope_clip_ids=scope).collect()}
        assert got == want
        assert len(full) > len(want)  # the fixture really has old-old pairs
    finally:
        fps.unpersist()


def test_scoped_join_input_bounded_by_delta_hash_set(spark):
    """The scale property the incremental spectral channel buys: the match
    join's input (scoped_fingerprints) contains ONLY rows whose hash a
    scope clip carries -- an old-clip population with disjoint landmarks
    contributes zero join rows no matter how large it is."""
    # synthetic fingerprint relation, no FFT: 50 old clips x 40 hashes in
    # [1000, 2000); 2 new clips x 10 hashes in [0, 10) plus 3 hashes shared
    # with old clip "old-0" ([1000, 1003))
    rows = []
    for i in range(50):
        rows += [(f"old-{i}", 1000 + 17 * i % 1000 + j, j) for j in range(40)]
    for i in range(2):  # disjoint per-new-clip hash ranges: 0-9 and 100-109
        rows += [(f"new-{i}", 100 * i + j, j) for j in range(10)]
    rows += [("new-0", 1000 + j, 50 + j) for j in range(3)]
    fps = spark.createDataFrame(rows, "clip_id string, hash long, t int")
    pruned = audio_fp.prune_common_hashes(
        audio_fp.canonical_fingerprints(fps), max_df=32)
    scope = spark.createDataFrame([("new-0",), ("new-1",)], "clip_id string")
    scoped = audio_fp.scoped_fingerprints(pruned, scope).collect()

    delta_hashes = {r.hash for r in pruned.join(
        scope, "clip_id", "left_semi").collect()}
    assert {r.hash for r in scoped} <= delta_hashes
    # bounded: only new rows + the 3 shared old rows survive; the other
    # ~2000 old rows never enter the join
    assert len(scoped) <= len(delta_hashes) * 33  # max_df clips per hash
    assert len(scoped) < 50  # vs ~2000 unscoped
    # and the pairs still find the genuine new-old overlap relation intact
    got = {(r.a, r.b) for r in audio_fp.fingerprint_pairs(
        fps, min_frac=0.2, min_matches=3, scope_clip_ids=scope).collect()}
    assert got == {("new-0", "old-0")}


def test_landmarks_deterministic_and_scale_invariant():
    rng = np.random.default_rng(5)
    t = np.arange(32000) / 16000.0
    x = sum(0.12 * np.sin(2 * np.pi * f * t) for f in (440.0, 905.0, 1764.0, 2222.0))
    x = x + 0.02 * rng.standard_normal(len(t))
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")

    h1, t1 = audio_fp.clip_landmarks(pcm)
    h2, t2 = audio_fp.clip_landmarks(pcm)
    assert np.array_equal(h1, h2) and np.array_equal(t1, t2)

    # global amplitude scaling: top-k peak bins are invariant, so the
    # landmark hash SETS overlap almost completely (ties at the noise
    # floor may flip an occasional 4th peak)
    scaled = np.clip(pcm.astype(np.float64) * 0.93, -32768, 32767).astype("<i2")
    h3, _ = audio_fp.clip_landmarks(scaled)
    inter = len(set(h1.tolist()) & set(h3.tolist()))
    assert inter / len(set(h1.tolist())) > 0.9

    # empty / shorter-than-frame input yields no landmarks
    assert audio_fp.clip_landmarks(np.empty(0, np.int16))[0].size == 0
    assert audio_fp.clip_landmarks(np.zeros(100, np.int16))[0].size == 0


def test_mixed_rate_corpus_recovered_after_resample(spark):
    """The resample-normalization step in action: an 8 kHz downsampled copy
    of a 16 kHz chord clip shares no usable frame geometry with its base
    (different sample rate = different FFT bin mapping), but after
    resample_audio normalizes the corpus to one rate the spectral channel
    pairs copy and base."""
    from go_cdc_chunkers_spark.operators import audio_fp
    from go_cdc_chunkers_spark.operators.multimodal import (
        _resample_linear, resample_audio)

    rows, truth, _k = clips_src.generate_chord_clips(
        n_base=6, dup_frac=0.0, jitter_frac=0.0, insert_frac=0.0, seed=77)
    base = rows[0]
    pcm = np.frombuffer(base["bytes"], dtype="<i2")
    low = _resample_linear(pcm, 16000, 8000)

    mixed = [(r["clip_id"], bytearray(r["bytes"]), 16000, "pcm_s16le")
             for r in rows]
    mixed.append(("low-rate-copy", bytearray(low.tobytes()), 8000, "pcm_s16le"))
    df = spark.createDataFrame(
        mixed, "clip_id string, bytes binary, sr_hz int, codec string")

    norm = resample_audio(df.withColumn("dur_ms", F.lit(0)), out_sr=16000)
    pairs = audio_fp.fingerprint_pairs(
        audio_fp.spectral_fingerprints(norm).cache()).collect()
    got = {tuple(sorted((r.a, r.b))) for r in pairs}
    assert tuple(sorted(("low-rate-copy", base["clip_id"]))) in got
    # and no false pair among the distinct bases
    others = {p for p in got if "low-rate-copy" not in p}
    assert not others, others
