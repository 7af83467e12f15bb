"""MFCC kernel: naive per-sample differential + shape/edge pins.

Same stance as cdc/naive.py for the chunkers: an independent,
obviously-correct per-sample implementation of every closed form in the
module docstring, compared against the vectorized rfft path."""

import math

import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import mfcc


def naive_mfcc(x, sr, frame, hop, n_mels, n_coef):
    x = [float(v) for v in x]
    if len(x) < frame:
        return np.zeros((0, n_coef))
    n_frames = (len(x) - frame) // hop + 1

    def mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def melinv(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    top = mel(sr / 2.0)
    edges = [melinv(e * top / (n_mels + 1)) for e in range(n_mels + 2)]
    out = []
    for t in range(n_frames):
        seg = [
            x[t * hop + n] * (0.5 - 0.5 * math.cos(2 * math.pi * n / frame))
            for n in range(frame)
        ]
        power = []
        for k in range(frame // 2 + 1):
            re = sum(
                seg[n] * math.cos(2 * math.pi * k * n / frame)
                for n in range(frame)
            )
            im = sum(
                seg[n] * math.sin(2 * math.pi * k * n / frame)
                for n in range(frame)
            )
            power.append(re * re + im * im)
        logmel = []
        for m in range(n_mels):
            lo, mid, hi = edges[m], edges[m + 1], edges[m + 2]
            e = 0.0
            for k, p in enumerate(power):
                f = k * sr / frame
                w = min((f - lo) / (mid - lo), (hi - f) / (hi - mid))
                e += max(w, 0.0) * p
            logmel.append(math.log10(e + 1.0))
        out.append(
            [
                sum(
                    logmel[m]
                    * math.cos(math.pi * j * (2 * m + 1) / (2 * n_mels))
                    for m in range(n_mels)
                )
                for j in range(n_coef)
            ]
        )
    return np.array(out)


@pytest.mark.parametrize("seed,n,frame,hop,n_mels,n_coef", [
    (0, 500, 64, 64, 10, 6),
    (1, 777, 64, 32, 10, 6),
    (2, 300, 32, 16, 8, 5),
])
def test_mfcc_matches_naive_dft(seed, n, frame, hop, n_mels, n_coef):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, n).astype(np.int16)
    fast = mfcc.mfcc_frames(x, 8000, frame, hop, n_mels, n_coef)
    slow = naive_mfcc(x, 8000, frame, hop, n_mels, n_coef)
    assert fast.shape == slow.shape == ((n - frame) // hop + 1, n_coef)
    # both accumulate ~1e-10 absolute error on ~1e1-magnitude cepstra;
    # agreement at 1e-6 leaves the driver's round(3) a 1000x margin
    np.testing.assert_allclose(fast, slow, atol=1e-6, rtol=0)


def test_mfcc_short_and_exact_one_frame():
    assert mfcc.mfcc_frames(np.arange(63), 8000).shape == (0, 6)
    one = mfcc.mfcc_frames(np.arange(64), 8000)
    assert one.shape == (1, 6)
    # silence: every mel energy is 0, log10(0+1)=0, all coefficients 0
    z = mfcc.mfcc_frames(np.zeros(128), 8000)
    np.testing.assert_array_equal(z, 0.0)


def test_filterbank_partition_shape():
    bank = mfcc.mel_filterbank(8000, 64, 10)
    assert bank.shape == (10, 33)
    assert (bank >= 0).all() and bank.max() <= 1.0
    # interior bins are covered by at least one filter (edges taper to 0)
    covered = bank.sum(axis=0)
    assert (covered[2:-2] > 0).all()


def test_driver_clip_rounding_margin():
    """The driver query rounds to 3 decimals on both engines; parity is
    deterministic only if no pre-round value sits near a 0.0005 rounding
    midpoint. Pin the margin for exactly the three closed-form driver
    clips: >= 1e-6, ~1e4x the measured cross-engine accumulation noise
    (same stance as tests/test_jpeg.py's margin pin)."""
    from go_cdc_chunkers_spark.entry_queries import _MFCC_CLIPS, _mfcc_pcm

    worst = 1.0
    for _cid, a, b, mod, n in _MFCC_CLIPS:
        c = mfcc.mfcc_frames(_mfcc_pcm(a, b, mod, n), 8000)
        worst = min(worst, float(np.abs((c * 1000.0) % 1.0 - 0.5).min()))
    assert worst * 1e-3 >= 1e-6


def test_mean_mfcc_is_an_embedding_channel(spark):
    """Composition pin: mean-MFCC vectors per clip feed the existing
    similarity operators unchanged (the acoustic analogue of the
    embeddings table). An exact duplicate clip must rank as its twin's
    top-1 cosine neighbor at cosine ~ 1."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.operators import similarity
    from go_cdc_chunkers_spark.operators.mfcc import mfcc_features
    from go_cdc_chunkers_spark.sources.clips import wav_wrap

    rng = np.random.default_rng(11)
    base = rng.integers(-12000, 12000, 4096).astype(np.int16)
    other = rng.integers(-12000, 12000, 4096).astype(np.int16)
    tone = (8000 * np.sin(2 * np.pi * 440 * np.arange(4096) / 8000)).astype(
        np.int16)
    rows = [(str(i), bytearray(wav_wrap(x, 8000)), 8000, "wav")
            for i, x in enumerate([base, base.copy(), other, tone])]
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string")
    feat = mfcc_features(clips, frame=256, hop=128, n_mels=16, n_coef=8)
    vecs = (
        feat.groupBy("clip_id", "coef").agg(F.avg("mfcc").alias("v"))
        .groupBy("clip_id")
        .agg(F.array_sort(F.collect_list(F.struct("coef", "v"))).alias("s"))
        .select(F.col("clip_id").alias("vec_id"),
                F.transform("s", lambda e: e["v"]).alias("embedding"))
    )
    top = similarity.brute_force_topk(vecs, vecs, k=1).collect()
    by_q = {r["query_id"]: r for r in top}
    assert by_q[0]["neighbor_id"] == 1 and by_q[1]["neighbor_id"] == 0
    assert by_q[0]["cosine"] > 0.999999


def test_mfcc_gain_shifts_only_via_log():
    """2x gain multiplies every mel energy by 4; with log10(E+1) ~ log10 E
    for large E the cepstrum shifts by log10(4) * DCT(1-vector) -- i.e.
    coefficient 0 moves, higher coefficients are nearly invariant. This is
    the property that makes MFCC a gain-robust dedup channel."""
    rng = np.random.default_rng(7)
    x = rng.integers(-8000, 8000, 640).astype(np.float64)
    a = mfcc.mfcc_frames(x, 8000)
    b = mfcc.mfcc_frames(2.0 * x, 8000)
    d = b - a
    assert abs(d[:, 0]).min() > 1.0          # c0 carries the gain
    assert abs(d[:, 1:]).max() < 0.05        # shape coefficients stable
