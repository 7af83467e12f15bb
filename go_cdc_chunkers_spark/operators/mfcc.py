"""Mel-frequency cepstral features over decoded PCM.

Beyond-reference audio-pipeline operator (the reference repo stops at
byte-level chunking; a training-data pipeline for speech also needs a
perceptual feature channel). Mean-MFCC vectors are a drop-in embedding
for the existing similarity operators (operators/similarity.py), which
makes this the acoustic analogue of the transcript SimHash channel: two
clips that re-encode the same speech at different codecs/gains produce
near-identical cepstra even when their bytes share nothing.

Every stage is a closed form chosen so a relational engine can replay
the whole chain independently (the driver oracle recomputes
DFT -> mel -> log -> DCT in pure SQL; see entry_queries.audio_mfcc):

  window   w[n]   = 0.5 - 0.5*cos(2*pi*n/F)              (periodic Hann)
  power    P[k]   = re^2 + im^2,  re/im the naive DFT of x*w, k=0..F/2
  mel      mel(f) = 2595*log10(1 + f/700)                (HTK curve)
  bank     E[m]   = sum_k tri_m(k*sr/F) * P[k], triangular filters with
                    n_mels+2 edges equally spaced in mel over [0, sr/2]
  log      L[m]   = log10(E[m] + 1)       (+1: exact zero stays finite)
  cepstrum C[j]   = sum_m L[m]*cos(pi*j*(2m+1)/(2*n_mels))  (DCT-II,
                    unnormalized), j = 0..n_coef-1

Framing is sample-exact: frame t covers samples [t*hop, t*hop+F); the
tail partial frame is dropped. The numpy path uses rfft; parity with a
per-sample naive DFT is pinned by tests/test_mfcc.py, and outputs are
rounded (default 3 decimals) so both engines land on identical doubles
with ~1e5x margin over accumulated float error.

Scale shape: one Arrow-batched mapInPandas pass, embarrassingly
parallel per clip, no shuffle; output is (clip, frame, coef) long-form
rows so downstream aggregation (mean vector per clip) is a plain
map-side-combinable groupBy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MFCC_SCHEMA = "clip_id string, frame int, coef int, mfcc double"


def mel_of(f):
    """HTK mel curve; accepts scalars or arrays."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_inv(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, frame: int, n_mels: int) -> np.ndarray:
    """(n_mels, frame//2 + 1) triangular filters, edges mel-uniform over
    [0, sr/2], weights evaluated at the actual bin frequencies k*sr/frame
    (no bin snapping -- the SQL oracle replays this expression exactly)."""
    edges = mel_inv(np.linspace(0.0, float(mel_of(sr / 2.0)), n_mels + 2))
    freqs = np.arange(frame // 2 + 1, dtype=np.float64) * (sr / frame)
    lo, mid, hi = edges[:-2, None], edges[1:-1, None], edges[2:, None]
    rising = (freqs[None, :] - lo) / (mid - lo)
    falling = (hi - freqs[None, :]) / (hi - mid)
    return np.clip(np.minimum(rising, falling), 0.0, None)


def mfcc_frames(
    x: np.ndarray,
    sr: int,
    frame: int = 64,
    hop: int = 64,
    n_mels: int = 10,
    n_coef: int = 6,
) -> np.ndarray:
    """(n_samples,) int/float PCM -> (n_frames, n_coef) float64 MFCC.

    Operates on raw sample VALUES (no 1/32768 normalization): large
    magnitudes keep every downstream float comfortably inside the
    rounding margin the oracle parity relies on."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < frame:
        return np.zeros((0, n_coef), dtype=np.float64)
    n_frames = (len(x) - frame) // hop + 1
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    spec = np.fft.rfft(x[idx] * w, axis=1)
    power = spec.real**2 + spec.imag**2
    bank = mel_filterbank(sr, frame, n_mels)
    logmel = np.log10(power @ bank.T + 1.0)
    m = np.arange(n_mels, dtype=np.float64)
    j = np.arange(n_coef, dtype=np.float64)
    dct = np.cos(np.pi * j[:, None] * (2.0 * m[None, :] + 1.0) / (2 * n_mels))
    return logmel @ dct.T


def mfcc_features(
    clips: DataFrame,
    frame: int = 64,
    hop: int = 64,
    n_mels: int = 10,
    n_coef: int = 6,
    decimals: int = 3,
    id_col: str = "clip_id",
) -> DataFrame:
    """clips (id, bytes, sr_hz, codec) -> long-form MFCC rows
    (clip_id, frame, coef, mfcc), one Arrow pass, no shuffle."""
    from .multimodal import _decode_pcm_batch

    def gen(batches):
        for pdf in batches:
            out = {"clip_id": [], "frame": [], "coef": [], "mfcc": []}
            for cid, raw, sr, codec in zip(
                pdf[id_col], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                pcm = _decode_pcm_batch(bytes(raw), codec)
                c = mfcc_frames(pcm, int(sr), frame, hop, n_mels, n_coef)
                t, n = c.shape
                out["clip_id"].extend([cid] * (t * n))
                out["frame"].extend(np.repeat(np.arange(t), n))
                out["coef"].extend(np.tile(np.arange(n), t))
                out["mfcc"].extend(np.round(c, decimals).ravel())
            yield pd.DataFrame(out)

    cols = [id_col, "bytes", "sr_hz", "codec"]
    return clips.select(*cols).mapInPandas(gen, schema=MFCC_SCHEMA)
