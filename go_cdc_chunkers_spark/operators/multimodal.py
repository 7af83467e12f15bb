"""Multimodal column handling: opaque binary payload + typed metadata.

Audio (this graft's payload) is fully real: pcm_s16le decode, framing,
per-frame features (energy, zero-crossing rate), frame sampling -- all
numpy inside mapInPandas (Arrow batches; no per-row Python math). Other
modalities (image/video) get the same Spark-side plumbing -- schema,
batching, partitioning, UDF signature -- with the codec call stubbed behind
NotImplementedError (decode libs are not in this image); the deterministic
fake decoder exercises the plumbing in tests.

Scale notes: mapInPandas streams Arrow batches, so executor memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch x payload size, not
partition size -- the pooled-buffer analogue (chunkers.go:112-152).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_FEATURES_SCHEMA = (
    "clip_id string, frame_idx int, t_ms int, energy double, zcr double"
)


def _decode_pcm_batch(raw: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        n = len(raw) - (len(raw) % 2)
        return np.frombuffer(raw[:n], dtype="<i2")
    raise NotImplementedError(
        f"codec {codec!r}: real decoder not available in this image; "
        "plumbing (schema/batching) is exercised with pcm_s16le"
    )


def audio_frame_features(
    clips: DataFrame,
    frame_ms: int = 20,
    id_col: str = "clip_id",
) -> DataFrame:
    """clips -> one row per frame with RMS energy and zero-crossing rate.

    Framing is sample-exact: frame k covers samples [k*W, (k+1)*W) with
    W = sr*frame_ms/1000; the tail partial frame is dropped (standard)."""

    def gen(batches):
        for pdf in batches:
            out = {"clip_id": [], "frame_idx": [], "t_ms": [], "energy": [], "zcr": []}
            for cid, raw, sr, codec in zip(
                pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                pcm = _decode_pcm_batch(bytes(raw), codec).astype(np.float64) / 32768.0
                w = int(sr) * frame_ms // 1000
                if w <= 0 or len(pcm) < w:
                    continue
                k = len(pcm) // w
                frames = pcm[: k * w].reshape(k, w)
                energy = np.sqrt((frames**2).mean(axis=1))
                zc = (np.abs(np.diff(np.signbit(frames), axis=1).astype(np.int8))).sum(axis=1)
                zcr = zc / (w - 1)
                out["clip_id"].extend([cid] * k)
                out["frame_idx"].extend(range(k))
                out["t_ms"].extend([i * frame_ms for i in range(k)])
                out["energy"].extend(np.round(energy, 9))
                out["zcr"].extend(np.round(zcr, 9))
            yield pd.DataFrame(out)

    cols = [id_col, "bytes", "sr_hz", "codec"]
    return clips.select(*cols).mapInPandas(gen, schema=FRAME_FEATURES_SCHEMA)


def audio_frame_sample(
    clips: DataFrame,
    every_n: int = 10,
    frame_ms: int = 20,
    id_col: str = "clip_id",
) -> DataFrame:
    """Frame sampling: keep every Nth frame's raw bytes (the video
    frame-sample analogue). Returns (clip_id, frame_idx, frame_bytes)."""

    def gen(batches):
        for pdf in batches:
            rows = {"clip_id": [], "frame_idx": [], "frame_bytes": []}
            for cid, raw, sr, codec in zip(
                pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                pcm = _decode_pcm_batch(bytes(raw), codec)
                w = int(sr) * frame_ms // 1000
                if w <= 0:
                    continue
                k = len(pcm) // w
                for i in range(0, k, every_n):
                    rows["clip_id"].append(cid)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(pcm[i * w : (i + 1) * w].tobytes())
            yield pd.DataFrame(rows)

    return clips.select(id_col, "bytes", "sr_hz", "codec").mapInPandas(
        gen, schema="clip_id string, frame_idx int, frame_bytes binary"
    )


# ---------------------------------------------------------------------------
# Stubbed modalities: real Spark plumbing, fake decode.
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = "item_id string, width int, height int, mean_luma double"


def image_features(images: DataFrame, id_col: str = "item_id",
                   deterministic_fake: bool = False) -> DataFrame:
    """Image decode + feature extraction plumbing. With deterministic_fake,
    a seeded stand-in 'decoder' (bytes -> pseudo pixel stats) exercises the
    batch path end to end; without it, raises NotImplementedError exactly
    where a real `PIL.Image.open` call would go."""

    def gen(batches):
        for pdf in batches:
            out = {"item_id": [], "width": [], "height": [], "mean_luma": []}
            for iid, raw in zip(pdf[id_col], pdf["bytes"]):
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image decode requires PIL/opencv (not in this image); "
                        "run with deterministic_fake=True to exercise plumbing"
                    )
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                w = 16 + int(buf[:4].sum()) % 64 if len(buf) >= 4 else 16
                h = 16 + int(buf[4:8].sum()) % 64 if len(buf) >= 8 else 16
                out["item_id"].append(iid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(float(buf.mean()) if len(buf) else 0.0)
            yield pd.DataFrame(out)

    return images.select(F.col(id_col).alias("item_id"), "bytes").mapInPandas(
        gen, schema=IMAGE_FEATURES_SCHEMA
    )
