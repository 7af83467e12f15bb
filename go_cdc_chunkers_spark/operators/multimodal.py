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


def _decode_wav(raw: bytes) -> np.ndarray:
    """Real RIFF/WAVE parser, no codec libs: walks the chunk list and
    decodes format tag 1 (PCM s16le) directly, tags 6/7 (G.711 A-law /
    mu-law) and 0x11 (IMA ADPCM, mono, fmt-declared block align) via the
    closed-form decoders in operators/codecs.py."""
    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, tag, data = 12, None, None
    block_align = channels = 0
    ext_wspb = fact_samples = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size = int.from_bytes(raw[pos + 4:pos + 8], "little")
        body = raw[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag == 1 and bits != 16:
                raise NotImplementedError(f"wav: PCM bits={bits} (s16le only)")
            if len(body) >= 18:
                cb = int.from_bytes(body[16:18], "little")
                if cb >= 2 and len(body) >= 20:
                    ext_wspb = int.from_bytes(body[18:20], "little")
        elif cid == b"fact":
            if len(body) >= 4:
                fact_samples = int.from_bytes(body[0:4], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if tag is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    from . import codecs

    if tag == 1:
        n = len(data) - (len(data) % 2)
        return np.frombuffer(data[:n], dtype="<i2")
    if tag == 6:
        return codecs.alaw_decode(data)
    if tag == 7:
        return codecs.mulaw_decode(data)
    if tag == 0x11:
        # decode-for-real-or-raise: a zero channel count or block align is
        # a malformed fmt chunk, not something to default around
        if channels == 0 or block_align == 0:
            raise ValueError(
                f"wav: malformed IMA ADPCM fmt (channels={channels}, "
                f"block_align={block_align})")
        if channels not in (1, 2):
            raise NotImplementedError(
                f"wav: IMA ADPCM decoded for mono/stereo only ({channels} ch)")
        spb = (block_align - 4 * channels) * 2 // channels + 1
        if ext_wspb is not None and ext_wspb != spb:
            raise NotImplementedError(
                f"wav: nonstandard wSamplesPerBlock {ext_wspb} "
                f"(block_align {block_align} implies {spb})")
        out = codecs.ima_adpcm_decode(data, block_align, channels=channels)
        if fact_samples is not None:
            # fact carries the true per-channel sample count: encoders pad
            # the final block, so trim the decoded tail to it
            out = out[: fact_samples * channels]
        return out
    raise NotImplementedError(
        f"wav: format tag {tag} not decodable here (PCM s16le, G.711 "
        "A-law/mu-law, and mono IMA ADPCM are decoded for real)"
    )


def _decode_pcm_batch(raw: bytes, codec: str) -> np.ndarray:
    from . import codecs

    if codec == "pcm_s16le":
        n = len(raw) - (len(raw) % 2)
        return np.frombuffer(raw[:n], dtype="<i2")
    if codec == "wav":
        return _decode_wav(raw)
    if codec == "pcm_mulaw":
        return codecs.mulaw_decode(raw)
    if codec == "pcm_alaw":
        return codecs.alaw_decode(raw)
    if codec == "adpcm_ima":
        return codecs.ima_adpcm_decode(raw)
    if codec == "flac":
        from . import flac as flac_codec

        samples, _sr, bps = flac_codec.flac_decode(raw)
        if bps != 16:
            raise NotImplementedError(
                f"flac: PCM pipeline path expects 16-bit streams (got "
                f"bps={bps}); decode via operators.flac.flac_decode directly")
        return samples.astype(np.int16).ravel()  # row-major = interleaved
    raise NotImplementedError(
        f"codec {codec!r}: not decodable without codec libraries; decoded "
        "for real here: pcm_s16le, RIFF/WAVE (PCM/G.711/IMA-ADPCM), "
        "pcm_mulaw, pcm_alaw, adpcm_ima, flac"
    )


def make_pcm_sha_udf():
    """Series->Series pandas UDF (bytes, codec) -> hex sha256 of the
    DECODED int16 PCM byte stream. The content identity behind the
    pipeline's exact_first + normalize_pcm mode (plans/pipeline.py):
    lossless containers of the same audio (raw PCM, WAV, FLAC) hash
    identically, so cross-codec exact re-uploads collapse to one
    canonical before any expensive stage. One fused ArrowEvalPython,
    same stance as the decode-fused chunk UDF."""
    import hashlib

    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _pcm_sha(data: pd.Series, codec: pd.Series) -> pd.Series:
        out = []
        for b, c in zip(data, codec):
            if b is None:
                out.append(hashlib.sha256(b"").hexdigest())
                continue
            out.append(
                hashlib.sha256(
                    _decode_pcm_batch(bytes(b), c).tobytes()).hexdigest())
        return pd.Series(out)

    return _pcm_sha


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


def silence_trim(
    frames: DataFrame,
    threshold: float = 0.01,
    frame_ms: int = 20,
) -> DataFrame:
    """Per-clip leading/trailing silence over an audio_frame_features
    relation: a frame is silent when RMS energy < threshold. Returns
    (clip_id, n_frames, lead_silence_frames, trail_silence_frames,
    active_frames, active_span_ms) -- the trim coordinates a training
    pipeline uses to drop dead air before chunking/fingerprinting.

    Pure relational min/max over the active subset (all JVM, one groupBy
    per side, co-keyed on clip_id); an all-silent clip reports
    lead = n_frames, active span 0."""
    per = frames.groupBy("clip_id").agg(F.count("*").cast("long").alias("n_frames"))
    act = (
        frames.filter(F.col("energy") >= threshold)
        .groupBy("clip_id")
        .agg(
            F.min("frame_idx").alias("_fa"),
            F.max("frame_idx").alias("_la"),
            F.count("*").cast("long").alias("_active"),
        )
    )
    return per.join(act, "clip_id", "left").select(
        "clip_id",
        "n_frames",
        F.coalesce("_fa", F.col("n_frames")).cast("long").alias("lead_silence_frames"),
        F.coalesce(F.col("n_frames") - 1 - F.col("_la"), F.col("n_frames"))
        .cast("long").alias("trail_silence_frames"),
        F.coalesce("_active", F.lit(0)).cast("long").alias("active_frames"),
        (F.coalesce(F.col("_la") - F.col("_fa") + 1, F.lit(0)) * frame_ms)
        .cast("long").alias("active_span_ms"),
    )


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
# Image: real decoders for uncompressed formats (PPM P6, 24-bit BMP) --
# no codec libs needed; compressed formats (JPEG/PNG/...) raise where a
# PIL/opencv call would go (libs absent in this image). Fake path kept for
# plumbing tests.
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = "item_id string, width int, height int, mean_luma double"


def _decode_ppm(raw: bytes) -> np.ndarray:
    """PPM P6 (binary RGB): returns HxWx3 uint8."""
    if not raw.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    parts, pos, token = [], 2, b""
    while len(parts) < 3 and pos < len(raw):
        c = raw[pos:pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            if token:
                parts.append(int(token))
                token = b""
        else:
            token += c
        pos += 1
    w, h, maxval = parts
    if maxval != 255:
        raise NotImplementedError("ppm: only maxval 255")
    px = np.frombuffer(raw[pos:pos + w * h * 3], dtype=np.uint8)
    return px.reshape(h, w, 3)


def _decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): returns HxWx3 uint8 RGB,
    top-down row order (BMP stores bottom-up, BGR, 4-byte-padded rows)."""
    if raw[0:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    comp = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"bmp: only uncompressed 24-bit (bpp={bpp})")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(raw[data_off:data_off + stride * abs(h)], dtype=np.uint8)
    rows = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    bgr = rows[::-1] if h > 0 else rows  # bottom-up -> top-down
    return bgr[:, :, ::-1]  # BGR -> RGB


def decode_image(raw: bytes) -> np.ndarray:
    if raw.startswith(b"P6"):
        return _decode_ppm(raw)
    if raw[0:2] == b"BM":
        return _decode_bmp(raw)
    if raw.startswith(b"\x89PNG\r\n\x1a\n"):
        from .png import png_pixels  # stdlib-zlib decoder, no codec libs

        return png_pixels(raw)[:, :, :3]  # RGBA -> RGB for the feature path
    if raw.startswith(b"\xff\xd8"):
        from .jpeg import jpeg_pixels  # pure-numpy baseline DCT decoder

        return jpeg_pixels(raw)
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_pixels  # pure-Python LZW decoder

        return gif_pixels(raw)[:, :, :3]  # RGBA -> RGB for the feature path
    if raw[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import tiff_pixels  # TIFF (none/LZW/PackBits)

        px = tiff_pixels(raw)
        if px.ndim == 2:  # gray -> RGB for the feature path
            return np.repeat(px[:, :, None], 3, axis=2)
        return px[:, :, :3]
    raise NotImplementedError(
        "image decode: PPM P6, 24-bit BMP, PNG "
        "(all depths/interlace/tRNS), baseline+progressive JPEG, GIF "
        "(LZW/interlace/animation/all disposals) and TIFF "
        "(none/LZW+predictor/PackBits) are "
        "decoded for real; other formats (WebP/tiled TIFF/...) need "
        "PIL/opencv, not in this image"
    )


def image_features(images: DataFrame, id_col: str = "item_id",
                   deterministic_fake: bool = False) -> DataFrame:
    """Image decode + feature extraction. Real decode for PPM P6 / 24-bit
    BMP (pure numpy); mean_luma uses the Rec.601 integer-friendly weights.
    With deterministic_fake, a seeded stand-in 'decoder' exercises the
    batch path for arbitrary bytes instead."""

    def gen(batches):
        for pdf in batches:
            out = {"item_id": [], "width": [], "height": [], "mean_luma": []}
            for iid, raw in zip(pdf[id_col], pdf["bytes"]):
                if deterministic_fake:
                    buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                    w = 16 + int(buf[:4].sum()) % 64 if len(buf) >= 4 else 16
                    h = 16 + int(buf[4:8].sum()) % 64 if len(buf) >= 8 else 16
                    luma = float(buf.mean()) if len(buf) else 0.0
                else:
                    img = decode_image(bytes(raw))
                    h, w = img.shape[0], img.shape[1]
                    px = img.astype(np.float64)
                    luma = float(
                        (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                         + 0.114 * px[:, :, 2]).mean()
                    )
                out["item_id"].append(iid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(round(luma, 9))
            yield pd.DataFrame(out)

    return images.select(F.col(id_col).alias("item_id"), "bytes").mapInPandas(
        gen, schema=IMAGE_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video: raw (uncontainered) frame formats -- frame sampling is real byte
# math; compressed codecs raise where an ffmpeg/pyav call would go.
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = "item_id string, frame_idx int, t_ms int, frame_bytes binary"

_PIXFMT_BPP = {"yuv420p": 1.5, "gray8": 1.0, "rgb24": 3.0}


def video_frame_sample(
    videos: DataFrame,
    every_n: int = 10,
    id_col: str = "item_id",
    pixfmt_col: str = "pixfmt",
    width_col: str = "width",
    height_col: str = "height",
    fps_col: str = "fps",
) -> DataFrame:
    """Sample every Nth frame of a RAW video byte stream (yuv420p / gray8 /
    rgb24 with typed metadata columns): frame size is width*height*bpp, so
    sampling is exact byte slicing -- a real implementation, no codec
    needed. Compressed payloads raise NotImplementedError at the decode
    point (ffmpeg/pyav absent in this image)."""

    def gen(batches):
        for pdf in batches:
            out = {"item_id": [], "frame_idx": [], "t_ms": [], "frame_bytes": []}
            for iid, raw, fmt, w, h, fps in zip(
                pdf[id_col], pdf["bytes"], pdf[pixfmt_col],
                pdf[width_col], pdf[height_col], pdf[fps_col],
            ):
                if fmt not in _PIXFMT_BPP:
                    raise NotImplementedError(
                        f"video pixfmt {fmt!r}: compressed codecs need "
                        "ffmpeg/pyav (not in this image); raw yuv420p/"
                        "gray8/rgb24 are sampled for real"
                    )
                w, h = int(w), int(h)
                if fmt == "yuv420p" and (w % 2 or h % 2):
                    # 4:2:0 chroma planes are (w/2)x(h/2); odd dims would
                    # silently truncate w*h*1.5 and mis-slice every frame.
                    raise ValueError(
                        f"yuv420p requires even dimensions, got {w}x{h} "
                        f"for item {iid!r}"
                    )
                fsz = int(w * h * _PIXFMT_BPP[fmt])
                n_frames = len(raw) // fsz
                for i in range(0, n_frames, every_n):
                    out["item_id"].append(iid)
                    out["frame_idx"].append(i)
                    out["t_ms"].append(int(i * 1000 / float(fps)))
                    out["frame_bytes"].append(bytes(raw[i * fsz:(i + 1) * fsz]))
            yield pd.DataFrame(out)

    cols = [F.col(id_col).alias("item_id"), "bytes", pixfmt_col, width_col,
            height_col, fps_col]
    return videos.select(*cols).mapInPandas(gen, schema=VIDEO_FRAME_SCHEMA)


def _resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, 3) -> (out_h, out_w, 3): source index
    floor(i * in / out) -- deterministic pure-integer index math, the same
    sampling every library's NEAREST mode uses up to rounding convention."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys[:, None], xs[None, :]]


def _encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def image_resize(
    images: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "item_id",
) -> DataFrame:
    """(item_id, width, height, bytes): decode (real for PPM P6 / 24-bit
    BMP; compressed formats raise at the decode point, same contract as
    image_features), nearest-neighbor resize, re-encode as PPM P6. Narrow
    mapInPandas stage -- the batch-resize step of a training-data image
    pipeline."""

    def gen(batches):
        for pdf in batches:
            out = {"item_id": [], "width": [], "height": [], "bytes": []}
            for iid, raw in zip(pdf[id_col], pdf["bytes"]):
                img = _resize_nearest(decode_image(bytes(raw)), out_w, out_h)
                out["item_id"].append(iid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["bytes"].append(_encode_ppm(img))
            yield pd.DataFrame(out)

    return images.select(F.col(id_col).alias("item_id"), "bytes").mapInPandas(
        gen, schema="item_id string, width int, height int, bytes binary"
    )


def _resample_linear(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample int16 -> int16 at exact rational
    positions t_j = j * sr_in / sr_out. Deterministic (integer position
    arithmetic + one float lerp per sample, rounded half-away-from-zero).
    Linear interpolation is the standard cheap resampler; for band-limited
    content below ~sr_out/4 it keeps SNR well above the pipeline's 30 dB
    per-row invariant (pinned by test), and downsampling callers are
    expected to low-pass first if their content nears the new Nyquist."""
    if sr_in == sr_out or len(pcm) == 0:
        return pcm.copy()
    n_out = (len(pcm) * sr_out) // sr_in
    j = np.arange(n_out, dtype=np.int64)
    num = j * sr_in
    idx = num // sr_out
    frac = (num - idx * sr_out).astype(np.float64) / sr_out
    idx = np.minimum(idx, len(pcm) - 1)
    nxt = np.minimum(idx + 1, len(pcm) - 1)
    x = pcm.astype(np.float64)
    y = x[idx] * (1.0 - frac) + x[nxt] * frac
    return np.clip(np.floor(y + 0.5), -32768, 32767).astype("<i2")


def resample_audio(
    clips: DataFrame,
    out_sr: int,
    id_col: str = "clip_id",
) -> DataFrame:
    """(clip_id, sr_hz=out_sr, dur_ms, bytes): per-clip PCM resample to a
    common rate -- the normalization step before fingerprinting mixed-rate
    corpora (operators/audio_fp.py assumes one rate; frame energies compare
    across clips only at equal sr). Narrow mapInPandas; decode honors the
    clip's codec (pcm_s16le / RIFF wav)."""

    def gen(batches):
        for pdf in batches:
            out = {"clip_id": [], "sr_hz": [], "dur_ms": [], "bytes": []}
            for cid, raw, sr, codec in zip(
                pdf[id_col], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                pcm = _decode_pcm_batch(bytes(raw), codec)
                res = _resample_linear(pcm, int(sr), out_sr)
                out["clip_id"].append(cid)
                out["sr_hz"].append(out_sr)
                out["dur_ms"].append(int(len(res) * 1000 / out_sr))
                out["bytes"].append(res.tobytes())
            yield pd.DataFrame(out)

    return clips.select(
        F.col(id_col).alias("clip_id"), "bytes", "sr_hz", "codec"
    ).mapInPandas(
        gen, schema="clip_id string, sr_hz int, dur_ms int, bytes binary"
    )
