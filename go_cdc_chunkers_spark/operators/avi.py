"""MJPEG-in-AVI video: dependency-free container codec + near-dup channel.

The reference's corpus tooling chunks arbitrary file trees
(/root/reference/cmd/cdc/stats.go:158-171); real trees hold video. This
module gives the engine a COMPRESSED video format it can decode for real:
AVI (RIFF) container parsing with Motion-JPEG frames, each frame decoded
by operators/jpeg.py's pure-numpy baseline decoder. Everything else
(H.264/HEVC/VP9...) keeps the honest NotImplementedError at the decode
point -- those need ffmpeg/pyav, absent in this image.

Scale shape: MJPEG's container gives frame boundaries WITHOUT decoding
(each '00dc' chunk is one standalone JPEG), so frame sampling slices the
byte stream and decodes only the kept frames -- the every_n=30 thumbnail
pass over a video corpus pays 1/30th of the decode, not 1/1.

Near-dup channel: per-sampled-frame 64-bit dHash (operators/imagehash.py)
-> per-(video, hash) canonicalization (min frame index -- the audio_fp.py
skew control: a static scene contributes ONE row per distinct hash, so
the candidate join is bounded by distinct-hash counts, never frames^2)
-> document-frequency stop-hash pruning (black/boilerplate frames) ->
banded Hamming equi-join -> frame-offset histogram alignment (Wang-2003
style, like audio_fp): two videos are near-dups when many frame hashes
match at ONE consistent temporal offset. All post-decode stages are JVM
column expressions.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Container: encode
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(subtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", subtype + payload)


def avi_encode(frames: list[np.ndarray], fps: int = 10, quality: int = 85) -> bytes:
    """Encode (H, W, 3) uint8 frames as an MJPEG AVI (RIFF): standard
    hdrl (avih + one 'vids'/'MJPG' strl), movi with one '00dc' JPEG per
    frame, and an idx1 index. Round-trips through avi_chunks/jpeg_pixels."""
    from .jpeg import jpeg_encode

    if not frames:
        raise ValueError("avi_encode: need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("avi_encode: all frames must share dimensions")
    jpegs = [jpeg_encode(f, quality=quality) for f in frames]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I", round(1_000_000 / fps), max_sz * fps, 0, 0x10,  # HASINDEX
        len(jpegs), 0, 1, max_sz, w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4H", b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(jpegs), max_sz, -1, 0, 0, 0, w, h)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    idx, off = [], 4  # offsets relative to the start of 'movi' subtype tag
    for j in jpegs:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Container: decode
# ---------------------------------------------------------------------------


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in [start, end).

    A declared size overrunning the buffer raises ValueError (torn/truncated
    file) instead of escaping as struct.error from a header unpack or --
    worse -- silently yielding a short frame slice that decodes garbage
    downstream: in a corpus-scale ingest, truncated files are a WHEN, and
    the error must be catchable and say what happened."""
    p = start
    while p + 8 <= end:
        fourcc = data[p:p + 4]
        (size,) = struct.unpack_from("<I", data, p + 4)
        if p + 8 + size > end:
            raise ValueError(
                f"truncated AVI: chunk {fourcc!r} at byte {p} declares "
                f"{size} payload bytes, {end - p - 8} remain")
        yield fourcc, p + 8, size
        p += 8 + size + (size % 2)


def avi_info(raw: bytes) -> dict:
    """Parse container metadata + frame byte ranges WITHOUT decoding any
    frame: {width, height, fps, n_frames, frames: [(offset, size), ...]}.
    Raises on non-AVI RIFF, non-MJPG video streams, or a missing movi."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    width = height = None
    rate, scale = None, None
    handler = compression = None
    frames: list[tuple[int, int]] = []

    def walk_list(start, end):
        nonlocal width, height, rate, scale, handler, compression
        for fourcc, ps, sz in _walk(raw, start, end):
            if fourcc == b"LIST":
                sub = raw[ps:ps + 4]
                if sub in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk_list(ps + 4, ps + sz)
            elif fourcc == b"avih" and sz >= 40:
                vals = struct.unpack_from("<10I", raw, ps)
                width, height = width or vals[8], height or vals[9]
            elif fourcc == b"strh" and sz >= 48:
                ftype, fhandler = raw[ps:ps + 4], raw[ps + 4:ps + 8]
                if ftype == b"vids":
                    handler = fhandler
                    scale, rate = struct.unpack_from("<II", raw, ps + 20)
            elif fourcc == b"strf" and sz >= 40 and compression is None:
                compression = raw[ps + 16:ps + 20]
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append((ps, sz))

    walk_list(12, len(raw))
    if not frames:
        raise ValueError("AVI has no movi frame chunks")
    codec = (handler or b"").strip(b"\x00 ") or (compression or b"").strip(b"\x00 ")
    if codec.upper() not in (b"MJPG", b"MJPEG"):
        raise NotImplementedError(
            f"AVI codec {codec!r}: only MJPEG is decoded dependency-free; "
            "H.264/HEVC/VP9 need ffmpeg/pyav (not in this image)")
    fps = (rate / scale) if rate and scale else 0.0
    return {"width": width, "height": height, "fps": fps,
            "n_frames": len(frames), "frames": frames}


def avi_frame_jpegs(raw: bytes, every_n: int = 1) -> list[tuple[int, bytes]]:
    """[(frame_idx, jpeg_bytes)] for every Nth frame -- pure byte slicing,
    no decode (the sampling-is-cheap property MJPEG gives us)."""
    info = avi_info(raw)
    return [(i, raw[off:off + sz])
            for i, (off, sz) in enumerate(info["frames"]) if i % every_n == 0]


def avi_pixels(raw: bytes, every_n: int = 1) -> list[tuple[int, np.ndarray]]:
    """[(frame_idx, (H, W, 3) uint8)] for every Nth frame."""
    from .jpeg import jpeg_pixels

    return [(i, jpeg_pixels(j)) for i, j in avi_frame_jpegs(raw, every_n)]


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

FRAME_HASH_SCHEMA = "item_id string, frame_idx int, dhash long"
FRAME_CELL_SCHEMA = "item_id string, frame_idx int, cy int, cx int, luma long"


def mjpeg_frame_hashes(videos: DataFrame, every_n: int = 1,
                       id_col: str = "item_id",
                       data_col: str = "bytes") -> DataFrame:
    """(id, AVI bytes) -> (item_id, frame_idx, dhash): one Arrow pass that
    slices frame ranges from the container and decodes ONLY the sampled
    frames. dhash64 is operators/imagehash.py's -- a video frame and a
    still image of the same pixels get the same hash, so the image and
    video near-dup channels share hash space."""
    import pandas as pd

    from .imagehash import dhash64
    from .jpeg import jpeg_pixels

    def gen(batches):
        for pdf in batches:
            out = {"item_id": [], "frame_idx": [], "dhash": []}
            for iid, raw in zip(pdf[id_col], pdf[data_col]):
                for i, j in avi_frame_jpegs(bytes(raw), every_n):
                    out["item_id"].append(iid)
                    out["frame_idx"].append(i)
                    out["dhash"].append(dhash64(jpeg_pixels(j)))
            yield pd.DataFrame(out)

    return videos.select(F.col(id_col).alias("item_id"),
                         F.col(data_col).alias("bytes")).mapInPandas(
        gen, FRAME_HASH_SCHEMA)


def mjpeg_frame_cells(videos: DataFrame, every_n: int = 1,
                      id_col: str = "item_id",
                      data_col: str = "bytes") -> DataFrame:
    """Long-form dHash input cells (item_id, frame_idx, cy, cx, luma) for
    the sampled frames: the 8x9 integer-luma grid dhash64 compares. The
    oracle hook -- a relational engine rebuilds every dhash bit from this
    relation, so banding/join/alignment are checkable end to end."""
    import pandas as pd

    from .jpeg import jpeg_pixels

    def gen(batches):
        for pdf in batches:
            out = {"item_id": [], "frame_idx": [], "cy": [], "cx": [], "luma": []}
            for iid, raw in zip(pdf[id_col], pdf[data_col]):
                for i, j in avi_frame_jpegs(bytes(raw), every_n):
                    img = jpeg_pixels(j)
                    h, w = img.shape[:2]
                    ys = (np.arange(8) * h) // 8
                    xs = (np.arange(9) * w) // 9
                    cell = img[ys[:, None], xs[None, :], :].astype(np.int64)
                    luma = (299 * cell[:, :, 0] + 587 * cell[:, :, 1]
                            + 114 * cell[:, :, 2]) // 1000
                    for cy in range(8):
                        for cx in range(9):
                            out["item_id"].append(iid)
                            out["frame_idx"].append(i)
                            out["cy"].append(cy)
                            out["cx"].append(cx)
                            out["luma"].append(int(luma[cy, cx]))
            yield pd.DataFrame(out)

    return videos.select(F.col(id_col).alias("item_id"),
                         F.col(data_col).alias("bytes")).mapInPandas(
        gen, FRAME_CELL_SCHEMA)


def dhash_from_cells(cells: DataFrame) -> DataFrame:
    """(item_id, frame_idx, cy, cx, luma) -> (item_id, frame_idx, dhash):
    the dhash64 bit construction as relational aggregation (bit y*8+x set
    iff luma[y][x+1] > luma[y][x]; bit 63 folds into the sign). Exists so
    tests can pin cells -> hash == numpy dhash64, and oracles can replay
    it."""
    lhs = cells.filter(F.col("cx") < 8).select(
        "item_id", "frame_idx", "cy", "cx", F.col("luma").alias("l0"))
    rhs = cells.filter(F.col("cx") > 0).select(
        "item_id", "frame_idx", "cy",
        (F.col("cx") - 1).alias("cx"), F.col("luma").alias("l1"))
    # shiftleft() in the Python API takes an int literal only; the SQL
    # form accepts a computed bit position. Bit 63 folds into the sign.
    weight = F.expr(
        "CASE WHEN l1 <= l0 THEN CAST(0 AS BIGINT) "
        "WHEN cy * 8 + cx = 63 THEN CAST('-9223372036854775808' AS BIGINT) "
        "ELSE shiftleft(CAST(1 AS BIGINT), cy * 8 + cx) END"
    )
    return (
        lhs.join(rhs, ["item_id", "frame_idx", "cy", "cx"])
        .groupBy("item_id", "frame_idx")
        .agg(F.sum(weight).cast("long").alias("dhash"))
    )


def video_near_pairs(frame_hashes: DataFrame, max_hamming: int = 3,
                     max_df: int = 16, min_aligned: int = 2,
                     max_band_df: int | None = None,
                     persist_hashes: bool = True) -> DataFrame:
    """Offset-aligned video near-dup pairs from (item_id, frame_idx, dhash).

    Stages (all JVM):
      1. canonicalize: min frame_idx per (item_id, dhash) -- static scenes
         contribute one row per distinct hash (join input bounded by
         distinct hashes, the audio_fp.py skew control);
      2. stop-hash prune: hashes in > max_df distinct videos dropped
         (black frames / title cards). Note this is a BOILERPLATE control,
         not a join-skew bound: near-neighbors of a stop hash (every
         near-black frame in the corpus) each have low df yet still pile
         into the same band buckets;
      3. banded Hamming equi-join (imagehash.py bands; pigeonhole-exact
         for max_hamming <= 3). max_band_df, when set, additionally drops
         band buckets touched by > max_band_df distinct videos BEFORE the
         join -- the actual join-key skew cap (bucket fan-out is what a
         hot key costs at scale, same control as the audio_fp.py and
         candidates.py star caps). It trades recall: a pair whose only
         unchanged bands are all hot is missed, so the pigeonhole-exact
         claim holds only for max_band_df=None (default);
      4. temporal alignment: per (a, b) the modal frame offset and its
         support; near-dup = >= min_aligned hash matches agreeing on ONE
         offset (a trimmed/re-encoded copy aligns; coincidental single-
         frame matches don't).

    Returns (a, b, offset, n_aligned, n_matches) with a < b, one row per
    pair (the best offset; ties broken toward the smallest offset).

    persist_hashes caches the canonicalized relation (16 bytes/distinct
    frame hash -- tiny next to the videos): the plan fans out into four
    branches (df counts, prune, join left/right), and without the cache
    each would re-run the upstream JPEG decode -- measured 2x decode even
    with AQE exchange reuse (test_video_decode_runs_once pins 1x)."""
    from .imagehash import BAND_BITS, N_BANDS

    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"max_hamming {max_hamming} > {N_BANDS - 1}: the {N_BANDS}-band "
            "pigeonhole join only guarantees recall for Hamming <= "
            f"{N_BANDS - 1} (same contract as imagehash.dhash_near_pairs)")

    canon = frame_hashes.groupBy("item_id", "dhash").agg(
        F.min("frame_idx").alias("frame_idx"))
    if persist_hashes:
        canon = canon.persist()
    df_counts = canon.groupBy("dhash").agg(
        F.countDistinct("item_id").alias("_df"))
    pruned = (
        canon.join(F.broadcast(df_counts.filter(F.col("_df") > max_df)),
                   "dhash", "left_anti")
    )
    # band structs derive from the imagehash constants, so this channel's
    # hash space can never silently desync from dhash_near_pairs'
    bands = [
        F.struct(
            F.lit(i).alias("band_idx"),
            F.shiftrightunsigned(F.col("dhash"), i * BAND_BITS)
            .bitwiseAND(F.lit((1 << BAND_BITS) - 1)).alias("band_value"),
        )
        for i in range(N_BANDS)
    ]
    banded = pruned.select(
        "item_id", "dhash", "frame_idx",
        F.explode(F.array(*bands)).alias("b")
    ).select("item_id", "dhash", "frame_idx", "b.band_idx", "b.band_value")
    if max_band_df is not None:
        hot_buckets = banded.groupBy("band_idx", "band_value").agg(
            F.countDistinct("item_id").alias("_bdf")
        ).filter(F.col("_bdf") > max_band_df)
        banded = banded.join(F.broadcast(hot_buckets),
                             ["band_idx", "band_value"], "left_anti")
    left = banded.select(F.col("item_id").alias("a"), F.col("dhash").alias("ha"),
                         F.col("frame_idx").alias("fa"), "band_idx", "band_value")
    right = banded.select(F.col("item_id").alias("b"), F.col("dhash").alias("hb"),
                          F.col("frame_idx").alias("fb"), "band_idx", "band_value")
    matches = (
        left.join(right, ["band_idx", "band_value"])
        .filter(F.col("a") < F.col("b"))
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming)
        .select("a", "b", "ha", "hb", (F.col("fa") - F.col("fb")).alias("offset"))
        .distinct()  # one (a,b,ha,hb) survives multi-band agreement once
    )
    per_offset = matches.groupBy("a", "b", "offset").agg(
        F.count("*").cast("long").alias("n_aligned"))
    # n_matches = sum of n_aligned over the pair's offsets (matches rows
    # are distinct, so the counts partition exactly): a window sum over
    # the SAME (a, b) partitioning the rank needs, instead of a second
    # aggregate over `matches` joined back -- which re-executed the whole
    # banded self-join + distinct per action (the canon persist only
    # protects the decode, not the join).
    wp = Window.partitionBy("a", "b")
    w = wp.orderBy(F.desc("n_aligned"), F.asc("offset"))
    best = (
        per_offset
        .withColumn("n_matches", F.sum("n_aligned").over(wp).cast("long"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1).drop("_rk")
    )
    return (
        best.filter(F.col("n_aligned") >= min_aligned)
        .select("a", "b", F.col("offset").cast("long").alias("offset"),
                "n_aligned", "n_matches")
    )
