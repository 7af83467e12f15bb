"""Perceptual image hashing (dHash) and banded near-dup pairing.

Extends the engine's near-dup families to the image modality: dHash is
the difference hash -- nearest-neighbor sample to a 9x8 grid, integer
luma, one bit per horizontally adjacent cell pair ("right brighter than
left"), 64 bits total. Re-encodes of the same pixels (PNG vs PPM vs
BMP) hash identically; small edits flip a few bits, so near-dups sit at
small Hamming distance -- the image analogue of SimHash on transcripts.

Every step is exact integer arithmetic (floor-index sampling from
multimodal._resize_nearest, (299r+587g+114b)//1000 luma), so a
relational engine replays the full chain bit-for-bit; the driver oracle
(entry_queries.image_dhash_neardup) regenerates pixels from closed
forms and recomputes hashes AND brute-force Hamming pairs in SQL, which
certifies both the hash and the banded join's recall.

Pairing at scale mirrors dedup_text's SimHash banding: split the 64-bit
hash into 4 x 16-bit bands; by pigeonhole any pair at Hamming <= 3
agrees exactly on >= 1 band, so a band-keyed equi-join (shuffle on
(band_idx, band_value), map-side combinable canonicalization, no
Cartesian) finds every such pair; bit_count(xor) verifies. Hot bands
(e.g. flat-color corpora) are the same skew problem as any LSH bucket
-- cap or salt with operators/candidates.py if a corpus needs it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
BAND_BITS = 16


def dhash64(img: np.ndarray) -> int:
    """(H, W, 3) uint8 -> 64-bit dHash as a signed int64 (bit 63 folded
    into the sign, the simhash convention)."""
    h, w = img.shape[:2]
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    cell = img[ys[:, None], xs[None, :], :].astype(np.int64)
    luma = (299 * cell[:, :, 0] + 587 * cell[:, :, 1]
            + 114 * cell[:, :, 2]) // 1000
    bits = (luma[:, 1:] > luma[:, :-1]).ravel()  # bit y*8+x, row-major
    val = 0
    for i in np.flatnonzero(bits):
        val += -(2**63) if i == 63 else (1 << int(i))
    return int(np.int64(val))


def dhash_images(images: DataFrame, id_col: str = "item_id",
                 data_col: str = "data") -> DataFrame:
    """(id, image bytes) -> (item_id, dhash long); decode + hash in one
    Arrow pass (any format multimodal.decode_image handles)."""
    import pandas as pd

    from .multimodal import decode_image

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "item_id": pdf[id_col],
                "dhash": [dhash64(decode_image(bytes(b)))
                          for b in pdf[data_col]],
            })

    return images.select(id_col, data_col).mapInPandas(
        gen, "item_id string, dhash long")


def dhash_bands(hashes: DataFrame) -> DataFrame:
    """(item_id, dhash) -> (item_id, dhash, band_idx, band_value): 4
    unsigned 16-bit slices (shiftrightunsigned so the sign bit lands in
    band 3 without smearing)."""
    bands = [
        F.struct(
            F.lit(i).alias("band_idx"),
            F.shiftrightunsigned(F.col("dhash"), i * BAND_BITS)
            .bitwiseAND(F.lit((1 << BAND_BITS) - 1)).alias("band_value"),
        )
        for i in range(N_BANDS)
    ]
    return (
        hashes.select("item_id", "dhash",
                      F.explode(F.array(*bands)).alias("b"))
        .select("item_id", "dhash", "b.band_idx", "b.band_value")
    )


def dhash_near_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All unordered pairs at Hamming <= max_hamming via band equi-join.

    Exact (no recall loss) for max_hamming <= N_BANDS - 1 by pigeonhole;
    asserts that contract rather than silently degrading."""
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"banded join guarantees Hamming <= {N_BANDS - 1}; "
            f"got max_hamming={max_hamming}")
    b = dhash_bands(hashes)
    left = b.select(F.col("item_id").alias("a"),
                    F.col("dhash").alias("ha"), "band_idx", "band_value")
    right = b.select(F.col("item_id").alias("b"),
                     F.col("dhash").alias("hb"), "band_idx", "band_value")
    return (
        left.join(right, ["band_idx", "band_value"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("a", "b").agg(F.min("hamming").alias("hamming"))
    )
