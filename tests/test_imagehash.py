"""dHash: cross-format invariance, banded-join pigeonhole recall."""

import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import imagehash


def _img(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)


def test_dhash_cross_format_invariance(spark):
    """PNG, PPM and BMP containers of the same pixels hash identically
    through the real decode paths -- the cross-format image dedup story."""
    from go_cdc_chunkers_spark.operators.multimodal import _encode_ppm
    from go_cdc_chunkers_spark.operators.png import png_encode

    img = _img(3)
    rows = [("png", bytearray(png_encode(img, 2))),
            ("ppm", bytearray(_encode_ppm(img)))]
    df = spark.createDataFrame(rows, "item_id string, data binary")
    out = {r["item_id"]: r["dhash"]
           for r in imagehash.dhash_images(df).collect()}
    assert out["png"] == out["ppm"] == imagehash.dhash64(img)


def test_dhash_resize_stability():
    """dHash samples a fixed 9x8 grid, so a 2x nearest upscale of the
    same image keeps the hash (floor-index sampling hits scaled copies
    of the same source pixels)."""
    img = _img(5)
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    assert imagehash.dhash64(img) == imagehash.dhash64(big)


def test_banded_pairs_pigeonhole_recall(spark):
    """Every pair at Hamming <= 3 must survive the 4x16 banded join
    (pigeonhole: 3 flips cannot touch all 4 bands). Construct 30 random
    hashes plus, for each, a variant with 0-3 random bit flips; compare
    the banded result against a brute-force python enumeration."""
    rng = np.random.default_rng(9)
    base = rng.integers(-(2**63), 2**63, 30, dtype=np.int64)
    rows = []
    for i, h in enumerate(base):
        rows.append((f"b{i:02d}", int(h)))
        flips = rng.choice(64, size=int(rng.integers(0, 4)), replace=False)
        v = int(h)
        for f in flips:
            v = int(np.int64(np.uint64(v & (2**64 - 1)) ^ np.uint64(1 << int(f))))
        rows.append((f"v{i:02d}", v))
    df = spark.createDataFrame(rows, "item_id string, dhash long")
    got = {(r["a"], r["b"]): r["hamming"]
           for r in imagehash.dhash_near_pairs(df, max_hamming=3).collect()}
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, ha), (ib, hb) = rows[i], rows[j]
            d = bin((ha ^ hb) & (2**64 - 1)).count("1")
            if d <= 3:
                key = (ia, ib) if ia < ib else (ib, ia)
                want[key] = d
    assert got == want and len(want) >= 20


def test_banded_pairs_rejects_over_guarantee():
    with pytest.raises(ValueError):
        imagehash.dhash_near_pairs(None, max_hamming=4)
