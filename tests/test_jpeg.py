"""Baseline JPEG codec tests (no Spark).

Certification layers (mirroring test_png.py / cdc/naive.py):
  1. ENTROPY EXACTNESS: Huffman coding is lossless, so
     jpeg_coeffs(jpeg_encode_coeffs(C)) == C must hold bit-exactly for
     arbitrary coefficient patterns, across grayscale / 4:4:4 / 4:2:0
     and with restart markers. Any bitstream, table-build, zigzag, DC
     prediction or run-length bug breaks this equality.
  2. IDCT DIFFERENTIAL: the vectorized matmul IDCT vs a naive per-pixel
     double loop written straight from the T.81 formula.
  3. LOSSY SANITY: pixel-level encode -> decode round-trips hit a PSNR
     floor at reasonable quality.
  4. Honest raises for progressive / 12-bit / exotic sampling /
     malformed structure.
"""
import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import jpeg as J
from go_cdc_chunkers_spark.operators.multimodal import decode_image


def naive_idct(coef8x8: np.ndarray) -> np.ndarray:
    """T.81 A.3.3, one pixel at a time."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv / 4.0 * coef8x8[u, v]
                          * np.cos((2 * y + 1) * u * np.pi / 16)
                          * np.cos((2 * x + 1) * v * np.pi / 16))
            out[y, x] = s
    return out


def test_idct_matches_naive():
    rng = np.random.default_rng(3)
    for _ in range(5):
        c = rng.integers(-500, 500, (8, 8)).astype(np.float64)
        fast = (c.reshape(1, 64) @ J._BASIS).reshape(8, 8)
        assert np.allclose(fast, naive_idct(c), atol=1e-9)


def _rand_blocks(rng, by, bx, density=0.15, amp=60):
    """Sparse-ish quantized coefficient blocks (natural order), DC in a
    realistic range."""
    blk = np.zeros((by, bx, 64), np.int32)
    mask = rng.random((by, bx, 64)) < density
    blk[mask] = rng.integers(-amp, amp + 1, int(mask.sum()))
    blk[:, :, 0] = rng.integers(-200, 200, (by, bx))
    return blk


def _gray_spec(rng, by, bx, **kw):
    qt = np.clip(rng.integers(1, 40, 64), 1, 255).astype(np.int64)
    return [{"id": 1, "hs": 1, "vs": 1, "qt": qt,
             "blocks": _rand_blocks(rng, by, bx, **kw)}]


def _color_specs(rng, by, bx, subsampled=False):
    qty = np.clip(rng.integers(1, 40, 64), 1, 255).astype(np.int64)
    qtc = np.clip(rng.integers(1, 60, 64), 1, 255).astype(np.int64)
    if subsampled:
        return [
            {"id": 1, "hs": 2, "vs": 2, "qt": qty,
             "blocks": _rand_blocks(rng, by * 2, bx * 2)},
            {"id": 2, "hs": 1, "vs": 1, "qt": qtc,
             "blocks": _rand_blocks(rng, by, bx)},
            {"id": 3, "hs": 1, "vs": 1, "qt": qtc,
             "blocks": _rand_blocks(rng, by, bx)},
        ]
    return [{"id": i + 1, "hs": 1, "vs": 1, "qt": qty if i == 0 else qtc,
             "blocks": _rand_blocks(rng, by, bx)} for i in range(3)]


def _assert_coeffs_equal(got, specs):
    assert len(got) == len(specs)
    for g, s in zip(got, specs):
        assert np.array_equal(g["qt"], np.asarray(s["qt"], np.int32).ravel())
        assert np.array_equal(g["blocks"], s["blocks"])


def test_entropy_roundtrip_gray():
    rng = np.random.default_rng(11)
    specs = _gray_spec(rng, 4, 5)
    raw = J.jpeg_encode_coeffs(specs, 4 * 8, 5 * 8)
    got, h, w = J.jpeg_coeffs(raw)
    assert (h, w) == (32, 40)
    _assert_coeffs_equal(got, specs)


def test_entropy_roundtrip_dense_blocks():
    # dense high-amplitude blocks exercise long Huffman codes, ZRL-free
    # paths, and the no-EOB case (last AC occupied)
    rng = np.random.default_rng(12)
    specs = _gray_spec(rng, 3, 3, density=0.95, amp=900)
    specs[0]["blocks"][0, 0, 63] = 5  # force a no-EOB block
    raw = J.jpeg_encode_coeffs(specs, 24, 24)
    got, _, _ = J.jpeg_coeffs(raw)
    _assert_coeffs_equal(got, specs)


def test_entropy_roundtrip_sparse_zrl():
    # nearly-empty blocks exercise EOB-heavy and ZRL (16-zero-run) paths
    rng = np.random.default_rng(13)
    specs = _gray_spec(rng, 3, 4, density=0.02, amp=10)
    b = specs[0]["blocks"]
    b[1, 1] = 0
    b[1, 1][0] = 7
    b[1, 1][J.ZIGZAG[40]] = -3  # one coefficient after a >16 zero run
    raw = J.jpeg_encode_coeffs(specs, 24, 32)
    got, _, _ = J.jpeg_coeffs(raw)
    _assert_coeffs_equal(got, specs)


def test_entropy_roundtrip_color_444():
    rng = np.random.default_rng(14)
    specs = _color_specs(rng, 3, 4)
    raw = J.jpeg_encode_coeffs(specs, 24, 32)
    got, _, _ = J.jpeg_coeffs(raw)
    _assert_coeffs_equal(got, specs)


def test_entropy_roundtrip_color_420():
    rng = np.random.default_rng(15)
    specs = _color_specs(rng, 2, 3, subsampled=True)
    raw = J.jpeg_encode_coeffs(specs, 2 * 16, 3 * 16)
    got, _, _ = J.jpeg_coeffs(raw)
    _assert_coeffs_equal(got, specs)


def test_entropy_roundtrip_with_restart_markers():
    rng = np.random.default_rng(16)
    specs = _gray_spec(rng, 4, 6)
    raw = J.jpeg_encode_coeffs(specs, 32, 48, restart_interval=5)
    assert any(raw[i] == 0xFF and 0xD0 <= raw[i + 1] <= 0xD7
               for i in range(len(raw) - 1)), "no RST emitted"
    got, _, _ = J.jpeg_coeffs(raw)
    _assert_coeffs_equal(got, specs)


def test_pixels_gray_matches_reference_math():
    rng = np.random.default_rng(17)
    specs = _gray_spec(rng, 2, 2)
    raw = J.jpeg_encode_coeffs(specs, 16, 16)
    got = J.jpeg_pixels(raw)
    qt = np.asarray(specs[0]["qt"], np.float64)
    exp = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            c = (specs[0]["blocks"][by, bx] * qt).reshape(8, 8)
            exp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = naive_idct(c) + 128
    exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], exp)
    assert np.array_equal(got[:, :, 1], exp)


def test_non_multiple_of_8_crops():
    rng = np.random.default_rng(18)
    specs = _gray_spec(rng, 2, 2)
    raw = J.jpeg_encode_coeffs(specs, 13, 11)
    assert J.jpeg_pixels(raw).shape == (13, 11, 3)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 * 255 / max(mse, 1e-12))


def test_lossy_roundtrip_psnr():
    rng = np.random.default_rng(19)
    # smooth-ish image: random low-frequency mixture
    y, x = np.mgrid[0:48, 0:64]
    img = (128 + 60 * np.sin(x / 9.0) * np.cos(y / 7.0)
           + 30 * np.sin((x + 2 * y) / 15.0)
           + rng.normal(0, 4, (48, 64))).clip(0, 255).astype(np.uint8)
    out = J.jpeg_pixels(J.jpeg_encode(img, quality=90))
    assert psnr(img, out[:, :, 0]) >= 30.0
    rgb = np.stack([img, np.roll(img, 3, 1), 255 - img], axis=-1)
    out3 = J.jpeg_pixels(J.jpeg_encode(rgb, quality=90))
    assert psnr(rgb, out3) >= 28.0


def test_decode_image_dispatches_jpeg():
    rng = np.random.default_rng(20)
    specs = _gray_spec(rng, 2, 2)
    raw = J.jpeg_encode_coeffs(specs, 16, 16)
    assert raw[:2] == b"\xff\xd8"
    assert decode_image(raw).shape == (16, 16, 3)


def test_driver_images_rounding_margin():
    """The image_jpeg_decode oracle re-derives pixels with DuckDB's own
    cos()/SUM, so the two engines' doubles differ by ~1e-12. The driver
    hash-compares ROUNDED integers, which is only stable if no pre-round
    value sits near a rounding boundary. Pin that margin >= 1e-6 for the
    exact driver images (deterministic closed-form coefficients), ~1e9x
    the cross-engine noise; also covers np.round half-even vs SQL
    half-away divergence (only differ exactly AT .5)."""
    from go_cdc_chunkers_spark import entry_queries as EQ

    vals = []
    # grayscale: raw plane values pre-round
    comps = [{"id": 1, "hs": 1, "vs": 1, "qt": EQ._jpeg_qt(0),
              "blocks": EQ._jpeg_blocks(3, 5, 0)}]
    raw = J.jpeg_encode_coeffs(comps, 21, 35, restart_interval=4)
    got, h, w = J.jpeg_coeffs(raw)
    deq = got[0]["blocks"].astype(np.float64) * got[0]["qt"][None, None, :]
    px = (deq.reshape(-1, 64) @ J._BASIS + 128.0).reshape(3, 5, 8, 8)
    vals.append(px.transpose(0, 2, 1, 3).reshape(24, 40)[:21, :35].ravel())
    # 4:2:0 color (baseline salts 1/2/3, progressive salts 4/5/6):
    # pre-round RGB after JFIF conversion
    for salts, prog in (((1, 2, 3), False), ((4, 5, 6), True)):
        raw = J.jpeg_encode_coeffs([
            {"id": 1, "hs": 2, "vs": 2, "qt": EQ._jpeg_qt(0),
             "blocks": EQ._jpeg_blocks(4, 6, salts[0])},
            {"id": 2, "hs": 1, "vs": 1, "qt": EQ._jpeg_qt(1),
             "blocks": EQ._jpeg_blocks(2, 3, salts[1])},
            {"id": 3, "hs": 1, "vs": 1, "qt": EQ._jpeg_qt(1),
             "blocks": EQ._jpeg_blocks(2, 3, salts[2])},
        ], 28, 44, progressive=prog)
        comps2, h2, w2 = J.jpeg_coeffs(raw)
        planes = []
        for c in comps2:
            d = c["blocks"].astype(np.float64) * c["qt"][None, None, :]
            by, bx = d.shape[:2]
            p = ((d.reshape(-1, 64) @ J._BASIS + 128.0)
                 .reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by * 8, bx * 8))
            if c["hs"] == 1 and len(comps2) == 3 and c is not comps2[0]:
                p = p.repeat(2, axis=0).repeat(2, axis=1)
            planes.append(p[:28, :44])
        y, cb, cr = planes
        vals.append((y + 1.402 * (cr - 128.0)).ravel())
        vals.append((y - (0.114 * 1.772 / 0.587) * (cb - 128.0)
                     - (0.299 * 1.402 / 0.587) * (cr - 128.0)).ravel())
        vals.append((y + 1.772 * (cb - 128.0)).ravel())
    v = np.concatenate(vals)
    # only HARMFUL boundaries: interior .5s (0.5..254.5). The -0.5 and
    # 255.5 edges are clip-equalized in both engines (round then clip).
    v = v[(v > 0.0) & (v < 255.0)]
    frac = np.abs(v - np.floor(v) - 0.5)
    assert frac.min() >= 1e-6, f"rounding margin too small: {frac.min()}"


# ---------------------------------------------------------------------------
# Honest-raise contract
# ---------------------------------------------------------------------------

def _valid_gray_jpeg():
    rng = np.random.default_rng(21)
    return J.jpeg_encode_coeffs(_gray_spec(rng, 1, 1), 8, 8)


def test_lossless_sof_raises():
    raw = bytearray(_valid_gray_jpeg())
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC3  # SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="SOF"):
        J.jpeg_coeffs(bytes(raw))


def test_sof2_with_full_band_scan_raises():
    # flipping a baseline stream's marker to SOF2 makes its 0..63 scan an
    # (illegal) progressive scan mixing DC and AC
    raw = bytearray(_valid_gray_jpeg())
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        J.jpeg_coeffs(bytes(raw))


# ---------------------------------------------------------------------------
# Progressive (SOF2): encode/decode round-trips must match baseline
# coefficient-for-coefficient on the non-padded block rasters
# ---------------------------------------------------------------------------

def _assert_prog_equals_baseline(specs, h, w):
    base = J.jpeg_encode_coeffs([dict(c) for c in specs], h, w)
    prog = J.jpeg_encode_coeffs([dict(c) for c in specs], h, w,
                                progressive=True)
    db, hb, wb = J.jpeg_coeffs(base)
    dp, hp, wp = J.jpeg_coeffs(prog)
    assert (hb, wb) == (hp, wp) == (h, w)
    for cb, cp in zip(db, dp):
        nby, nbx = cp["nby"], cp["nbx"]
        assert np.array_equal(cb["blocks"][:nby, :nbx],
                              cp["blocks"][:nby, :nbx])


def test_progressive_roundtrip_gray():
    rng = np.random.default_rng(1)
    _assert_prog_equals_baseline(_gray_spec(rng, 5, 7), 37, 51)


def test_progressive_roundtrip_color_444():
    rng = np.random.default_rng(2)
    _assert_prog_equals_baseline(_color_specs(rng, 4, 5), 29, 38)


def test_progressive_roundtrip_color_420():
    rng = np.random.default_rng(3)
    _assert_prog_equals_baseline(_color_specs(rng, 3, 4, subsampled=True),
                                 41, 55)


def test_progressive_all_zero_long_eob_runs():
    qt = np.full(64, 9, np.int64)
    specs = [{"id": 1, "hs": 1, "vs": 1, "qt": qt,
              "blocks": np.zeros((16, 16, 64), np.int32)}]
    _assert_prog_equals_baseline(specs, 128, 128)


def test_progressive_large_magnitudes_all_layers():
    # values up to +-30000 force newly-nonzero symbols at Al=2 and
    # correction bits at both refinement layers
    rng = np.random.default_rng(4)
    qt = np.full(64, 3, np.int64)
    blocks = rng.integers(-30000, 30001, (6, 5, 64)).astype(np.int32)
    specs = [{"id": 1, "hs": 1, "vs": 1, "qt": qt, "blocks": blocks}]
    _assert_prog_equals_baseline(specs, 48, 40)


def test_progressive_zrl_inside_refinement():
    # a lone +-1 at the band's end with a >16 zero-history run before it,
    # plus a nonzero-history coefficient inside the run: exercises the
    # ZRL + buffered-correction-bit path of the refinement coder
    qt = np.full(64, 5, np.int64)
    blocks = np.zeros((5, 5, 64), np.int32)
    blocks[:, :, J.ZIGZAG[63]] = 1
    blocks[:, :, J.ZIGZAG[30]] = 4
    specs = [{"id": 1, "hs": 1, "vs": 1, "qt": qt, "blocks": blocks}]
    _assert_prog_equals_baseline(specs, 40, 40)


def test_progressive_magnitude_one_only():
    # coefficients that first appear in the LAST refinement layer
    rng = np.random.default_rng(5)
    qt = np.full(64, 11, np.int64)
    blocks = np.zeros((4, 6, 64), np.int32)
    mask = rng.random((4, 6, 64)) < 0.03
    blocks[mask] = rng.choice([-1, 1], int(mask.sum()))
    specs = [{"id": 1, "hs": 1, "vs": 1, "qt": qt, "blocks": blocks}]
    _assert_prog_equals_baseline(specs, 32, 48)


def test_progressive_pixels_match_baseline():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (45, 61, 3), dtype=np.uint8)
    pb = J.jpeg_pixels(J.jpeg_encode(img, 90))
    pp = J.jpeg_pixels(J.jpeg_encode(img, 90, progressive=True))
    assert np.array_equal(pb, pp)


def test_progressive_decode_image_dispatches():
    from go_cdc_chunkers_spark.operators.multimodal import decode_image
    img = np.arange(16 * 24, dtype=np.uint8).reshape(16, 24) % 251
    raw = J.jpeg_encode(img, 95, progressive=True)
    assert raw[:4] != b"\xff\xd8\xff\xc0"
    rgb = decode_image(raw)
    assert rgb.shape == (16, 24, 3)


def test_12bit_precision_raises():
    raw = bytearray(_valid_gray_jpeg())
    i = raw.find(b"\xff\xc0")
    raw[i + 4] = 12  # precision byte (after marker + 2-byte length)
    with pytest.raises(NotImplementedError, match="precision"):
        J.jpeg_coeffs(bytes(raw))


def test_bad_soi_raises():
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_coeffs(b"\x89PNG\r\n\x1a\n")


def test_truncated_entropy_raises():
    raw = _valid_gray_jpeg()
    with pytest.raises(ValueError):
        J.jpeg_pixels(raw[:-4])


def test_exotic_sampling_raises():
    rng = np.random.default_rng(22)
    specs = _color_specs(rng, 2, 2)
    specs[0]["hs"], specs[0]["vs"] = 2, 1  # 4:2:2 luma
    specs[0]["blocks"] = _rand_blocks(rng, 2, 4)
    raw = J.jpeg_encode_coeffs(specs, 16, 32)
    with pytest.raises(NotImplementedError, match="sampling"):
        J.jpeg_coeffs(raw)


def test_quant_range_enforced():
    rng = np.random.default_rng(23)
    specs = _gray_spec(rng, 1, 1)
    specs[0]["qt"] = np.zeros(64, np.int64)
    with pytest.raises(ValueError, match="quant"):
        J.jpeg_encode_coeffs(specs, 8, 8)
