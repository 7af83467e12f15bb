"""PNG codec differential tests (no Spark needed).

Two independent certifications, mirroring the repo's cdc/naive.py
pattern: (1) a per-byte naive unfilter written straight from the spec
pseudocode (RFC 2083 section 6) checks the vectorized decoder on
hand-assembled PNGs that bypass png_encode entirely; (2) seeded
round-trips through png_encode exercise every color type x filter
combination. Error paths assert the honest-raise contract.
"""
import zlib

import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import png as P
from go_cdc_chunkers_spark.operators.multimodal import decode_image


# ---------------------------------------------------------------------------
# Naive reference: spec pseudocode, one byte at a time
# ---------------------------------------------------------------------------

def naive_unfilter(scan: bytes, h: int, stride: int, bpp: int) -> bytes:
    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        f = scan[pos]
        pos += 1
        for i in range(stride):
            x = scan[pos + i]
            a = out[y * stride + i - bpp] if i >= bpp else 0
            b = out[(y - 1) * stride + i] if y > 0 else 0
            c = out[(y - 1) * stride + i - bpp] if (y > 0 and i >= bpp) else 0
            if f == 0:
                r = x
            elif f == 1:
                r = x + a
            elif f == 2:
                r = x + b
            elif f == 3:
                r = x + (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r = x + pred
            else:
                raise ValueError(f)
            out[y * stride + i] = r & 0xFF
        pos += stride
    return bytes(out)


def hand_png(scanlines: bytes, w: int, h: int, ctype: int,
             palette: bytes | None = None) -> bytes:
    """Assemble a PNG from raw (filter-byte-prefixed) scanlines without
    going through png_encode -- keeps the decoder test independent."""
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 0])
    body = P._chunk(b"IHDR", ihdr)
    if palette is not None:
        body += P._chunk(b"PLTE", palette)
    body += P._chunk(b"IDAT", zlib.compress(scanlines))
    body += P._chunk(b"IEND", b"")
    return P._PNG_SIG + body


@pytest.mark.parametrize("ctype,nch", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_decode_matches_naive_unfilter(ctype, nch, filt):
    rng = np.random.default_rng(1000 + ctype * 10 + filt)
    w, h = 13, 9
    stride = w * nch
    scan = bytearray()
    for _ in range(h):
        scan.append(filt)
        scan += bytes(rng.integers(0, 256, stride, dtype=np.uint8))
    raw = hand_png(bytes(scan), w, h, ctype)
    got = P.png_pixels(raw)
    exp_flat = np.frombuffer(
        naive_unfilter(bytes(scan), h, stride, nch), dtype=np.uint8
    ).reshape(h, w, nch)
    if ctype == 0:
        assert (got[:, :, 0] == exp_flat[:, :, 0]).all()
        assert (got[:, :, 1] == exp_flat[:, :, 0]).all()
        assert (got[:, :, 3] == 255).all()
    elif ctype == 2:
        assert (got[:, :, :3] == exp_flat).all()
        assert (got[:, :, 3] == 255).all()
    elif ctype == 4:
        assert (got[:, :, 0] == exp_flat[:, :, 0]).all()
        assert (got[:, :, 3] == exp_flat[:, :, 1]).all()
    else:
        assert (got == exp_flat).all()


def test_decode_mixed_filters_matches_naive():
    rng = np.random.default_rng(77)
    w, h, nch = 21, 17, 3
    stride = w * nch
    scan = bytearray()
    for y in range(h):
        scan.append(int(rng.integers(0, 5)))
        scan += bytes(rng.integers(0, 256, stride, dtype=np.uint8))
    got = P.png_pixels(hand_png(bytes(scan), w, h, 2))
    exp = np.frombuffer(naive_unfilter(bytes(scan), h, stride, nch),
                        dtype=np.uint8).reshape(h, w, nch)
    assert (got[:, :, :3] == exp).all()


def test_palette_decode_matches_naive():
    rng = np.random.default_rng(5)
    w, h, npal = 11, 7, 16
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    # filter 0 rows only: filters 1-4 would reconstruct arbitrary bytes
    # that escape the palette (those filters are covered by the other
    # color types; palette round-trips cover them via png_encode).
    scan = bytearray()
    for _ in range(h):
        scan.append(0)
        scan += bytes(rng.integers(0, npal, w, dtype=np.uint8))
    got = P.png_pixels(hand_png(bytes(scan), w, h, 3, palette=pal.tobytes()))
    idx = np.frombuffer(naive_unfilter(bytes(scan), h, w, 1),
                        dtype=np.uint8).reshape(h, w)
    assert (got[:, :, :3] == pal[idx]).all()
    assert (got[:, :, 3] == 255).all()


@pytest.mark.parametrize("ctype", [0, 2, 3, 4, 6])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_roundtrip_all_types(ctype, mode):
    rng = np.random.default_rng(42 + ctype)
    w, h = 37, 23
    pal = None
    if ctype == 3:
        pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
        img = rng.integers(0, 32, (h, w), dtype=np.uint8)
    elif ctype == 0:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    else:
        nch = P._PNG_CHANNELS[ctype]
        img = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
    raw = P.png_encode(img, ctype, palette=pal, filter_mode=mode)
    got = P.png_pixels(raw)
    assert got.shape == (h, w, 4)
    if ctype == 0:
        assert (got[:, :, 0] == img).all() and (got[:, :, 3] == 255).all()
    elif ctype == 2:
        assert (got[:, :, :3] == img).all()
    elif ctype == 3:
        assert (got[:, :, :3] == pal[img]).all()
    elif ctype == 4:
        assert (got[:, :, 0] == img[:, :, 0]).all()
        assert (got[:, :, 3] == img[:, :, 1]).all()
    else:
        assert (got == img).all()


def test_decode_image_returns_rgb():
    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    rgb = decode_image(P.png_encode(img, 2))
    assert rgb.shape == (5, 4, 3)
    assert (rgb == img).all()


# ---------------------------------------------------------------------------
# Honest-raise contract
# ---------------------------------------------------------------------------

def _ihdr_png(depth=8, ctype=2, interlace=0, w=3, h=2):
    nch = P._PNG_CHANNELS.get(ctype, 3)
    scan = bytes([0] + [1] * (w * nch)) * h
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, ctype, 0, 0, interlace]))
    return (P._PNG_SIG + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(scan)) + P._chunk(b"IEND", b""))


def test_interlace_bad_byte_count_raises():
    # interlace=1 with a NON-interlaced scanline payload: the per-pass
    # byte accounting must catch it (w=3,h=2 progressive is 2*(1+9)=20
    # bytes; Adam7 wants 1 pass-1 + 1 pass-6 + 1 pass-7 row = 24).
    with pytest.raises(ValueError, match="interlaced scanline bytes"):
        P.png_pixels(_ihdr_png(interlace=1))


# ---------------------------------------------------------------------------
# Adam7 interlace
# ---------------------------------------------------------------------------

# Pass layout restated independently from the spec (section 8.2), NOT
# imported from the module under test.
_ADAM7_SPEC = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def hand_interlaced_png(img: np.ndarray, ctype: int) -> bytes:
    """Assemble an Adam7 PNG with per-pixel Python loops and filter-0
    rows only -- fully independent of png_encode's interlace path."""
    h, w = img.shape[0], img.shape[1]
    nch = P._PNG_CHANNELS[ctype]
    px = img.reshape(h, w, nch)
    rows = bytearray()
    for x0, y0, dx, dy in _ADAM7_SPEC:
        for y in range(y0, h, dy):
            line = bytearray([0])
            for x in range(x0, w, dx):
                for c in range(nch):
                    line.append(int(px[y, x, c]))
            if len(line) > 1:
                rows += line
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, ctype, 0, 0, 1]))
    return (P._PNG_SIG + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(bytes(rows)))
            + P._chunk(b"IEND", b""))


@pytest.mark.parametrize("ctype,nch", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (8, 8), (9, 10), (37, 23)])
def test_interlaced_decode_matches_hand_assembly(ctype, nch, w, h):
    rng = np.random.default_rng(7000 + ctype * 100 + w * 7 + h)
    img = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
    got = P.png_pixels(hand_interlaced_png(img, ctype))
    assert got.shape == (h, w, 4)
    if ctype == 0:
        assert (got[:, :, 0] == img[:, :, 0]).all()
    elif ctype == 2:
        assert (got[:, :, :3] == img).all()
    elif ctype == 4:
        assert (got[:, :, 0] == img[:, :, 0]).all()
        assert (got[:, :, 3] == img[:, :, 1]).all()
    else:
        assert (got == img).all()


@pytest.mark.parametrize("ctype", [0, 2, 3, 4, 6])
@pytest.mark.parametrize("w,h", [(3, 2), (16, 16), (37, 23)])
def test_interlaced_roundtrip_equals_progressive(ctype, w, h):
    rng = np.random.default_rng(9000 + ctype * 10 + w)
    pal = None
    if ctype == 3:
        pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
        img = rng.integers(0, 17, (h, w), dtype=np.uint8)
    elif ctype == 0:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    else:
        img = rng.integers(0, 256, (h, w, P._PNG_CHANNELS[ctype]),
                           dtype=np.uint8)
    inter = P.png_pixels(P.png_encode(img, ctype, palette=pal,
                                      filter_mode="cycle", interlace=True))
    prog = P.png_pixels(P.png_encode(img, ctype, palette=pal,
                                     filter_mode="cycle"))
    assert (inter == prog).all()


def test_illegal_depth_for_ctype_raises():
    # depth 16 is legal for RGB but NOT for palette (spec section 6.1)
    with pytest.raises(ValueError, match="illegal depth"):
        P.png_pixels(_ihdr_png(depth=16, ctype=3))
    with pytest.raises(ValueError, match="illegal depth"):
        P.png_pixels(_ihdr_png(depth=2, ctype=2))


# ---------------------------------------------------------------------------
# Non-8-bit depths + tRNS (hand-assembled; decoder-independent packing)
# ---------------------------------------------------------------------------

def _hand_png_depth(samples, w, h, ctype, depth, palette=None, trns=None,
                    filters=None):
    """Assemble a PNG at arbitrary depth with per-sample Python packing
    (MSB-first within bytes, big-endian 16-bit), filter chosen per row."""
    nch = P._PNG_CHANNELS[ctype]
    rows = bytearray()
    prev_recon = None
    for y in range(h):
        # pack one reconstructed row
        if depth == 16:
            packed = bytearray()
            for v in samples[y]:
                packed += int(v).to_bytes(2, "big")
        elif depth == 8:
            packed = bytearray(int(v) for v in samples[y])
        else:
            packed = bytearray()
            acc, nbits = 0, 0
            for v in samples[y]:
                acc = (acc << depth) | int(v)
                nbits += depth
                if nbits == 8:
                    packed.append(acc)
                    acc, nbits = 0, 0
            if nbits:
                packed.append(acc << (8 - nbits))
        f = filters[y] if filters else 0
        bpp = max(1, nch * depth // 8)
        if f == 0:
            filt = bytes(packed)
        elif f == 1:  # Sub over bytes
            filt = bytes((packed[i] - (packed[i - bpp] if i >= bpp else 0))
                         % 256 for i in range(len(packed)))
        elif f == 2:  # Up over bytes
            filt = bytes((packed[i] - (prev_recon[i] if prev_recon else 0))
                         % 256 for i in range(len(packed)))
        else:
            raise AssertionError("test helper: filters 0/1/2 only")
        rows.append(f)
        rows += filt
        prev_recon = packed
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, ctype, 0, 0, 0]))
    body = P._chunk(b"IHDR", ihdr)
    if palette is not None:
        body += P._chunk(b"PLTE", bytes(palette))
    if trns is not None:
        body += P._chunk(b"tRNS", bytes(trns))
    body += (P._chunk(b"IDAT", zlib.compress(bytes(rows)))
             + P._chunk(b"IEND", b""))
    return P._PNG_SIG + body


@pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
def test_subbyte_gray_decode(depth, scale):
    rng = np.random.default_rng(depth)
    w, h = 11, 5  # w*depth not a multiple of 8 -> row padding exercised
    img = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
    raw = _hand_png_depth(img, w, h, ctype=0, depth=depth,
                          filters=[y % 3 for y in range(h)])
    got = P.png_pixels(raw)
    assert (got[:, :, 0] == img * scale).all()
    assert (got[:, :, 1] == img * scale).all()
    assert (got[:, :, 3] == 255).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_decode(depth):
    rng = np.random.default_rng(40 + depth)
    n = 1 << depth
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    w, h = 13, 4
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    raw = _hand_png_depth(idx, w, h, ctype=3, depth=depth,
                          palette=pal.tobytes())
    got = P.png_pixels(raw)
    assert (got[:, :, :3] == pal[idx]).all()


@pytest.mark.parametrize("ctype,nch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_depth16_decode_takes_high_byte(ctype, nch):
    rng = np.random.default_rng(1600 + ctype)
    w, h = 7, 4
    samples = rng.integers(0, 1 << 16, (h, w * nch), dtype=np.uint16)
    raw = _hand_png_depth(samples, w, h, ctype=ctype, depth=16,
                          filters=[y % 3 for y in range(h)])
    got = P.png_pixels(raw)
    hi = (samples >> 8).astype(np.uint8).reshape(h, w, nch)
    if ctype == 0:
        assert (got[:, :, 0] == hi[:, :, 0]).all()
    elif ctype == 2:
        assert (got[:, :, :3] == hi).all()
    elif ctype == 4:
        assert (got[:, :, 0] == hi[:, :, 0]).all()
        assert (got[:, :, 3] == hi[:, :, 1]).all()
    else:
        assert (got == hi).all()


def test_trns_palette_alpha_roundtrip():
    rng = np.random.default_rng(77)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    alpha = rng.integers(0, 256, 10, dtype=np.uint8)  # shorter than palette
    idx = rng.integers(0, 16, (6, 9), dtype=np.uint8)
    got = P.png_pixels(P.png_encode(idx, 3, palette=pal, trns=alpha))
    pal_a = np.concatenate([alpha, np.full(6, 255, np.uint8)])
    assert (got[:, :, :3] == pal[idx]).all()
    assert (got[:, :, 3] == pal_a[idx]).all()


def test_trns_gray_color_key():
    img = np.array([[3, 7, 3], [7, 3, 7]], dtype=np.uint8)
    raw = _hand_png_depth(img, 3, 2, ctype=0, depth=4, trns=b"\x00\x03")
    got = P.png_pixels(raw)
    assert (got[:, :, 3] == np.where(img == 3, 0, 255)).all()


def test_trns_rgb_color_key():
    rng = np.random.default_rng(5)
    w, h = 5, 3
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    px[1, 2] = px[0, 0]  # duplicate the key pixel
    key = px[0, 0]
    trns = b"".join(int(v).to_bytes(2, "big") for v in key)
    raw = _hand_png_depth(px.reshape(h, w * 3), w, h, ctype=2, depth=8,
                          trns=trns)
    got = P.png_pixels(raw)
    expect_a = np.where((px == key).all(axis=2), 0, 255)
    assert (got[:, :, 3] == expect_a).all()


def test_interlaced_subbyte_gray_decode():
    # Adam7 x depth-4: each pass packs ITS OWN rows to a byte boundary.
    rng = np.random.default_rng(47)
    w, h = 13, 11
    img = rng.integers(0, 16, (h, w), dtype=np.uint8)
    rows = bytearray()
    for x0, y0, dx, dy in _ADAM7_SPEC:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            rows.append(0)
            acc, nbits = 0, 0
            for v in sub[y]:
                acc = (acc << 4) | int(v)
                nbits += 4
                if nbits == 8:
                    rows.append(acc)
                    acc, nbits = 0, 0
            if nbits:
                rows.append(acc << 4)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([4, 0, 0, 0, 1]))
    raw = (P._PNG_SIG + P._chunk(b"IHDR", ihdr)
           + P._chunk(b"IDAT", zlib.compress(bytes(rows)))
           + P._chunk(b"IEND", b""))
    got = P.png_pixels(raw)
    assert (got[:, :, 0] == img * 17).all()


def test_trns_on_alpha_ctype_raises():
    raw = P.png_encode(np.zeros((2, 3, 4), dtype=np.uint8), 6)
    iend = P._chunk(b"IEND", b"")
    spliced = raw[: -len(iend)] + P._chunk(b"tRNS", b"\x00") + iend
    with pytest.raises(ValueError, match="tRNS"):
        P.png_pixels(spliced)


def test_crc_corruption_raises():
    raw = bytearray(P.png_encode(np.zeros((2, 3, 3), dtype=np.uint8), 2))
    idat = raw.find(b"IDAT")
    raw[idat + 6] ^= 0xFF  # flip a data byte, CRC now stale
    with pytest.raises(ValueError, match="CRC"):
        P.png_pixels(bytes(raw))


def test_truncated_raises():
    raw = P.png_encode(np.zeros((4, 4, 3), dtype=np.uint8), 2)
    with pytest.raises(ValueError):
        P.png_pixels(raw[: len(raw) - 20])


def test_palette_index_out_of_range_raises():
    pal = np.zeros((2, 3), dtype=np.uint8)
    scan = bytes([0, 0, 1, 3])  # index 3 >= palette size 2
    raw = hand_png(scan, 3, 1, 3, palette=pal.tobytes())
    with pytest.raises(ValueError, match="palette index"):
        P.png_pixels(raw)


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        P.png_pixels(b"JFIF....")
