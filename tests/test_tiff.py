"""Baseline TIFF codec differential tests (no Spark needed).

Certification layers, mirroring test_png.py: (1) a naive per-spec
PackBits decoder checks the production one on encoder output and on
hand-crafted streams; (2) seeded round-trips through tiff_encode cover
both byte orders x strip splits x PackBits x gray/RGB/RGBA/palette;
(3) hand-assembled TIFFs (bypassing tiff_encode) certify the
WhiteIsZero inversion and sub-byte bit unpacking against per-pixel
naive expansion. Error paths assert the honest-raise contract.
"""
import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import tiff as T
from go_cdc_chunkers_spark.operators.multimodal import decode_image


# ---------------------------------------------------------------------------
# PackBits: naive spec decoder + crafted streams
# ---------------------------------------------------------------------------

def naive_packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out)


@pytest.mark.parametrize("seed", range(5))
def test_packbits_roundtrip_matches_naive(seed):
    rng = np.random.default_rng(seed)
    # mix of runs and noise so both branch kinds appear
    parts = []
    for _ in range(30):
        if rng.random() < 0.5:
            parts.append(bytes([int(rng.integers(0, 256))])
                         * int(rng.integers(1, 200)))
        else:
            parts.append(bytes(rng.integers(0, 256,
                                            int(rng.integers(1, 50)),
                                            dtype=np.uint8)))
    row = b"".join(parts)
    enc = T._packbits_encode(row)
    assert naive_packbits(enc) == row
    assert T._packbits_decode(enc, len(row)) == row


def test_packbits_noop_128_and_crafted():
    # hand-crafted: literal(3 bytes) + noop + repeat 'Z' x4 + literal(1)
    enc = bytes([2]) + b"abc" + bytes([128]) + bytes([253]) + b"Z" \
        + bytes([0]) + b"q"
    expect = b"abc" + b"ZZZZ" + b"q"
    assert naive_packbits(enc) == expect
    assert T._packbits_decode(enc, len(expect)) == expect


# ---------------------------------------------------------------------------
# Round-trips through tiff_encode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bo", ["little", "big"])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("rps", [0, 1, 5])
def test_gray_rgb_rgba_roundtrip(bo, packbits, rps):
    rng = np.random.default_rng(hash((bo, packbits, rps)) % 2**32)
    for shape in [(11, 14), (11, 14, 3), (11, 14, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        raw = T.tiff_encode(img, byteorder=bo, packbits=packbits,
                            rows_per_strip=rps)
        got = T.tiff_pixels(raw)
        assert got.shape == img.shape
        assert (got == img).all()


def test_palette_roundtrip():
    rng = np.random.default_rng(77)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    got = T.tiff_pixels(T.tiff_encode(idx, palette=pal))
    assert got.shape == (9, 13, 3)
    assert (got == pal[idx]).all()


# ---------------------------------------------------------------------------
# Hand-assembled TIFFs (bypass the encoder)
# ---------------------------------------------------------------------------

def hand_tiff(strip: bytes, w: int, h: int, bits: int, photo: int,
              spp: int = 1) -> bytes:
    """Minimal little-endian single-strip TIFF assembled by hand."""
    def n2(v):
        return int(v).to_bytes(2, "little")

    def n4(v):
        return int(v).to_bytes(4, "little")

    strip_off = 8
    ifd_off = strip_off + len(strip)
    entries = [
        (256, 4, 1, n4(w)), (257, 4, 1, n4(h)),
        (258, 3, 1, n2(bits) + b"\x00\x00"),
        (259, 3, 1, n2(1) + b"\x00\x00"),
        (262, 3, 1, n2(photo) + b"\x00\x00"),
        (273, 4, 1, n4(strip_off)),
        (277, 3, 1, n2(spp) + b"\x00\x00"),
        (278, 4, 1, n4(h)),
        (279, 4, 1, n4(len(strip))),
    ]
    ifd = n2(len(entries))
    for tag, typ, cnt, val in entries:
        ifd += n2(tag) + n2(typ) + n4(cnt) + val
    ifd += n4(0)
    return b"II*\x00" + n4(ifd_off) + strip + ifd


def test_white_is_zero_inversion():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (7, 9), dtype=np.uint8)
    raw = hand_tiff(img.tobytes(), 9, 7, 8, photo=0)
    assert (T.tiff_pixels(raw) == 255 - img).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("photo", [0, 1])
def test_sub_byte_depths_match_naive(depth, photo):
    """Pack pixel values MSB-first at 1/2/4 bits per sample by hand and
    compare the vectorized unpack + range expansion against a per-pixel
    naive derivation."""
    rng = np.random.default_rng(depth * 10 + photo)
    w, h = 13, 6  # w chosen so rows need padding bits
    maxv = (1 << depth) - 1
    vals = rng.integers(0, maxv + 1, (h, w), dtype=np.uint8)
    strip = bytearray()
    for y in range(h):
        acc = nb = 0
        row = bytearray()
        for x in range(w):
            acc = (acc << depth) | int(vals[y, x])
            nb += depth
            if nb == 8:
                row.append(acc)
                acc = nb = 0
        if nb:
            row.append(acc << (8 - nb))
        strip += row
    raw = hand_tiff(bytes(strip), w, h, depth, photo=photo)
    got = T.tiff_pixels(raw)
    expect = (vals.astype(np.uint32) * 255 // maxv).astype(np.uint8)
    if photo == 0:
        expect = 255 - expect
    assert (got == expect).all()


# ---------------------------------------------------------------------------
# Honest raises + wiring
# ---------------------------------------------------------------------------

def test_error_paths():
    img = np.zeros((4, 4), np.uint8)
    raw = T.tiff_encode(img)
    with pytest.raises(ValueError):
        T.tiff_pixels(b"XXXX" + raw[4:])
    with pytest.raises(ValueError):
        T.tiff_pixels(raw[:6])  # IFD offset beyond the buffer
    # compression 7 (TIFF-JPEG) stays honestly unimplemented; a file
    # CLAIMING LZW whose strips aren't a valid LZW stream is malformed
    for comp, exc in ((7, NotImplementedError), (5, ValueError)):
        bad = bytearray(raw)
        pos = bad.find((259).to_bytes(2, "little")
                       + (3).to_bytes(2, "little"))
        assert pos > 0
        bad[pos + 8:pos + 10] = (comp).to_bytes(2, "little")
        with pytest.raises(exc):
            T.tiff_pixels(bytes(bad))
    # planar configuration 2
    pl = bytearray(T.tiff_encode(np.zeros((4, 4, 3), np.uint8)))
    # append is hard; instead patch SamplesPerPixel path via tag 284 absent
    # -> use a hand TIFF with planar tag
    def n2(v):
        return int(v).to_bytes(2, "little")

    def n4(v):
        return int(v).to_bytes(4, "little")
    strip = bytes(16)
    entries = [
        (256, 4, 1, n4(4)), (257, 4, 1, n4(4)),
        (258, 3, 1, n2(8) + b"\x00\x00"),
        (262, 3, 1, n2(1) + b"\x00\x00"),
        (273, 4, 1, n4(8)), (279, 4, 1, n4(16)),
        (284, 3, 1, n2(2) + b"\x00\x00"),
    ]
    ifd = n2(len(entries))
    for tag, typ, cnt, val in entries:
        ifd += n2(tag) + n2(typ) + n4(cnt) + val
    ifd += n4(0)
    planar = b"II*\x00" + n4(8 + 16) + strip + ifd
    with pytest.raises(NotImplementedError):
        T.tiff_pixels(planar)
    del pl


def test_decode_image_wiring():
    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, (8, 10), dtype=np.uint8)
    out = decode_image(T.tiff_encode(g, byteorder="big", packbits=True))
    assert out.shape == (8, 10, 3)
    assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()
    rgba = rng.integers(0, 256, (8, 10, 4), dtype=np.uint8)
    out = decode_image(T.tiff_encode(rgba))
    assert out.shape == (8, 10, 3)
    assert (out == rgba[:, :, :3]).all()


# ---------------------------------------------------------------------------
# LZW (Compression 5): naive spec-pseudocode decoder as the independent
# certification layer (the test_gif.py pattern), then full-file
# round-trips incl. the horizontal-differencing predictor
# ---------------------------------------------------------------------------

def naive_tiff_lzw(data: bytes) -> tuple[bytes, int]:
    """TIFF 6.0 LZW decoder straight from the spec's pseudocode:
    byte-string table (no chain arrays), MSB-first reader, EARLY-CHANGE
    width rule. Returns (decoded, number of mid-stream Clear codes)."""
    table: list[bytes] = []

    def init():
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 clear
        table.append(b"")  # 257 eoi

    init()
    width = 9
    acc = nbits = 0
    out = bytearray()
    prev: bytes | None = None
    clears = -1  # the leading clear is mandatory, don't count it
    for b in data:
        acc = (acc << 8) | b
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == 256:
                init()
                width = 9
                prev = None
                clears += 1
                continue
            if code == 257:
                return bytes(out), clears
            if prev is None:
                s = table[code]
            elif code < len(table):
                s = table[code]
                table.append(prev + s[:1])
            elif code == len(table):
                s = prev + prev[:1]
                table.append(s)
            else:
                raise ValueError("naive: bad code")
            out += s
            prev = s
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    raise ValueError("naive: no EOI")


@pytest.mark.parametrize("seed", range(4))
def test_tiff_lzw_roundtrip_matches_naive(seed):
    rng = np.random.default_rng(seed)
    # mixed-entropy payload: random + runs + repeated motifs, large
    # enough to force width 9 -> 10 -> 11 transitions
    parts = [rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(),
             bytes([seed % 256]) * 2000,
             rng.integers(0, 4, 4000, dtype=np.uint8).tobytes()]
    payload = b"".join(parts)
    enc = T._lzw_encode_tiff(payload)
    got, _ = naive_tiff_lzw(enc)
    assert got == payload
    assert T._lzw_decode_tiff(enc, len(payload)) == payload


def test_tiff_lzw_table_reset_at_4094():
    """A high-entropy payload long enough to fill the table forces the
    spec's Clear-at-4094 reset; both decoders must track it."""
    rng = np.random.default_rng(99)
    payload = rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
    enc = T._lzw_encode_tiff(payload)
    got, clears = naive_tiff_lzw(enc)
    assert got == payload
    assert clears >= 1  # the table really did fill and reset
    assert T._lzw_decode_tiff(enc, len(payload)) == payload


def test_tiff_lzw_kwkwk():
    # 'aaaa...' is the classic KwKwK trigger right after the table seeds
    for payload in (b"a" * 50, b"ababababab" * 9, b"\x00" * 3):
        enc = T._lzw_encode_tiff(payload)
        assert naive_tiff_lzw(enc)[0] == payload
        assert T._lzw_decode_tiff(enc, len(payload)) == payload


def test_tiff_lzw_error_paths():
    enc = T._lzw_encode_tiff(b"hello world, hello lzw")
    with pytest.raises(ValueError):
        T._lzw_decode_tiff(enc[:-2], 22)  # truncated: EOI gone
    with pytest.raises(ValueError):
        T._lzw_decode_tiff(enc, 23)  # expect more than encoded
    with pytest.raises(ValueError):
        # 9-bit codes 256 (clear) then 511: non-root right after clear
        T._lzw_decode_tiff(bytes([0x80, 0x7F, 0xC0]), 4)


@pytest.mark.parametrize("bo", ["little", "big"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("rps", [0, 4])
def test_lzw_image_roundtrip(bo, predictor, rps):
    rng = np.random.default_rng(hash((bo, predictor, rps)) % 2**32)
    for shape in [(13, 17), (13, 17, 3), (13, 17, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        raw = T.tiff_encode(img, byteorder=bo, lzw=True,
                            predictor=predictor, rows_per_strip=rps)
        got = T.tiff_pixels(raw)
        assert got.shape == img.shape
        assert (got == img).all()


def test_predictor_tag_is_real():
    """The predictor file differs from the plain one and carries tag
    317 -- i.e. the decode path really exercised the cumsum undo."""
    y, x = np.mgrid[0:9, 0:31]
    smooth = ((x * 2 + y) % 256).astype(np.uint8)  # gradient: runs of +2
    plain = T.tiff_encode(smooth, lzw=True)
    pred = T.tiff_encode(smooth, lzw=True, predictor=2)
    assert plain != pred
    assert T._read_ifd(pred, "little")[T._T_PREDICTOR] == [2]
    assert T._T_PREDICTOR not in T._read_ifd(plain, "little")
    assert (T.tiff_pixels(pred) == smooth).all()
    # smooth gradients are what predictor 2 exists for
    assert len(pred) < len(plain)


def test_lzw_palette_and_packbits_conflict():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (7, 11), dtype=np.uint8)
    got = T.tiff_pixels(T.tiff_encode(idx, palette=pal, lzw=True))
    assert (got == pal[idx]).all()
    with pytest.raises(ValueError):
        T.tiff_encode(idx, lzw=True, packbits=True)
    with pytest.raises(ValueError):
        T.tiff_encode(idx, predictor=3)
