"""GIF codec differential tests (no Spark needed).

Same two-layer certification as test_png.py / test_jpeg.py: (1) a naive
LZW decoder written straight from the GIF89a spec's description
(dictionary of byte strings, no chain tricks) checks the flat-array
production decoder on every encoder output; (2) seeded round-trips
through gif_encode exercise interlace, transparency, multi-frame
composition, disposal and table-reset paths. Error paths assert the
honest-raise contract.
"""
import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import gif as G
from go_cdc_chunkers_spark.operators.multimodal import decode_image


# ---------------------------------------------------------------------------
# Naive reference: spec description, dictionary of byte strings
# ---------------------------------------------------------------------------

def naive_lzw_decode(data: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    # pull codes LSB-first at the current width
    codes = []
    acc = nbits = 0
    width = min_code + 1
    table = [bytes([c]) for c in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            codes.append(code)
            if code == clear:
                table = [bytes([c]) for c in range(clear)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("naive: bad code")
            out += entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = entry
    raise ValueError("naive: no EOI")


@pytest.mark.parametrize("min_code", [2, 3, 5, 8])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lzw_roundtrip_matches_naive(min_code, seed):
    rng = np.random.default_rng(min_code * 100 + seed)
    n = int(rng.integers(1, 5000))
    idx = bytes(rng.integers(0, 1 << min_code, n, dtype=np.uint8))
    enc = G._lzw_encode(idx, min_code)
    assert naive_lzw_decode(enc, min_code) == idx
    assert bytes(G._lzw_decode(enc, min_code, n)) == idx


def test_lzw_table_reset_on_full():
    """Random 8-bit data longer than the 4096-entry table forces the
    encoder's clear-and-reset path; both decoders must resynchronize."""
    rng = np.random.default_rng(42)
    idx = bytes(rng.integers(0, 256, 60_000, dtype=np.uint8))
    enc = G._lzw_encode(idx, 8)
    assert naive_lzw_decode(enc, 8) == idx
    assert bytes(G._lzw_decode(enc, 8, len(idx))) == idx


def test_lzw_kwkwk_case():
    """'aaaa...' makes the encoder emit a code the decoder has not
    defined yet (the KwKwK case) immediately."""
    for n in range(1, 40):
        idx = b"\x01" * n
        enc = G._lzw_encode(idx, 2)
        assert naive_lzw_decode(enc, 2) == idx
        assert bytes(G._lzw_decode(enc, 2, n)) == idx


def test_lzw_rejects_garbage():
    with pytest.raises(ValueError):
        G._lzw_decode(b"\xff\xff\xff\xff", 2, 100)
    with pytest.raises(ValueError):
        G._lzw_decode(b"", 2, 1)  # ended without EOI
    with pytest.raises(ValueError):
        G._lzw_decode(b"\x00", 1, 1)  # bad min code size


# ---------------------------------------------------------------------------
# Container round-trips
# ---------------------------------------------------------------------------

def _rand_img(rng, h, w, ncolors):
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, (h, w), dtype=np.uint8)
    return idx, pal


@pytest.mark.parametrize("ncolors", [2, 4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_single_frame_roundtrip(ncolors, interlace):
    rng = np.random.default_rng(ncolors + int(interlace))
    idx, pal = _rand_img(rng, 21, 33, ncolors)
    px = G.gif_pixels(G.gif_encode(idx, pal, interlace=interlace))
    assert px.shape == (21, 33, 4)
    assert (px[:, :, :3] == pal[idx]).all()
    assert (px[:, :, 3] == 255).all()


def test_transparency():
    rng = np.random.default_rng(5)
    idx, pal = _rand_img(rng, 15, 17, 8)
    idx[3:6, 4:9] = 0
    px = G.gif_pixels(G.gif_encode(idx, pal, transparent=0))
    opaque = idx != 0
    assert (px[opaque][:, :3] == pal[idx[opaque]]).all()
    assert (px[opaque][:, 3] == 255).all()
    assert (px[~opaque] == 0).all()  # transparent canvas stays clear


def test_animation_composites_patches():
    """Frame 2 is a small patch; its snapshot must be frame 1 with the
    patch region overwritten (disposal 0 = keep)."""
    rng = np.random.default_rng(9)
    base, pal = _rand_img(rng, 20, 30, 16)
    patch = rng.integers(0, 16, (6, 7), dtype=np.uint8)
    raw = G.gif_encode([(base, (0, 0)), (patch, (11, 8))], pal,
                       delays=[10, 20])
    frames = G.gif_frames(raw)
    assert len(frames) == 2
    assert frames[0][1] == 10 and frames[1][1] == 20
    assert (frames[0][0][:, :, :3] == pal[base]).all()
    expect = pal[base].copy()
    expect[8:14, 11:18] = pal[patch]
    assert (frames[1][0][:, :, :3] == expect).all()


def test_animation_disposal_restore_background():
    """Disposal 2 clears the frame's region before the next frame, so
    frame 2's snapshot shows transparent pixels where frame 1 was
    (outside frame 2's own patch)."""
    rng = np.random.default_rng(11)
    base, pal = _rand_img(rng, 10, 10, 4)
    patch = rng.integers(0, 4, (3, 3), dtype=np.uint8)
    raw = G.gif_encode([(base, (0, 0)), (patch, (0, 0))], pal,
                       disposals=[2, 0])
    f1, f2 = [f for f, _ in G.gif_frames(raw)]
    assert (f1[:, :, :3] == pal[base]).all()
    assert (f2[:3, :3, :3] == pal[patch]).all()
    assert (f2[3:, :, 3] == 0).all()  # cleared by disposal 2
    assert (f2[:3, 3:, 3] == 0).all()


def test_disposal_3_restores_previous():
    """Disposal 3: after the middle frame displays, the canvas reverts
    to its pre-draw state, so frame 3 composites onto the BASE canvas
    with no trace of frame 2's patch."""
    rng = np.random.default_rng(3)
    base, pal = _rand_img(rng, 8, 9, 4)
    p2 = rng.integers(0, 4, (4, 4), dtype=np.uint8)
    p3 = rng.integers(0, 4, (2, 3), dtype=np.uint8)
    raw = G.gif_encode([(base, (0, 0)), (p2, (2, 2)), (p3, (5, 5))], pal,
                       disposals=[0, 3, 0])
    f1, f2, f3 = [f for f, _ in G.gif_frames(raw)]
    assert (f1[:, :, :3] == pal[base]).all()
    exp2 = pal[base].copy()
    exp2[2:6, 2:6] = pal[p2]
    assert (f2[:, :, :3] == exp2).all()
    exp3 = pal[base].copy()  # p2 reverted by disposal 3
    exp3[5:7, 5:8] = pal[p3]
    assert (f3[:, :, :3] == exp3).all()
    assert (f3[:, :, 3] == 255).all()


def test_error_paths():
    rng = np.random.default_rng(1)
    idx, pal = _rand_img(rng, 6, 6, 4)
    raw = G.gif_encode(idx, pal)
    with pytest.raises(ValueError):
        G.gif_pixels(b"NOTAGIF" + raw[7:])
    with pytest.raises(ValueError):
        G.gif_pixels(raw[:-10])  # truncated: trailer gone
    # frame outside logical screen
    bad = G.gif_encode([(idx, (4, 4))], pal)
    with pytest.raises(ValueError):
        G.gif_pixels(bad)


def test_decode_image_wiring():
    """multimodal.decode_image routes GIF bytes and drops alpha."""
    rng = np.random.default_rng(8)
    idx, pal = _rand_img(rng, 12, 19, 32)
    out = decode_image(G.gif_encode(idx, pal, interlace=True))
    assert out.shape == (12, 19, 3)
    assert (out == pal[idx]).all()
