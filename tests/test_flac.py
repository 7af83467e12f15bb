"""FLAC codec tests (no Spark).

Certification layers (mirroring test_jpeg.py / test_png.py):
  1. SPEC GOLDEN: a minimal stream hand-assembled bit by bit in this
     file from the FLAC spec (RFC 9639) -- its own bit-string packing
     and its own naive shift-register CRCs, sharing NOTHING with the
     module -- must decode to the expected samples. Guards against the
     encoder+decoder agreeing on a wrong reading of the spec.
  2. LOSSLESS ROUND-TRIPS: encode -> decode integer-identical across
     every subframe type (constant / verbatim / fixed / LPC / escape
     partitions), stereo decorrelations, partition orders, bit depths,
     wasted bits, odd tail blocks, and worst-case noise.
  3. INTEGRITY HONESTY: bad magic / truncation / header CRC-8 / frame
     CRC-16 / STREAMINFO MD5 tampering all raise.
"""
import hashlib

import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import flac as FL
from go_cdc_chunkers_spark.operators.multimodal import _decode_pcm_batch


# ---------------------------------------------------------------------------
# 1. Hand-assembled spec golden (independent bit packing + CRCs)
# ---------------------------------------------------------------------------

def _bits_to_bytes(s: str) -> bytes:
    assert len(s) % 8 == 0
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _naive_crc(data: bytes, poly_bits: str, width: int) -> int:
    """Plain shift-register CRC written from the polynomial definition
    (init 0, MSB-first) -- independent of the module's table method."""
    poly = int(poly_bits, 2)
    reg = 0
    for byte in data:
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            top = (reg >> (width - 1)) & 1
            reg = ((reg << 1) | bit) & ((1 << width) - 1)
            if top:
                reg ^= poly & ((1 << width) - 1)
    for _ in range(width):
        top = (reg >> (width - 1)) & 1
        reg = (reg << 1) & ((1 << width) - 1)
        if top:
            reg ^= poly & ((1 << width) - 1)
    return reg


def test_naive_crc_agrees_with_module():
    for data in (b"", b"\x00", b"123456789", bytes(range(50))):
        assert _naive_crc(data, "100000111", 8) == FL.crc8(data)
        assert _naive_crc(data, "11000000000000101", 16) == FL.crc16(data)


def _b(v: int, n: int) -> str:
    return format(v & ((1 << n) - 1), f"0{n}b")


def test_hand_assembled_golden_decodes():
    samples = [12, -5, 0, 100]  # mono, 8-bit, one VERBATIM subframe
    # STREAMINFO: min/max blocksize 4, framesizes 0, sr 8000, 1 ch,
    # bps 8, total 4, md5 of the interleaved signed LE bytes
    pcm_bytes = bytes((s & 0xFF) for s in samples)
    si = (_b(4, 16) + _b(4, 16) + _b(0, 24) + _b(0, 24) + _b(8000, 20)
          + _b(0, 3) + _b(7, 5) + _b(4, 36))
    body = _bits_to_bytes(si) + hashlib.md5(pcm_bytes).digest()
    meta = bytes([0x80]) + len(body).to_bytes(3, "big") + body

    # frame header: sync(14) res(1) strategy(1) | bs code 0110 (8-bit
    # follows), sr code 0100 (8 kHz) | ch 0000, size 001 (8-bit), res 0
    # | coded frame number 0 | blocksize-1 byte
    hdr = (_b(0x3FFE, 14) + "0" + "0" + _b(6, 4) + _b(4, 4)
           + _b(0, 4) + _b(1, 3) + "0" + _b(0, 8) + _b(3, 8))
    hdr_bytes = _bits_to_bytes(hdr)
    hdr_bytes += bytes([_naive_crc(hdr_bytes, "100000111", 8)])
    # subframe: pad 0, type 000001 (VERBATIM), wasted flag 0, then 4x8-bit
    sub = "0" + _b(1, 6) + "0" + "".join(_b(s, 8) for s in samples)
    sub += "0" * (-len(sub) % 8)
    frame = hdr_bytes + _bits_to_bytes(sub)
    frame += _naive_crc(frame, "11000000000000101", 16).to_bytes(2, "big")

    out, sr, bps = FL.flac_decode(b"fLaC" + meta + frame)
    assert (sr, bps) == (8000, 8)
    assert out.shape == (4, 1)
    assert out[:, 0].tolist() == samples


# ---------------------------------------------------------------------------
# 2. Lossless round-trips
# ---------------------------------------------------------------------------

def _rt(pcm, **kw):
    raw = FL.flac_encode(pcm, 16000, **kw)
    out, _, _ = FL.flac_decode(raw)
    p = np.asarray(pcm, np.int64)
    if p.ndim == 1:
        p = p[:, None]
    assert np.array_equal(out, p), f"round-trip mismatch for {kw}"
    return raw


def _mono(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (2000 * np.sin(t / 20) + rng.integers(-50, 50, n)).astype(np.int64)


@pytest.mark.parametrize("force", [None, "verbatim", "escape",
                                   "fixed_order0", ("lpc", [3, -1], 1),
                                   ("lpc", [5, -4, 1], 2)])
def test_roundtrip_subframe_types(force):
    _rt(_mono(), block_size=512, force=force)


@pytest.mark.parametrize("po", [0, 1, 2, 3])
def test_roundtrip_partition_orders(po):
    _rt(_mono(2048), block_size=512, partition_order=po)


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_roundtrip_stereo_modes(mode):
    m = _mono()
    st = np.stack([m, (1500 * np.cos(np.arange(len(m)) / 15)).astype(
        np.int64)], axis=1)
    _rt(st, block_size=512, mode=mode)


def test_roundtrip_constant_and_empty_ac():
    _rt(np.full(1000, -123, np.int64), block_size=256)
    _rt(np.zeros(500, np.int64), block_size=256)


def test_roundtrip_bit_depths_and_wasted():
    rng = np.random.default_rng(7)
    _rt(rng.integers(-128, 128, 700), bps=8, block_size=192)
    _rt(rng.integers(-(1 << 23), 1 << 23, 400), bps=24, block_size=256)
    raw = _rt((rng.integers(-100, 100, 600) * 8), block_size=300)
    # wasted-bits subframes must actually be smaller than plain encoding
    plain = FL.flac_encode(rng.integers(-800, 800, 600), 16000,
                           block_size=300)
    assert len(raw) < len(plain)


def test_roundtrip_odd_tail_and_noise():
    _rt(_mono(2537), block_size=512)
    rng = np.random.default_rng(9)
    _rt(rng.integers(-32768, 32768, 2048), block_size=1024)


def test_roundtrip_full_range_extremes():
    s = np.array([-32768, 32767, -32768, 32767, 0, -1, 1, -32768],
                 np.int64)
    _rt(np.tile(s, 40), block_size=64)


def test_md5_and_total_samples_in_streaminfo():
    pcm = _mono(1000)
    raw = FL.flac_encode(pcm, 16000, block_size=512)
    out, sr, bps = FL.flac_decode(raw)
    assert (sr, bps, out.shape) == (16000, 16, (1000, 1))


# ---------------------------------------------------------------------------
# 3. Integrity honesty
# ---------------------------------------------------------------------------

def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        FL.flac_decode(b"RIFF" + b"\x00" * 64)


def test_truncated_raises():
    raw = FL.flac_encode(_mono(600), 16000, block_size=512)
    with pytest.raises(ValueError):
        FL.flac_decode(raw[:len(raw) // 2])


def test_frame_crc16_tamper_raises():
    raw = bytearray(FL.flac_encode(_mono(400), 16000, block_size=512))
    raw[-1] ^= 0x01  # last frame's CRC-16 low byte
    with pytest.raises(ValueError, match="CRC-16"):
        FL.flac_decode(bytes(raw))


def test_header_crc8_tamper_raises():
    pcm = _mono(400)
    raw = FL.flac_encode(pcm, 16000, block_size=512)
    base = FL.flac_encode(np.zeros(0, np.int64), 16000, block_size=512)
    fstart = len(base[:4 + 4 + 38])  # magic + block header + STREAMINFO
    t = bytearray(raw)
    t[fstart + 4] ^= 0x40  # a coded-frame-number byte inside the header
    with pytest.raises(ValueError, match="CRC-8|coded-number"):
        FL.flac_decode(bytes(t))


def test_md5_tamper_raises():
    raw = bytearray(FL.flac_encode(_mono(400), 16000, block_size=512))
    raw[8 + 18] ^= 0xFF  # first md5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        FL.flac_decode(bytes(raw))


def test_encoder_range_checks():
    with pytest.raises(ValueError, match="range"):
        FL.flac_encode(np.array([200], np.int64), 8000, bps=8)
    with pytest.raises(ValueError, match="bps"):
        FL.flac_encode(np.array([1], np.int64), 8000, bps=12)
    with pytest.raises(ValueError, match="stereo"):
        FL.flac_encode(np.array([1, 2], np.int64), 8000, mode="mid_side")


# ---------------------------------------------------------------------------
# Pipeline dispatch
# ---------------------------------------------------------------------------

def test_decode_pcm_batch_dispatches_flac():
    m = _mono(800)
    st = np.stack([m, -m], axis=1)
    raw = FL.flac_encode(st, 16000, block_size=256, mode="mid_side")
    out = _decode_pcm_batch(raw, "flac")
    assert out.dtype == np.int16
    assert np.array_equal(out, st.ravel().astype(np.int16))


def test_decode_pcm_batch_rejects_non16bit_flac():
    raw = FL.flac_encode(np.arange(-50, 50), 8000, bps=8, block_size=100)
    with pytest.raises(NotImplementedError, match="16-bit"):
        _decode_pcm_batch(raw, "flac")


# ---------------------------------------------------------------------------
# 4. Native (C) entropy fast path == pure-Python reference
# ---------------------------------------------------------------------------

def _decode_both_paths(raw: bytes):
    prev = FL._FORCE_PURE
    try:
        FL._FORCE_PURE = False
        fast = FL.flac_decode(raw)
        FL._FORCE_PURE = True
        pure = FL.flac_decode(raw)
    finally:
        FL._FORCE_PURE = prev
    return fast, pure


@pytest.mark.parametrize("kw", [
    dict(block_size=512),
    dict(block_size=512, force="verbatim"),
    dict(block_size=512, force="escape"),
    dict(block_size=512, force=("lpc", [3, -1], 1)),
    dict(block_size=512, force=("lpc", [5, -4, 1], 2), partition_order=2),
    dict(block_size=512, partition_order=3),
    dict(block_size=256, bps=8),
    dict(block_size=256, bps=24),
    dict(block_size=512, wasted=2),
])
def test_native_rice_lpc_crc_equal_pure(kw):
    """The C rice/LPC/CRC kernels (cdc/_native.c, VERDICT-r4-era flac
    was 0.4 MB/s pure-Python) must be bit-identical to the pure paths on
    every stream shape; skipped only if no compiler exists (then both
    decodes ARE the pure path and the assert still holds trivially)."""
    kw = dict(kw)
    bps = kw.pop("bps", 16)
    wasted = kw.pop("wasted", 0)
    pcm = _mono(2048, seed=3)
    if bps == 8:
        pcm = pcm >> 5
    elif bps == 24:
        pcm = pcm << 7
    if wasted:
        pcm = (pcm >> wasted) << wasted
    raw = bytes(FL.flac_encode(pcm, 16000, bps=bps, **kw))
    (fast, sr1, b1), (pure, sr2, b2) = _decode_both_paths(raw)
    assert (sr1, b1) == (sr2, b2)
    assert np.array_equal(fast, pure)
    assert np.array_equal(fast.ravel(), pcm)


def test_native_stereo_modes_equal_pure():
    m = _mono(3000, seed=4)
    st = np.stack([m, np.roll(m, 700) // 3], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        raw = bytes(FL.flac_encode(st, 16000, mode=mode))
        (fast, _, _), (pure, _, _) = _decode_both_paths(raw)
        assert np.array_equal(fast, pure) and np.array_equal(fast, st), mode


def test_native_truncation_still_raises():
    raw = bytearray(FL.flac_encode(_mono(1500), 16000))
    with pytest.raises(ValueError):
        FL.flac_decode(bytes(raw[:len(raw) - len(raw) // 4]))
