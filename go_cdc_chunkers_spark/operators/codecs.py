"""Real compressed-audio codecs, dependency-free (numpy closed forms).

The multimodal layer's honesty rule is: decode for real or raise -- no
fake decoders outside tests. This module moves three genuinely COMPRESSED
formats from the raise side to the real side, because their decoders are
closed-form or small state machines that need no codec library:

  - G.711 mu-law (`pcm_mulaw`): 8-bit logarithmic companding, 2:1. The
    ITU-T G.711 expansion is a pure bit formula -- vectorized numpy here,
    and simple enough that the driver oracle replays it in ANSI SQL
    (entry_queries.audio_mulaw_decode), so decode is value-hash-checked
    against an independent engine.
  - G.711 A-law (`pcm_alaw`): same structure, European variant.
  - IMA ADPCM in WAV framing (`adpcm_ima`, fmt tag 0x11): 4-bit
    differential coding, 4:1. Inherently sequential per sample -- but the
    WAV framing resets predictor state at every block, so blocks decode
    INDEPENDENTLY: the decoder below runs the sequential loop over the
    within-block sample index while vectorizing across all blocks of a
    clip (the same loop-over-lockstep-lanes architecture as the CDC
    kernels' cache-blocked scan). Pinned against a per-sample pure-Python
    reference decoder in tests (the cdc/naive.py differential pattern).

Encoders for all three ship too: they make round-trip tests honest
(decode(encode(x)) must hit the brief's SNR >= 30 dB per-row invariant)
and let pipelines normalize mixed-codec corpora end to end.
"""

from __future__ import annotations

import numpy as np

# IMA ADPCM tables (IMA "Recommended Practices for Enhancing Digital Audio
# Compatibility", public spec; identical in every implementation).
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


# ---------------------------------------------------------------------------
# G.711 mu-law
# ---------------------------------------------------------------------------

def mulaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes -> int16 samples (ITU-T closed-form expansion:
    complement, split sign/exponent/mantissa, shift, re-bias)."""
    u = (~np.frombuffer(data, dtype=np.uint8).astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -x, x).astype(np.int16)


def mulaw_encode(pcm: np.ndarray) -> bytes:
    """int16 samples -> G.711 mu-law bytes (bias, priority-encode the
    exponent, pack). Standard reference companding; round-trips with
    mulaw_decode at quantization-noise level."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    byte = ~(sign | (exp << 4) | mant) & 0xFF
    return byte.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# G.711 A-law
# ---------------------------------------------------------------------------

def alaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """G.711 A-law bytes -> int16 samples (xor 0x55, then the segmented
    expansion; segment 0 is linear, segments 1-7 logarithmic). ITU sign
    convention: the sign bit SET (after the xor) means positive."""
    a = np.frombuffer(data, dtype=np.uint8).astype(np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    lin = (mant << 4) + 8
    log = ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    x = np.where(exp == 0, lin, log)
    return np.where(sign != 0, x, -x).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> bytes:
    x = pcm.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)  # ITU: sign bit = positive
    mag = np.minimum(np.abs(x), 32767)
    exp = (np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7).clip(0, 7)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    byte = (sign | (exp << 4) | mant) ^ 0x55
    return (byte & 0xFF).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV framing, mono)
# ---------------------------------------------------------------------------

def ima_adpcm_decode(data: bytes, block_align: int = 256) -> np.ndarray:
    """WAV IMA ADPCM payload -> int16 samples (mono). Each block_align-byte
    block: 4-byte header (predictor int16, step index uint8, reserved),
    then (block_align - 4) bytes of 4-bit codes, low nibble first ->
    samples_per_block = (block_align - 4) * 2 + 1 (the header's predictor
    IS the first output sample, per the WAV framing convention).

    Vectorized ACROSS blocks: per-step state (predictor, step index) is an
    array over all blocks, and the sequential loop runs only over the
    within-block sample index -- a clip's decode cost is O(samples) with
    numpy-lane parallelism over blocks, bounded memory, no Python
    per-sample work proportional to block count. Trailing partial block is
    decoded the same way (short lane)."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if block_align < 8:
        raise ValueError(f"ima_adpcm: block_align {block_align} too small")
    n_blocks = (len(raw) + block_align - 1) // block_align
    if n_blocks == 0:
        return np.empty(0, np.int16)
    pad = n_blocks * block_align - len(raw)
    if pad:
        raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
    blocks = raw.reshape(n_blocks, block_align)

    pred = (blocks[:, 0].astype(np.int32)
            | (blocks[:, 1].astype(np.int32) << 8))
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16 sign
    index = np.clip(blocks[:, 2].astype(np.int32), 0, 88)

    body = blocks[:, 4:]                                   # (B, block_align-4)
    nibbles = np.empty((n_blocks, body.shape[1] * 2), np.int32)
    nibbles[:, 0::2] = body & 0x0F                         # low nibble first
    nibbles[:, 1::2] = (body >> 4) & 0x0F

    spb = body.shape[1] * 2 + 1
    out = np.empty((n_blocks, spb), np.int16)
    out[:, 0] = pred.astype(np.int16)
    for j in range(nibbles.shape[1]):                      # lockstep over lanes
        code = nibbles[:, j]
        step = IMA_STEP_TABLE[index]
        diff = step >> 3
        diff += np.where(code & 4, step, 0)
        diff += np.where(code & 2, step >> 1, 0)
        diff += np.where(code & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(code & 8, -diff, diff), -32768, 32767)
        index = np.clip(index + IMA_INDEX_TABLE[code & 7], 0, 88)
        out[:, j + 1] = pred.astype(np.int16)

    flat = out.reshape(-1)
    if pad:  # drop samples decoded from padding of the final short block
        tail_body = block_align - pad - 4
        if tail_body < 0:  # fragment too short for a header: whole block junk
            flat = flat[: (n_blocks - 1) * spb]
        else:
            flat = flat[: (n_blocks - 1) * spb + 1 + tail_body * 2]
    return flat


def ima_adpcm_encode(pcm: np.ndarray, block_align: int = 256) -> bytes:
    """int16 mono samples -> WAV-framed IMA ADPCM blocks (sequential
    reference encoder: encoding is inherently a per-sample feedback loop
    and runs once per test/ingest-normalization, not in a hot path)."""
    samples = pcm.astype(np.int32)
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    index = 0
    pos = 0
    while pos < len(samples):
        chunk = samples[pos:pos + spb]
        pred = int(chunk[0])
        out += int(pred & 0xFFFF).to_bytes(2, "little")
        out.append(index)
        out.append(0)
        nibbles = []
        for s in chunk[1:]:
            step = int(IMA_STEP_TABLE[index])
            diff = int(s) - pred
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            d = step >> 3
            if diff >= step:
                code |= 4
                diff -= step
                d += step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
                d += step >> 1
            if diff >= step >> 2:
                code |= 1
                d += step >> 2
            pred = max(-32768, min(32767, pred + (-d if code & 8 else d)))
            index = max(0, min(88, index + int(IMA_INDEX_TABLE[code & 7])))
            nibbles.append(code)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        pos += spb
    return bytes(out)


def ima_adpcm_decode_reference(data: bytes, block_align: int = 256) -> np.ndarray:
    """Per-sample pure-Python IMA ADPCM decoder: the differential oracle
    for the vectorized ima_adpcm_decode (cdc/naive.py pattern -- slow,
    obviously-correct, test-support only)."""
    out = []
    pos = 0
    while pos + 4 <= len(data):
        block = data[pos:pos + block_align]
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = max(0, min(88, block[2]))
        out.append(pred)
        for byte in block[4:]:
            for code in (byte & 0x0F, (byte >> 4) & 0x0F):
                step = int(IMA_STEP_TABLE[index])
                diff = step >> 3
                if code & 4:
                    diff += step
                if code & 2:
                    diff += step >> 1
                if code & 1:
                    diff += step >> 2
                pred = max(-32768, min(32767, pred + (-diff if code & 8 else diff)))
                index = max(0, min(88, index + int(IMA_INDEX_TABLE[code & 7])))
                out.append(pred)
        pos += block_align
    return np.array(out, dtype=np.int16)
