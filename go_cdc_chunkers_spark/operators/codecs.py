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

def ima_adpcm_decode(data: bytes, block_align: int = 256,
                     channels: int = 1) -> np.ndarray:
    """WAV IMA ADPCM payload -> int16 samples. Each block_align-byte block
    carries one 4-byte header PER CHANNEL (predictor int16, step index
    uint8, reserved), then the codes: mono is a flat nibble stream (low
    nibble first); stereo interleaves 4-byte (8-nibble) channel groups
    L,R,L,R... Output is standard interleaved PCM; per-channel
    samples_per_block = (block_align - 4*C) * 2 / C + 1 (each header's
    predictor IS that channel's first output sample, per the WAV framing
    convention).

    Vectorized ACROSS (block, channel) lanes: per-step state (predictor,
    step index) is an array over all lanes, and the sequential loop runs
    only over the within-block per-channel sample index -- a clip's
    decode cost is O(samples) with numpy-lane parallelism, bounded
    memory, no Python per-sample work proportional to block count. A
    trailing partial block is decoded the same way (short lane), mono
    only -- a truncated stereo tail loses whole groups."""
    C = int(channels)
    if C not in (1, 2):
        raise ValueError(f"ima_adpcm: channels must be 1 or 2, got {C}")
    raw = np.frombuffer(data, dtype=np.uint8)
    hdr = 4 * C
    if block_align < hdr + 4 * C:
        raise ValueError(f"ima_adpcm: block_align {block_align} too small")
    if C == 2 and len(raw) % block_align:
        raise ValueError("ima_adpcm: stereo stream truncated mid-block")
    n_blocks = (len(raw) + block_align - 1) // block_align
    if n_blocks == 0:
        return np.empty(0, np.int16)
    pad = n_blocks * block_align - len(raw)
    if pad:
        raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
    blocks = raw.reshape(n_blocks, block_align)

    # per-(block, channel) header state
    h = blocks[:, :hdr].reshape(n_blocks, C, 4)
    pred = h[:, :, 0].astype(np.int32) | (h[:, :, 1].astype(np.int32) << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16 sign
    index = np.clip(h[:, :, 2].astype(np.int32), 0, 88)

    body = blocks[:, hdr:]                       # (B, block_align - 4C)
    if C == 2:
        # groups of 8 bytes alternate channels: (B, G, 2, 4) -> per-channel
        # contiguous byte streams (B, C, G*4)
        G = body.shape[1] // 8
        by_ch = (body[:, : G * 8].reshape(n_blocks, G, 2, 4)
                 .transpose(0, 2, 1, 3).reshape(n_blocks, 2, G * 4))
    else:
        by_ch = body.reshape(n_blocks, 1, body.shape[1])
    npc = by_ch.shape[2] * 2                     # nibbles per channel
    nibbles = np.empty((n_blocks, C, npc), np.int32)
    nibbles[:, :, 0::2] = by_ch & 0x0F           # low nibble first
    nibbles[:, :, 1::2] = (by_ch >> 4) & 0x0F

    spb = npc + 1                                # per channel
    out = np.empty((n_blocks, C, spb), np.int16)
    out[:, :, 0] = pred.astype(np.int16)
    for j in range(npc):                         # lockstep over B*C lanes
        code = nibbles[:, :, j]
        step = IMA_STEP_TABLE[index]
        diff = step >> 3
        diff += np.where(code & 4, step, 0)
        diff += np.where(code & 2, step >> 1, 0)
        diff += np.where(code & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(code & 8, -diff, diff), -32768, 32767)
        index = np.clip(index + IMA_INDEX_TABLE[code & 7], 0, 88)
        out[:, :, j + 1] = pred.astype(np.int16)

    # (B, C, spb) -> interleaved PCM: per block, sample-major then channel
    flat = out.transpose(0, 2, 1).reshape(-1)
    if pad:  # mono only (stereo raised above): drop padding-decoded samples
        tail_body = block_align - pad - 4
        if tail_body < 0:  # fragment too short for a header: whole block junk
            flat = flat[: (n_blocks - 1) * spb]
        else:
            flat = flat[: (n_blocks - 1) * spb + 1 + tail_body * 2]
    return flat


def _ima_encode_channel(samples, pred: int, index: int):
    """(nibbles, final_index): encode one channel's samples from a given
    predictor/state (the shared per-sample feedback step)."""
    nibbles = []
    for s in samples:
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
    return nibbles, index


def ima_adpcm_encode(pcm: np.ndarray, block_align: int = 256,
                     channels: int = 1) -> bytes:
    """int16 samples (interleaved if stereo) -> WAV-framed IMA ADPCM
    blocks (sequential reference encoder: encoding is inherently a
    per-sample feedback loop and runs once per test/ingest-normalization,
    not in a hot path). Stereo interleaves 4-byte nibble groups per the
    WAV layout; input length should cover whole blocks for stereo."""
    C = int(channels)
    samples = pcm.astype(np.int32)
    spb = (block_align - 4 * C) * 2 // C + 1
    out = bytearray()
    index = [0] * C
    pos = 0
    n_frames = len(samples) // C
    while pos < n_frames:
        frames = samples[pos * C:(pos + min(spb, n_frames - pos)) * C]
        chans = [frames[c::C] for c in range(C)]
        nibs = []
        for c in range(C):
            pred = int(chans[c][0])
            out += int(pred & 0xFFFF).to_bytes(2, "little")
            out.append(index[c])
            out.append(0)
            nb, index[c] = _ima_encode_channel(chans[c][1:], pred, index[c])
            nibs.append(nb)
        if C == 1:
            nb = nibs[0]
            if len(nb) % 2:
                nb.append(0)
            for lo, hi in zip(nb[0::2], nb[1::2]):
                out.append(lo | (hi << 4))
        else:
            width = (block_align - 4 * C) * 2 // C  # nibbles per channel
            for c in range(C):
                nibs[c] += [0] * (width - len(nibs[c]))
            for g in range(width // 8):
                for c in range(C):
                    seg = nibs[c][g * 8:(g + 1) * 8]
                    for lo, hi in zip(seg[0::2], seg[1::2]):
                        out.append(lo | (hi << 4))
        pos += spb
    return bytes(out)


def wav_wrap(payload: bytes, tag: int, channels: int, block_align: int,
             sample_rate: int = 8000, bits: int = 16,
             wspb: int | None = None, fact_samples: int | None = None) -> bytes:
    """Wrap an encoded payload in a minimal RIFF/WAVE container (the sink
    half of _decode_wav's parser). For compressed tags, pass ``wspb``
    (samples per block -> fmt extension, cbSize=2) and ``fact_samples``
    (per-channel decoded sample count -> fact chunk), both of which the
    decoder honors per spec."""
    fmt = (tag.to_bytes(2, "little") + channels.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * channels * max(bits, 8) // 8).to_bytes(4, "little")
           + block_align.to_bytes(2, "little") + bits.to_bytes(2, "little"))
    if wspb is not None:
        fmt += (2).to_bytes(2, "little") + wspb.to_bytes(2, "little")
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if fact_samples is not None:
        chunks += b"fact" + (4).to_bytes(4, "little") \
            + fact_samples.to_bytes(4, "little")
    chunks += b"data" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def ima_adpcm_decode_reference(data: bytes, block_align: int = 256,
                               channels: int = 1) -> np.ndarray:
    """Per-sample pure-Python IMA ADPCM decoder: the differential oracle
    for the vectorized ima_adpcm_decode (cdc/naive.py pattern -- slow,
    obviously-correct, test-support only)."""
    C = int(channels)

    def step_one(code, pred, index):
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
        return pred, index

    out = []
    pos = 0
    while pos + 4 * C <= len(data):
        block = data[pos:pos + block_align]
        pred, index, ch_samples = [], [], []
        for c in range(C):
            h = block[4 * c:4 * c + 4]
            pred.append(int.from_bytes(h[0:2], "little", signed=True))
            index.append(max(0, min(88, h[2])))
            ch_samples.append([pred[c]])
        body = block[4 * C:]
        if C == 1:
            for byte in body:
                for code in (byte & 0x0F, (byte >> 4) & 0x0F):
                    pred[0], index[0] = step_one(code, pred[0], index[0])
                    ch_samples[0].append(pred[0])
        else:
            for g in range(len(body) // (4 * C)):
                for c in range(C):
                    seg = body[g * 8 + 4 * c:g * 8 + 4 * c + 4]
                    for byte in seg:
                        for code in (byte & 0x0F, (byte >> 4) & 0x0F):
                            pred[c], index[c] = step_one(code, pred[c], index[c])
                            ch_samples[c].append(pred[c])
        n = min(len(s) for s in ch_samples)
        for i in range(n):
            for c in range(C):
                out.append(ch_samples[c][i])
        pos += block_align
    return np.array(out, dtype=np.int16)
