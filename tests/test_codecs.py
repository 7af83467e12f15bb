"""Compressed-audio codecs (operators/codecs.py): G.711 mu-law/A-law and
IMA ADPCM. Gates: round-trip SNR (the brief's per-row >= 30 dB invariant
for G.711; ADPCM is 4-bit differential, gated at its own fidelity),
differential equality of the block-vectorized ADPCM decoder vs the
per-sample pure-Python reference (the cdc/naive.py pattern), WAV container
dispatch, and the decode surface contract (real decode or raise)."""

import numpy as np
import pytest

from go_cdc_chunkers_spark.operators import codecs
from go_cdc_chunkers_spark.operators.multimodal import (_decode_pcm_batch,
                                                        _decode_wav)


def snr_db(x: np.ndarray, y: np.ndarray) -> float:
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    err = x - y
    return 10 * np.log10((x ** 2).sum() / max((err ** 2).sum(), 1e-12))


@pytest.fixture(scope="module")
def speechish():
    rng = np.random.default_rng(11)
    t = np.arange(16000) / 16000.0
    x = sum(a * np.sin(2 * np.pi * f * t)
            for a, f in ((0.5, 220.0), (0.25, 700.0), (0.12, 1800.0)))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t) ** 2   # amplitude contour
    x += 0.01 * rng.standard_normal(len(t))
    return np.clip(x * 20000, -32768, 32767).astype(np.int16)


def test_mulaw_roundtrip_snr(speechish):
    dec = codecs.mulaw_decode(codecs.mulaw_encode(speechish))
    assert len(dec) == len(speechish)
    assert snr_db(speechish, dec) >= 30.0, snr_db(speechish, dec)


def test_mulaw_closed_form_anchors():
    # byte 0xFF is +0, 0x7F is -0; extremes decode near the +-8031<<2 rails
    dec = codecs.mulaw_decode(bytes([0xFF, 0x7F, 0x80, 0x00]))
    assert dec[0] == 0 and dec[1] == 0
    assert dec[2] == 32124 and dec[3] == -32124  # ITU max magnitude


def test_alaw_roundtrip_snr(speechish):
    dec = codecs.alaw_decode(codecs.alaw_encode(speechish))
    assert len(dec) == len(speechish)
    assert snr_db(speechish, dec) >= 30.0, snr_db(speechish, dec)


def test_alaw_closed_form_anchors():
    # 0x55/0xD5 are +-8 (segment 0 smallest); 0x2A/0xAA the +-rails
    dec = codecs.alaw_decode(bytes([0xD5, 0x55, 0xAA, 0x2A]))
    assert dec[0] == 8 and dec[1] == -8
    assert dec[2] == 32256 and dec[3] == -32256


@pytest.mark.parametrize("block_align", [64, 256, 2048])
def test_ima_adpcm_vectorized_equals_reference(speechish, block_align):
    enc = codecs.ima_adpcm_encode(speechish, block_align=block_align)
    vec = codecs.ima_adpcm_decode(enc, block_align=block_align)
    ref = codecs.ima_adpcm_decode_reference(enc, block_align=block_align)
    assert np.array_equal(vec, ref)


def test_ima_adpcm_roundtrip_fidelity(speechish):
    enc = codecs.ima_adpcm_encode(speechish, block_align=256)
    dec = codecs.ima_adpcm_decode(enc, block_align=256)
    n = min(len(dec), len(speechish))
    s = snr_db(speechish[:n], dec[:n])
    assert s >= 25.0, s     # 4-bit differential: ~4x compression
    assert len(enc) < len(speechish) * 2 * 0.3  # really compressed


def test_ima_adpcm_truncated_tail(speechish):
    enc = codecs.ima_adpcm_encode(speechish, block_align=256)
    # chop mid-block: decoders agree on the partial tail too
    for cut in (len(enc) - 3, len(enc) - 100, 257, 4):
        vec = codecs.ima_adpcm_decode(enc[:cut], block_align=256)
        ref = codecs.ima_adpcm_decode_reference(enc[:cut], block_align=256)
        assert np.array_equal(vec, ref), cut


def test_ima_adpcm_fuzz_vectorized_equals_reference():
    """Hypothesis arm: the vectorized decoder must equal the per-sample
    reference on ARBITRARY byte streams (not just encoder outputs) --
    garbage headers, out-of-range step indices, truncated tails -- for
    random block sizes and both channel layouts (stereo on whole
    blocks)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @st.composite
    def stream(draw):
        block = draw(st.sampled_from([16, 64, 256, 1024]))
        channels = draw(st.sampled_from([1, 2]))
        n_blocks = draw(st.integers(min_value=0, max_value=4))
        seed = draw(st.integers(min_value=0, max_value=2**31))
        rng = np.random.default_rng(seed)
        n = n_blocks * block
        if channels == 1:  # mono may truncate mid-block
            n = max(0, n - draw(st.integers(min_value=0, max_value=block)))
        return bytes(rng.integers(0, 256, n, dtype=np.uint8)), block, channels

    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(stream())
    def check(s):
        data, block, channels = s
        vec = codecs.ima_adpcm_decode(data, block_align=block,
                                      channels=channels)
        ref = codecs.ima_adpcm_decode_reference(data, block_align=block,
                                                channels=channels)
        assert np.array_equal(vec, ref), (len(data), block, channels)

    check()


def test_g711_decoders_total_on_all_bytes():
    """Every byte value decodes (total functions, no traps) and encode is
    the decoder's right-inverse on its own output for all 256 codes."""
    all_bytes = bytes(range(256))
    mu = codecs.mulaw_decode(all_bytes)
    al = codecs.alaw_decode(all_bytes)
    assert len(mu) == len(al) == 256
    # byte-level inverse everywhere except negative zero (0x7F decodes to
    # 0, which canonically re-encodes as +0 = 0xFF -- ITU behavior)
    enc = np.frombuffer(codecs.mulaw_encode(mu), np.uint8)
    orig = np.frombuffer(all_bytes, np.uint8)
    diff = np.nonzero(enc != orig)[0]
    assert list(diff) == [0x7F] and enc[0x7F] == 0xFF, diff
    # value-level inverse holds for every code in both codecs
    assert np.array_equal(codecs.mulaw_decode(codecs.mulaw_encode(mu)), mu)
    assert np.array_equal(codecs.alaw_decode(codecs.alaw_encode(al)), al)


def _wav(tag: int, payload: bytes, block_align: int = 256,
         channels: int = 1) -> bytes:
    fmt = (tag.to_bytes(2, "little") + channels.to_bytes(2, "little")
           + (16000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + block_align.to_bytes(2, "little")
           + (16 if tag == 1 else 8 if tag in (6, 7) else 4).to_bytes(2, "little"))
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_container_dispatch(speechish):
    assert np.array_equal(_decode_wav(_wav(1, speechish.tobytes())), speechish)
    mu = codecs.mulaw_encode(speechish)
    assert np.array_equal(_decode_wav(_wav(7, mu)), codecs.mulaw_decode(mu))
    al = codecs.alaw_encode(speechish)
    assert np.array_equal(_decode_wav(_wav(6, al)), codecs.alaw_decode(al))
    ad = codecs.ima_adpcm_encode(speechish, 256)
    assert np.array_equal(_decode_wav(_wav(0x11, ad, block_align=256)),
                          codecs.ima_adpcm_decode(ad, 256))
    with pytest.raises(NotImplementedError):
        _decode_wav(_wav(0x55, b"\x00" * 16))  # unknown tag still raises
    with pytest.raises(NotImplementedError):
        _decode_wav(_wav(0x11, b"\x00" * 256, channels=4))  # >2ch ADPCM


def test_ima_adpcm_stereo_roundtrip_and_reference(speechish):
    """Stereo WAV framing: interleaved 4-byte channel nibble groups, one
    header per channel. Vectorized decode == per-sample reference; each
    channel round-trips at ADPCM fidelity; WAV container dispatches."""
    right = np.roll(speechish, 1000) // 2  # distinct second channel
    spb = (256 - 8) * 2 // 2 + 1
    n = (len(speechish) // spb) * spb      # whole stereo blocks
    inter = np.empty(2 * n, np.int16)
    inter[0::2], inter[1::2] = speechish[:n], right[:n]

    enc = codecs.ima_adpcm_encode(inter, block_align=256, channels=2)
    assert len(enc) % 256 == 0
    vec = codecs.ima_adpcm_decode(enc, block_align=256, channels=2)
    ref = codecs.ima_adpcm_decode_reference(enc, block_align=256, channels=2)
    assert np.array_equal(vec, ref)
    assert len(vec) == 2 * n

    sl = snr_db(speechish[:n], vec[0::2])
    sr = snr_db(right[:n], vec[1::2])
    assert sl >= 25.0 and sr >= 25.0, (sl, sr)

    got = _decode_wav(_wav(0x11, enc, block_align=256, channels=2))
    assert np.array_equal(got, vec)
    with pytest.raises(ValueError, match="truncated"):
        codecs.ima_adpcm_decode(enc[:-3], block_align=256, channels=2)


def test_decode_batch_codec_names(speechish):
    mu = codecs.mulaw_encode(speechish)
    assert np.array_equal(_decode_pcm_batch(mu, "pcm_mulaw"),
                          codecs.mulaw_decode(mu))
    al = codecs.alaw_encode(speechish)
    assert np.array_equal(_decode_pcm_batch(al, "pcm_alaw"),
                          codecs.alaw_decode(al))
    ad = codecs.ima_adpcm_encode(speechish, 256)
    assert np.array_equal(_decode_pcm_batch(ad, "adpcm_ima"),
                          codecs.ima_adpcm_decode(ad, 256))
    with pytest.raises(NotImplementedError):
        _decode_pcm_batch(b"\x00\x01", "opus")  # truly lib-needing: raise


def test_frame_features_codec_equivalence(spark, speechish):
    """End to end through the Spark decode stage: the SAME audio shipped
    as pcm_s16le vs G.711 mu-law yields near-identical frame energies
    (companding noise only) -- mixed-codec corpora normalize inside
    audio_frame_features without special-casing."""
    from go_cdc_chunkers_spark.operators.multimodal import audio_frame_features

    mu = codecs.mulaw_encode(speechish)
    df = spark.createDataFrame(
        [("pcm", bytearray(speechish.tobytes()), 16000, "pcm_s16le"),
         ("mu", bytearray(mu), 16000, "pcm_mulaw")],
        "clip_id string, bytes binary, sr_hz int, codec string")
    rows = audio_frame_features(df).collect()
    e = {}
    for r in rows:
        e.setdefault(r.clip_id, []).append((r.frame_idx, r.energy))
    pcm = [v for _, v in sorted(e["pcm"])]
    muv = [v for _, v in sorted(e["mu"])]
    assert len(pcm) == len(muv) > 10
    rel = max(abs(a - b) / max(a, 1e-9) for a, b in zip(pcm, muv))
    assert rel < 0.05, rel


def test_wav_adpcm_malformed_fmt_raises(speechish):
    """ADVICE r4: channels=0 / block_align=0 are malformed fmt values --
    raise, never default around them."""
    ad = codecs.ima_adpcm_encode(speechish, 256)
    with pytest.raises(ValueError, match="malformed"):
        _decode_wav(_wav(0x11, ad, block_align=256, channels=0))
    with pytest.raises(ValueError, match="malformed"):
        _decode_wav(_wav(0x11, ad, block_align=0, channels=1))


def test_wav_adpcm_fact_trims_padded_final_block(speechish):
    """ADVICE r4: a fact chunk carries the true per-channel sample count;
    the encoder pads the final block, so decode must trim to it."""
    n = 505 + 100  # one full mono block (505 samples) + a partial second
    pcm = speechish[:n]
    ad = codecs.ima_adpcm_encode(pcm, 256)
    wav = codecs.wav_wrap(ad, 0x11, channels=1, block_align=256, bits=4,
                          wspb=505, fact_samples=n)
    out = _decode_wav(wav)
    assert len(out) == n
    assert np.array_equal(out, codecs.ima_adpcm_decode(ad, 256)[:n])
    # without fact, the trailing partial block decodes to its own length
    wav_nofact = codecs.wav_wrap(ad, 0x11, channels=1, block_align=256,
                                 bits=4, wspb=505)
    assert len(_decode_wav(wav_nofact)) >= n


def test_wav_adpcm_nonstandard_wspb_raises(speechish):
    ad = codecs.ima_adpcm_encode(speechish, 256)
    wav = codecs.wav_wrap(ad, 0x11, channels=1, block_align=256, bits=4,
                          wspb=123)  # block_align 256 implies 505
    with pytest.raises(NotImplementedError, match="wSamplesPerBlock"):
        _decode_wav(wav)


def test_wav_wrap_roundtrips_all_tags(speechish):
    for tag, enc in ((1, speechish.tobytes()),
                     (6, codecs.alaw_encode(speechish)),
                     (7, codecs.mulaw_encode(speechish))):
        wav = codecs.wav_wrap(enc, tag, channels=1, block_align=2,
                              bits=16 if tag == 1 else 8)
        dec = _decode_wav(wav)
        assert len(dec) == len(speechish)
