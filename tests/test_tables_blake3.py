"""Table integrity + BLAKE3 correctness pins.

Mirrors the reference's table provenance: GEAR must be byte-identical to
chunkers/fastcdc/fastcdc_precomputed.go:4-261 (== jc_precomputed.go), GEAR64
to fastcdc4stadia.go:152-238, HAMMING_0xAA to ultracdc_precomputed.go:55.
"""

import re
from pathlib import Path

import numpy as np

from go_cdc_chunkers_spark.cdc import tables
from go_cdc_chunkers_spark.cdc.blake3 import blake3_hash, blake3_keyed_xof

REF = Path("/root/reference")


def test_gear_sha256_pins():
    assert tables.table_sha256(tables.GEAR) == tables.GEAR_SHA256
    assert tables.table_sha256(tables.GEAR64) == tables.GEAR64_SHA256


def test_gear_matches_reference_sources():
    hexes = re.compile(r"0x[0-9a-fA-F]+")
    for path, table in [
        (REF / "chunkers/fastcdc/fastcdc_precomputed.go", tables.GEAR),
        (REF / "chunkers/jc/jc_precomputed.go", tables.GEAR),
    ]:
        text = path.read_text()
        vals = [int(m, 16) for m in hexes.findall(text[text.index("uint64"):])][:256]
        assert vals == [int(v) for v in table]


def test_hamming_lut_matches_reference():
    text = (REF / "chunkers/ultracdc/ultracdc_precomputed.go").read_text()
    decl = text[text.rindex("var hammingDistanceTo0xAA") :]
    body = decl[decl.index("{") + 1 : decl.index("}")]
    vals = [int(v) for v in body.replace("\n", " ").split(",") if v.strip()]
    assert vals == [int(v) for v in tables.HAMMING_0xAA]


def test_blake3_known_vectors():
    # Official BLAKE3 digests (public test vectors).
    assert (
        blake3_hash(b"").hex()
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert (
        blake3_hash(b"abc").hex()
        == "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"
    )
    # XOF: first 32 bytes of a longer output must equal the 32-byte digest.
    assert blake3_hash(b"abc", 128)[:32] == blake3_hash(b"abc")
    k = bytes(range(32))
    assert blake3_keyed_xof(k, b"xyz", 99)[:32] == blake3_keyed_xof(k, b"xyz", 32)


def test_keyed_gear_table_properties():
    # Determinism + different keys differ + cache returns the same array
    # (mirrors fastcdc_test.go:780-1040 behaviours).
    k1 = bytes(i * 7 + 3 & 0xFF for i in range(32))
    k2 = bytes(32)
    t1 = tables.get_gear_table(k1)
    t1b = tables.get_gear_table(bytes(k1))
    t2 = tables.get_gear_table(k2)
    assert np.array_equal(t1, t1b)
    assert t1 is t1b  # cache hit
    assert not np.array_equal(t1, t2)
    assert not np.array_equal(t1, tables.GEAR)
    assert tables.get_gear_table(None) is tables.GEAR
