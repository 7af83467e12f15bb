"""Lookup tables for the CDC kernels.

Parity sources (data, not code):
  - GEAR: the 256-entry Gear table shared by FastCDC and JC
    (reference: chunkers/fastcdc/fastcdc_precomputed.go:4-261, identical copy at
    chunkers/jc/jc_precomputed.go:4-261).
  - GEAR64: FastCDC4Stadia's 64-bit table
    (reference: chunkers/fastcdc4stadia/fastcdc4stadia.go:152-238).
  - HAMMING_0xAA: per-byte popcount(b ^ 0xAA)
    (reference: chunkers/ultracdc/ultracdc_precomputed.go:55 -- derived here,
    it is a pure function of the byte value).

Keyed tables (kfastcdc) are derived per reference
chunkers/fastcdc/fastcdc.go:43-75: BLAKE3 keyed hasher over the 256 static
GEAR entries (LE uint64 each), then a 2048-byte XOF digest read as 256 LE
uint64 values. Cached by BLAKE3-256 digest of the key, exactly like the
reference's process-wide sync.Map cache.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from . import _tables_data
from .blake3 import blake3_hash, blake3_keyed_xof

GEAR = np.array(_tables_data.GEAR, dtype=np.uint64)
GEAR64 = np.array(_tables_data.GEAR64, dtype=np.uint64)

# Per-byte Hamming distance to 0xAA (ultracdc_precomputed.go:55); int32 so
# sliding-window sums never overflow.
HAMMING_0xAA = np.array(
    [bin(b ^ 0xAA).count("1") for b in range(256)], dtype=np.int32
)

# Integrity pins: sha256 over the little-endian uint64 serialization, asserted
# by tests so silent corruption of the extracted tables is impossible.
GEAR_SHA256 = _tables_data.GEAR_SHA256
GEAR64_SHA256 = _tables_data.GEAR64_SHA256


def table_sha256(table: np.ndarray) -> str:
    return hashlib.sha256(
        b"".join(struct.pack("<Q", int(v)) for v in table)
    ).hexdigest()


# key-digest (hex) -> derived table; mirrors keyedTableCache (fastcdc.go:37).
_keyed_cache: dict[str, np.ndarray] = {}


def get_gear_table(key: bytes | None) -> np.ndarray:
    """Return the Gear table for `key` (reference fastcdc.go:43-75).

    None -> the shared static table. Otherwise derive: BLAKE3(keyed=key) over
    the 256 GEAR entries serialized LE, read a 2048-byte XOF digest, split
    into 256 LE uint64. Memoized by BLAKE3-256(key).
    """
    if key is None:
        return GEAR
    cache_key = blake3_hash(key).hex()
    cached = _keyed_cache.get(cache_key)
    if cached is not None:
        return cached
    msg = b"".join(struct.pack("<Q", int(v)) for v in GEAR)
    digest = blake3_keyed_xof(key, msg, 8 * 256)
    table = np.frombuffer(digest, dtype="<u8").astype(np.uint64)
    _keyed_cache[cache_key] = table
    return table
