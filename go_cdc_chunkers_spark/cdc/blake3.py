"""Minimal pure-Python BLAKE3 (hash, keyed hash, XOF output).

Implemented from the public BLAKE3 specification
(https://github.com/BLAKE3-team/BLAKE3-specs). Only what the keyed Gear-table
derivation needs (reference chunkers/fastcdc/fastcdc.go:43-75): keyed mode over
short inputs (<= a few KiB) with extendable output. Driver-side only -- it runs
once per key, never on the Spark hot path.

Correctness is pinned by tests: the official empty/abc digests, and the golden
kfastcdc fingerprints from the reference's tests/testdata/golden.json (which
transitively validate keyed mode + 2048-byte XOF).
"""

from __future__ import annotations

import struct

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3
KEYED_HASH = 1 << 4

_MASK = 0xFFFFFFFF
_BLOCK_LEN = 64
_CHUNK_LEN = 1024


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & _MASK


def _g(st: list[int], a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    st[a] = (st[a] + st[b] + mx) & _MASK
    st[d] = _rotr(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & _MASK
    st[b] = _rotr(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b] + my) & _MASK
    st[d] = _rotr(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & _MASK
    st[b] = _rotr(st[b] ^ st[c], 7)


def _compress(
    cv: tuple[int, ...], block_words: tuple[int, ...], counter: int,
    block_len: int, flags: int,
) -> list[int]:
    st = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        _IV[0], _IV[1], _IV[2], _IV[3],
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        _g(st, 0, 4, 8, 12, m[0], m[1])
        _g(st, 1, 5, 9, 13, m[2], m[3])
        _g(st, 2, 6, 10, 14, m[4], m[5])
        _g(st, 3, 7, 11, 15, m[6], m[7])
        _g(st, 0, 5, 10, 15, m[8], m[9])
        _g(st, 1, 6, 11, 12, m[10], m[11])
        _g(st, 2, 7, 8, 13, m[12], m[13])
        _g(st, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[_PERM[i]] for i in range(16)]
    for i in range(8):
        st[i] ^= st[i + 8]
        st[i + 8] ^= cv[i]
    return st


def _words(block: bytes) -> tuple[int, ...]:
    if len(block) < _BLOCK_LEN:
        block = block + b"\x00" * (_BLOCK_LEN - len(block))
    return struct.unpack("<16I", block)


def _chunk_output(
    key_words: tuple[int, ...], chunk: bytes, chunk_counter: int, flags: int
) -> tuple[tuple[int, ...], tuple[int, ...], int, int]:
    """Compress a <=1024-byte chunk; return (input_cv, last_block_words,
    last_block_len, last_flags) i.e. the *output node* before finalization,
    plus enough to emit ROOT/XOF from it."""
    blocks = [chunk[i : i + _BLOCK_LEN] for i in range(0, len(chunk), _BLOCK_LEN)]
    if not blocks:
        blocks = [b""]
    cv = key_words
    for i, blk in enumerate(blocks[:-1]):
        f = flags | (CHUNK_START if i == 0 else 0)
        cv = tuple(_compress(cv, _words(blk), chunk_counter, _BLOCK_LEN, f)[:8])
    last = blocks[-1]
    last_flags = flags | CHUNK_END | (CHUNK_START if len(blocks) == 1 else 0)
    return cv, _words(last), len(last), last_flags


def _node_cv(
    key_words: tuple[int, ...], chunk: bytes, chunk_counter: int, flags: int
) -> tuple[int, ...]:
    cv, bw, blen, bflags = _chunk_output(key_words, chunk, chunk_counter, flags)
    return tuple(_compress(cv, bw, chunk_counter, blen, bflags)[:8])


def _root_xof(
    cv: tuple[int, ...], block_words: tuple[int, ...], block_len: int,
    flags: int, out_len: int,
) -> bytes:
    out = bytearray()
    t = 0
    while len(out) < out_len:
        st = _compress(cv, block_words, t, block_len, flags | ROOT)
        out += struct.pack("<16I", *st)
        t += 1
    return bytes(out[:out_len])


def _hash_tree(key_words: tuple[int, ...], data: bytes, flags: int, out_len: int) -> bytes:
    n_chunks = max(1, (len(data) + _CHUNK_LEN - 1) // _CHUNK_LEN)
    if n_chunks == 1:
        cv, bw, blen, bflags = _chunk_output(key_words, data, 0, flags)
        return _root_xof(cv, bw, blen, bflags, out_len)
    # Chaining values for each full chunk, then a binary tree of parents.
    cvs = [
        _node_cv(key_words, data[i * _CHUNK_LEN : (i + 1) * _CHUNK_LEN], i, flags)
        for i in range(n_chunks)
    ]
    # Reduce with the BLAKE3 tree rule: left subtree is the largest power of
    # two of chunks strictly less than the total.
    def reduce(cvs_: list[tuple[int, ...]]) -> tuple[int, ...]:
        if len(cvs_) == 1:
            return cvs_[0]
        split = 1 << (len(cvs_) - 1).bit_length() - 1
        left = reduce(cvs_[:split])
        right = reduce(cvs_[split:])
        block = left + right
        return tuple(_compress(key_words, block, 0, _BLOCK_LEN, flags | PARENT)[:8])

    if len(cvs) == 2:
        block = cvs[0] + cvs[1]
        return _root_xof(key_words, block, _BLOCK_LEN, flags | PARENT, out_len)
    split = 1 << (len(cvs) - 1).bit_length() - 1
    left = reduce(cvs[:split])
    right = reduce(cvs[split:])
    return _root_xof(key_words, left + right, _BLOCK_LEN, flags | PARENT, out_len)


def blake3_hash(data: bytes, out_len: int = 32) -> bytes:
    """Unkeyed BLAKE3 digest (blake3.Sum256 analogue, fastcdc.go:47)."""
    return _hash_tree(_IV, data, 0, out_len)


def blake3_keyed_xof(key: bytes, data: bytes, out_len: int) -> bytes:
    """Keyed BLAKE3 with XOF output (blake3.NewKeyed + Digest().Read,
    fastcdc.go:52-64). key must be 32 bytes."""
    if len(key) != 32:
        raise ValueError("BLAKE3 key must be exactly 32 bytes")
    key_words = struct.unpack("<8I", key)
    return _hash_tree(key_words, data, KEYED_HASH, out_len)
