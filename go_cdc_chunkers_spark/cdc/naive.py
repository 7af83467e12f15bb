"""Naive per-byte reference implementation of every chunking algorithm.

Slow, test-only: this is the transliterated *semantic oracle* against which
the vectorized kernels (kernels.py) are differentially tested, mirroring how
the reference keeps naive implementations in its reference_test.go files
(chunkers/fastcdc/reference_test.go:64-122, chunkers/jc/reference_test.go:58-105,
chunkers/ultracdc/reference_test.go:87-147).

Each `*_cutpoint` function mirrors one Algorithm(opts, data, n) -> int:
  - fastcdc:   chunkers/fastcdc/fastcdc.go:225-253
  - jc:        chunkers/jc/jc.go:205-244
  - ultracdc:  chunkers/ultracdc/ultracdc.go:101-240
  - stadia:    chunkers/fastcdc4stadia/fastcdc4stadia.go:77-149
  - fixed:     chunkers/fixed/fixed.go:74-79

`split_naive` mirrors the Chunker.Next/Split drive loop (chunkers.go:160-232):
peek up to MaxSize, run Algorithm, advance; empty input yields no chunks
(zero-length chunks are skipped, tests/harness_test.go:134-149).
"""

from __future__ import annotations

from .opts import (
    MASK64,
    ULTRACDC_LEST,
    ULTRACDC_MASK_L,
    ULTRACDC_MASK_S,
    ResolvedOpts,
    family,
)
from .tables import GEAR, GEAR64, HAMMING_0xAA, get_gear_table

_U64_MAX = MASK64


def fastcdc_cutpoint(r: ResolvedOpts, data: bytes, n: int, table=None) -> int:
    min_size, max_size, normal_size = r.min_size, r.max_size, r.normal_size
    if n <= min_size:
        return n
    if n >= max_size:
        n = max_size
    elif n <= normal_size:
        normal_size = n

    g = [int(v) for v in (table if table is not None else get_gear_table(r.key))]
    fp = 0
    mask = r.mask_s
    for i in range(min_size, n):
        if i == normal_size:
            mask = r.mask_l
        fp = ((fp << 1) + g[data[i]]) & MASK64
        if fp & mask == 0:
            return i
    return n


def jc_cutpoint(r: ResolvedOpts, data: bytes, n: int, table=None) -> int:
    min_size, max_size, normal_size = r.min_size, r.max_size, r.normal_size
    if r.spec_faithful:
        if n >= max_size:
            n = max_size
    elif n <= normal_size:
        return n
    elif n >= max_size:
        n = max_size

    g = [int(v) for v in (table if table is not None else get_gear_table(r.key))]
    fp = 0
    i = min_size
    while i < n:
        fp = ((fp << 1) + g[data[i]]) & MASK64
        if fp & r.mask_j == 0:
            if fp & r.mask_c == 0:
                return i
            fp = 0
            i += r.jump_length
        else:
            i += 1
    return min(i, n)


def ultracdc_cutpoint(r: ResolvedOpts, data: bytes, n: int) -> int:
    min_size, max_size, normal_size = r.min_size, r.max_size, r.normal_size
    mask = ULTRACDC_MASK_S
    if n <= min_size:
        return n
    if n >= max_size:
        n = max_size
    elif n <= normal_size:
        normal_size = n
    if n < min_size + 8:
        return n

    lut = HAMMING_0xAA
    out_win = bytes(data[min_size : min_size + 8])
    dist = sum(int(lut[b]) for b in out_win)
    low_entropy_count = 0

    i = min_size + 8
    while i <= n - 8:
        if i >= normal_size:
            mask = ULTRACDC_MASK_L
        in_win = bytes(data[i : i + 8])
        if in_win == out_win:
            low_entropy_count += 1
            if low_entropy_count >= ULTRACDC_LEST:
                return i + 8
            i += 8
            continue
        low_entropy_count = 0
        for j in range(8):
            if dist & mask == 0:
                return i + 8 if r.spec_faithful else i + j
            dist += int(lut[data[i + j]]) - int(lut[data[i + j - 8]])
        out_win = in_win
        i += 8
    return n


def stadia_cutpoint(r: ResolvedOpts, data: bytes, n: int) -> int:
    min_size, max_size, normal_size = r.min_size, r.max_size, r.normal_size
    thresh = _U64_MAX // (normal_size - min_size + 1)
    if n <= min_size:
        return n
    if n >= max_size:
        n = max_size

    g = [int(v) for v in GEAR64]
    regression_len = n
    regression_mask = 0
    h = _U64_MAX
    i = min_size - 64 if min_size > 64 else 0
    while i < min_size:
        h = ((h << 1) + g[data[i]]) & MASK64
        i += 1
    while i < n:
        if h & regression_mask == 0:
            if h <= thresh:
                return i
            regression_len = i
            regression_mask = _U64_MAX
            while h & regression_mask:
                regression_mask = (regression_mask << 1) & MASK64
        h = ((h << 1) + g[data[i]]) & MASK64
        i += 1
    if h & regression_mask:
        return regression_len
    return i


def fixed_cutpoint(r: ResolvedOpts, data: bytes, n: int) -> int:
    if n < r.normal_size:
        return n
    return r.normal_size


def cutpoint(r: ResolvedOpts, data: bytes, n: int) -> int:
    fam = family(r.algorithm)
    if fam in ("fastcdc", "kfastcdc"):
        return fastcdc_cutpoint(r, data, n)
    if fam == "jc":
        return jc_cutpoint(r, data, n)
    if fam == "ultracdc":
        return ultracdc_cutpoint(r, data, n)
    if fam == "stadia":
        return stadia_cutpoint(r, data, n)
    return fixed_cutpoint(r, data, n)


def split_naive(r: ResolvedOpts, data: bytes) -> list[int]:
    """Chunk lengths for the whole stream (chunkers.go:160-232 drive loop).

    Empty input -> [] (the reference's Next returns one zero-length chunk
    which every consumer skips: harness_test.go:140)."""
    lengths: list[int] = []
    pos = 0
    total = len(data)
    while pos < total:
        n = min(total - pos, r.max_size)
        cut = cutpoint(r, data[pos : pos + n], n)
        assert 0 < cut <= n, (cut, n)
        lengths.append(cut)
        pos += cut
    return lengths
