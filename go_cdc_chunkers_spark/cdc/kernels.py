"""Vectorized whole-stream CDC kernels (numpy; no Spark imports).

These are the hot-path kernels the pandas UDFs call. They reproduce the
reference's cutpoints byte-for-byte (differential-tested against naive.py and
the reference's own golden fingerprints) while staying vectorized:

  Gear family (FastCDC fastcdc.go:225-253, JC jc.go:205-244, Stadia
  fastcdc4stadia.go:77-149): the rolling hash fp = (fp << 1) + G[b] forgets
  bytes older than 64 steps (shifted out mod 2^64), so the *steady-state*
  value at every position of the whole clip is computable in 6 shifted-add
  passes (log-doubling). Cut/jump events are sparse (mask hit probability
  ~2^-popcount(mask)), so we precompute the event positions once with
  np.flatnonzero and the per-window scan becomes a binary search, with an
  exact tiny-prefix fixup for the first 63 positions after each hash reset.

  UltraCDC (ultracdc.go:101-240): the Hamming distance to 0xAA over a sliding
  8-byte window is a plain sliding sum (cumsum), and the low-entropy-string
  path is a run-length of equal adjacent 8-byte blocks -- both global,
  alignment-independent precomputes.

Everything is O(len(data)) vector work + O(#chunks + #events) Python.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from . import naive
from .opts import (
    MASK64,
    ULTRACDC_MASK_L,
    ULTRACDC_MASK_S,
    ChunkerOpts,
    ResolvedOpts,
    family,
    resolve,
)
from .tables import GEAR, GEAR64, HAMMING_0xAA, get_gear_table

_U64 = np.uint64

# Scratch-buffer pool: large temporaries are reused across calls because this
# is a per-row kernel -- on a 100 TB run each Python worker would otherwise
# malloc/free hundreds of MB per clip, and large first-touch allocations are
# slow and jittery. One pool per process (Spark Python workers are
# per-executor-core processes, so there is no sharing/contention).
_POOL: dict[str, np.ndarray] = {}


def _scratch(slot: str, n: int, dtype) -> np.ndarray:
    a = _POOL.get(slot)
    if a is None or a.dtype != np.dtype(dtype) or len(a) < n:
        a = np.empty(max(n, 1 << 16), dtype)
        _POOL[slot] = a
    return a[:n]


# Cache-blocked precompute: the Gear hash intermediates (8-byte lookups, the
# 6 doubling passes, mask tests) would otherwise stream ~250 bytes of DRAM
# traffic per input byte, which saturates this machine's memory bandwidth at
# ~8 concurrent workers (measured: local[32] *slower* than local[8]). Doing
# the same work in 128K-position blocks keeps every intermediate in cache --
# DRAM sees the input once plus the ~1 byte/position boolean outputs, so the
# kernel scales with cores, not bus width. The 63-byte overlap reproduces the
# rolling hash's finite memory across block edges. 64K positions measured
# best under concurrency (per-core throughput flat from 2 to 8 workers;
# 128K+ blocks contend on shared L3).
_BLOCK = 1 << 16


def _gear_hits_blocked(
    table: np.ndarray, data: np.ndarray, masks: list[int], slots: list[str]
) -> list[np.ndarray]:
    """Boolean hit arrays out[m][i] = ((SS[i] & masks[m]) == 0), blockwise."""
    N = len(data)
    outs = [_scratch(s, N, bool) for s in slots]
    m64 = [_U64(m) for m in masks]
    for start in range(0, N, _BLOCK):
        end = min(start + _BLOCK, N)
        lo = max(0, start - 63)
        g = _scratch("blk_g", end - lo, np.uint64)
        np.take(table, data[lo:end], out=g)
        F = _gear_steady(g, slot="blk_f")
        seg = F[start - lo :]
        tmp = _scratch("blk_t", end - start, np.uint64)
        for m, out in zip(m64, outs):
            np.bitwise_and(seg, m, out=tmp)
            np.equal(tmp, _U64(0), out=out[start:end])
    return outs




def _gear_steady(g: np.ndarray, slot: str = "gs_small") -> np.ndarray:
    """F[i] = sum_{s=0}^{min(63,i)} g[i-s] << s  (mod 2^64), by log-doubling.

    For i >= 63 this equals the rolling hash fp at i for *any* reset point at
    least 64 steps back; for i < 63 it is the exact prefix from index 0.
    """
    n = len(g)
    F = _scratch(slot, n, np.uint64)
    F[:] = g
    tmp = _scratch(slot + "_tmp", n, np.uint64)
    shift = 1
    while shift < 64 and shift < n:
        np.left_shift(F[: n - shift], _U64(shift), out=tmp[shift:])
        F[shift:] += tmp[shift:]
        shift *= 2
    return F


def _first_true(hits: np.ndarray, lo: int, hi: int) -> int:
    """First index in [lo, hi) where hits is True, or -1.

    np.argmax short-circuits on bool input, so the cost is the distance to
    the first hit, not the range size."""
    if lo >= hi:
        return -1
    seg = hits[lo:hi]
    idx = int(np.argmax(seg))
    if seg[idx]:
        return lo + idx
    return -1


# ---------------------------------------------------------------------------
# FastCDC (fastcdc.go:225-253)
# ---------------------------------------------------------------------------

def _fastcdc_lengths(data: np.ndarray, r: ResolvedOpts, table: np.ndarray) -> list[int]:
    N = len(data)
    if N == 0:
        return []
    mask_s, mask_l = _U64(r.mask_s), _U64(r.mask_l)
    zs, zl = _gear_hits_blocked(table, data, [r.mask_s, r.mask_l], ["fc_zs", "fc_zl"])
    min_size, max_size = r.min_size, r.max_size

    lengths: list[int] = []
    pos = 0
    while pos < N:
        n = min(N - pos, max_size)
        if n <= min_size:
            lengths.append(n)
            break
        normal = r.normal_size if n > r.normal_size else n
        cut = -1
        # Exact prefix region [min, min(min+63, n)): fp has < 64 terms.
        hi = min(min_size + 63, n)
        seg = _gear_steady(table[data[pos + min_size : pos + hi]])
        masks = np.where(
            np.arange(min_size, hi) < normal, mask_s, mask_l
        ).astype(np.uint64)
        hit = np.flatnonzero((seg & masks) == 0)
        if hit.size:
            cut = min_size + int(hit[0])
        if cut < 0 and min_size + 63 < n:
            # Steady maskS region [min+63, normal), then maskL [normal, n).
            s_hi = min(normal, n)
            if min_size + 63 < s_hi:
                q = _first_true(zs, pos + min_size + 63, pos + s_hi)
                if q >= 0:
                    cut = q - pos
            if cut < 0:
                l_lo = max(normal, min_size + 63)
                if l_lo < n:
                    q = _first_true(zl, pos + l_lo, pos + n)
                    if q >= 0:
                        cut = q - pos
        if cut < 0:
            cut = n
        lengths.append(cut)
        pos += cut
    return lengths


# ---------------------------------------------------------------------------
# JC (jc.go:205-244)
# ---------------------------------------------------------------------------

def _jc_lengths(data: np.ndarray, r: ResolvedOpts, table: np.ndarray) -> list[int]:
    N = len(data)
    if N == 0:
        return []
    mask_c, mask_j = r.mask_c, r.mask_j
    # zc[q] answers the cut test (maskJ subset-of maskC in every config the
    # reference ships, but we store both so the walk never needs SS values).
    zj, zc = _gear_hits_blocked(table, data, [mask_j, mask_c], ["jc_zj", "jc_zc"])
    min_size, max_size, normal_size = r.min_size, r.max_size, r.normal_size
    jump = r.jump_length

    lengths: list[int] = []
    pos = 0
    while pos < N:
        n = min(N - pos, max_size)
        if not r.spec_faithful and n <= normal_size:
            lengths.append(n)
            break
        cut = -1
        i = min_size  # local scan index; fp == 0 before processing index i
        while i < n:
            # Exact region [i, min(i+63, n)): fp has < 64 terms since reset.
            hi = min(i + 63, n)
            seg = _gear_steady(table[data[pos + i : pos + hi]])
            ev = np.flatnonzero((seg & _U64(mask_j)) == 0)
            if ev.size:
                p = i + int(ev[0])
                if int(seg[ev[0]]) & mask_c == 0:
                    cut = p
                    break
                i = p + jump
                continue
            if hi >= n:
                break
            # Steady region from i+63 on: use global events.
            q = _first_true(zj, pos + i + 63, pos + n)
            if q < 0:
                break
            if zc[q]:
                cut = q - pos
                break
            i = (q - pos) + jump
        if cut < 0:
            cut = n
        lengths.append(cut)
        pos += cut
    return lengths


# ---------------------------------------------------------------------------
# UltraCDC (ultracdc.go:101-240)
# ---------------------------------------------------------------------------

def _ultracdc_lengths(data: np.ndarray, r: ResolvedOpts) -> list[int]:
    N = len(data)
    if N == 0:
        return []
    min_size, max_size, normal0 = r.min_size, r.max_size, r.normal_size
    spec = r.spec_faithful

    if N < min_size + 16:
        # Too short for any in-window scan (K == 0 in every window): each
        # window returns n whole.
        lengths = []
        pos = 0
        while pos < N:
            n = min(N - pos, max_size)
            lengths.append(n)
            pos += n
        return lengths

    h = _scratch("uc_h", N, np.int32)
    np.take(HAMMING_0xAA, data, out=h)
    cs = _scratch("uc_cs", N + 1, np.int64)
    cs[0] = 0
    np.cumsum(h, out=cs[1:])
    # W[p] = sum h[p..p+7] for p in [0, N-8]; the distance of window [p, p+8).
    W = _scratch("uc_w", N - 7, np.int64)
    np.subtract(cs[8:], cs[: N - 7], out=W)
    hit_s = _scratch("uc_hs", N - 7, bool)
    hit_l = _scratch("uc_hl", N - 7, bool)
    tmp = _scratch("uc_tmp", N - 7, np.int64)
    np.bitwise_and(W, ULTRACDC_MASK_S, out=tmp)
    np.equal(tmp, 0, out=hit_s)
    np.bitwise_and(W, ULTRACDC_MASK_L, out=tmp)
    np.equal(tmp, 0, out=hit_l)
    cS = _scratch("uc_cS", N - 6, np.int64)
    cS[0] = 0
    np.cumsum(hit_s, out=cS[1:])
    cL = _scratch("uc_cL", N - 6, np.int64)
    cL[0] = 0
    np.cumsum(hit_l, out=cL[1:])
    # beq[t] = data[t] == data[t-8]; eq8[p] = block [p,p+8) == block [p-8,p).
    beq = _scratch("uc_beq", N, bool)
    beq[: min(8, N)] = False
    if N > 8:
        np.equal(data[8:], data[:-8], out=beq[8:])
    ce = _scratch("uc_ce", N + 1, np.int64)
    ce[0] = 0
    np.cumsum(beq, out=ce[1:])

    lengths: list[int] = []
    pos = 0
    while pos < N:
        n = min(N - pos, max_size)
        if n <= min_size or n < min_size + 8:
            lengths.append(n)
            pos += n
            continue
        normal = normal0 if n > normal0 else n
        # Blocks i = min+8, min+16, ..., while i <= n-8 -- evaluated in
        # segments with early exit, so a window that cuts after k blocks
        # costs O(k), not O(window).
        K = (n - 8 - (min_size + 8)) // 8 + 1 if n - 8 >= min_size + 8 else 0
        cut = -1
        i0 = pos + min_size + 8
        seg_sz = max(128, min(4096, (normal - min_size) // 4))
        k_base = 0
        carry = 0  # consecutive-equal-block run carried across segments
        while k_base < K and cut < 0:
            kseg = min(seg_sz, K - k_base)
            blk = i0 + 8 * (k_base + np.arange(kseg, dtype=np.int64))
            eq = (ce[blk + 8] - ce[blk]) == 8
            neq = ~eq
            # Low-entropy run length at each block (incl. carry-in).
            idx = np.arange(kseg, dtype=np.int64)
            last_neq = np.maximum.accumulate(np.where(neq, idx, np.int64(-1)))
            run = np.where(
                eq,
                np.where(last_neq < 0, idx + 1 + carry, idx - last_neq),
                0,
            )
            lest_hit = run >= 64
            k_lest = int(np.argmax(lest_hit)) if lest_hit.any() else kseg
            # Mask hit inside an unequal block: dist windows start at blk-8+j.
            use_l = (blk - pos) >= normal
            anyS = (cS[blk] - cS[blk - 8]) > 0
            anyL = (cL[blk] - cL[blk - 8]) > 0
            cand = neq & np.where(use_l, anyL, anyS)
            k_hit = int(np.argmax(cand)) if cand.any() else kseg
            if k_lest < kseg and k_lest < k_hit:
                cut = (min_size + 8 + 8 * (k_base + k_lest)) + 8
            elif k_hit < kseg:
                p0 = int(blk[k_hit]) - 8
                hits = hit_l[p0 : p0 + 8] if use_l[k_hit] else hit_s[p0 : p0 + 8]
                j = int(np.argmax(hits))
                i_local = min_size + 8 + 8 * (k_base + k_hit)
                cut = i_local + 8 if spec else i_local + j
            else:
                carry = int(run[-1]) if bool(eq[-1]) else 0
                k_base += kseg
        if cut < 0:
            cut = n
        lengths.append(cut)
        pos += cut
    return lengths


# ---------------------------------------------------------------------------
# FastCDC4Stadia (fastcdc4stadia.go:77-149)
# ---------------------------------------------------------------------------

def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values, fully vectorized.

    Split into 32-bit halves; each half fits float64 exactly, so frexp's
    exponent IS the bit length (frexp(v) = (m, e) with v = m*2^e, 0.5<=m<1;
    frexp(0) = (0, 0)). No masked writes (those dominated the profile)."""
    hi = x >> _U64(32)
    lo = x & _U64(0xFFFFFFFF)
    _, e_hi = np.frexp(hi.astype(np.float64))
    _, e_lo = np.frexp(lo.astype(np.float64))
    return np.where(hi > 0, e_hi + 32, e_lo).astype(np.int16)


def _stadia_lengths(data: np.ndarray, r: ResolvedOpts) -> list[int]:
    N = len(data)
    if N == 0:
        return []
    min_size, max_size = r.min_size, r.max_size
    if min_size < 64:
        # The MaxUint64 hash init is not fully shifted out before MinSize;
        # fall back to the exact naive scan (test-only geometry).
        b = data.tobytes()
        return naive.split_naive(r, b)
    thresh = _U64(MASK64 // (r.normal_size - min_size + 1))
    # Blocked precompute (see _gear_hits_blocked rationale): B = bitlen of
    # the steady-state hash at each position; thr = (hash <= thresh).
    B = _scratch("st_b", N, np.int16)
    thr = _scratch("st_thr", N, bool)
    for start in range(0, N, _BLOCK):
        end = min(start + _BLOCK, N)
        lo = max(0, start - 63)
        gblk = _scratch("blk_g", end - lo, np.uint64)
        np.take(GEAR64, data[lo:end], out=gblk)
        F = _gear_steady(gblk, slot="blk_f")
        seg = F[start - lo :]
        B[start:end] = _bitlen_u64(seg)
        np.less_equal(seg, thresh, out=thr[start:end])

    lengths: list[int] = []
    pos = 0
    while pos < N:
        n = min(N - pos, max_size)
        if n <= min_size:
            lengths.append(n)
            break
        # hash checked at local index p equals SS[pos+p-1] (warmup covers
        # exactly 64 bytes before MinSize, so the all-ones init is gone).
        lo, hi = pos + min_size - 1, pos + n - 1
        # Records: positions passing hash & regressionMask == 0, i.e. bitlen
        # <= best-so-far (first check always passes: mask starts at 0).
        # Segmented with early exit: the expected cut distance is
        # ~(normal-min), so scanning the full MaxSize window wastes ~8x.
        seg_sz = max(4096, r.normal_size - min_size)
        best = 255  # > any 64-bit bitlen -> first check passes
        k_last = -1
        cut = -1
        s0 = lo
        while s0 < hi and cut < 0:
            s1 = min(s0 + seg_sz, hi)
            Bseg = B[s0:s1]
            rmin = np.minimum.accumulate(Bseg)
            rec = np.empty(len(Bseg), dtype=bool)
            rec[0] = Bseg[0] <= best
            np.less_equal(Bseg[1:], np.minimum(rmin[:-1], np.int16(best)), out=rec[1:])
            cutc = rec & thr[s0:s1]
            j = int(np.argmax(cutc))
            if cutc[j]:
                cut = min_size + (s0 - lo) + j
                break
            recs = np.flatnonzero(rec)
            if recs.size:
                k_last = (s0 - lo) + int(recs[-1])
            best = min(best, int(rmin[-1]))
            s0 = s1
        if cut < 0:
            # Post-loop: hash now includes byte n-1 -> SS[pos+n-1].
            if k_last < 0 or int(B[pos + n - 1]) <= best:
                cut = n
            else:
                cut = min_size + k_last
        lengths.append(cut)
        pos += cut
    return lengths


# ---------------------------------------------------------------------------
# Fixed (fixed.go:74-79)
# ---------------------------------------------------------------------------

def _fixed_lengths(n_total: int, size: int) -> list[int]:
    full, rem = divmod(n_total, size)
    out = [size] * full
    if rem:
        out.append(rem)
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def split_lengths(algorithm_or_opts, data: bytes | np.ndarray, opts: ChunkerOpts | None = None) -> list[int]:
    """Chunk lengths of the whole stream; sum(lengths) == len(data).

    Accepts either an algorithm name (+ optional ChunkerOpts) or an already
    resolved ResolvedOpts. Empty input -> [].
    """
    if isinstance(algorithm_or_opts, ResolvedOpts):
        r = algorithm_or_opts
    else:
        r = resolve(algorithm_or_opts, opts)
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    fam = family(r.algorithm)
    # Fast path: scalar C kernels (cdc/native.py; ~30x the numpy throughput).
    # Falls through to the vectorized numpy kernels when no compiler exists
    # or SPARK_GRAFT_NO_NATIVE is set; both are differentially tested.
    from . import native

    if native.available():
        if fam == "fastcdc":
            table = GEAR
        elif fam in ("kfastcdc", "jc"):
            table = get_gear_table(r.key)
        else:
            table = None
        got = native.split_lengths_native(r, arr, table)
        if got is not None:
            return got
    if fam == "fastcdc":
        return _fastcdc_lengths(arr, r, GEAR)
    if fam == "kfastcdc":
        return _fastcdc_lengths(arr, r, get_gear_table(r.key))
    if fam == "jc":
        return _jc_lengths(arr, r, get_gear_table(r.key))
    if fam == "ultracdc":
        return _ultracdc_lengths(arr, r)
    if fam == "stadia":
        return _stadia_lengths(arr, r)
    return _fixed_lengths(len(arr), r.normal_size)


# poly128 multipliers: odd (invertible mod 2^64), fixed forever -- digests
# are persisted identities, so these are part of the on-disk format.
POLY128_P1 = 0x9E3779B185EBCA87
POLY128_P2 = 0xC2B2AE3D27D4EB4F


def _poly128_numpy(arr: np.ndarray, lengths) -> np.ndarray:
    """Closed form of the C kernel's Horner loop: H_p = p^L + sum_i d[i] *
    p^(L-1-i) (mod 2^64 -- numpy uint64 wraps like C). Vectorized over each
    chunk's bytes via a power-dot; scratch is one powers table up to the
    longest chunk, never O(data)."""
    out = np.empty((len(lengths), 2), dtype=np.uint64)
    if not len(lengths):
        return out
    maxlen = int(max(lengths))
    for j, p in enumerate((POLY128_P1, POLY128_P2)):
        pw = np.empty(maxlen + 1, dtype=np.uint64)
        pw[0] = 1
        if maxlen:
            np.multiply.accumulate(
                np.full(maxlen, p, dtype=np.uint64), out=pw[1:])
        pos = 0
        # mod-2^64 wraparound is the digest definition; silence numpy's
        # overflow warning for the scalar adds (C kernel wraps identically)
        with np.errstate(over="ignore"):
            for c, ln in enumerate(lengths):  # chunk lengths are always >= 1
                seg = arr[pos:pos + ln].astype(np.uint64)
                out[c, j] = pw[ln] + np.sum(seg * pw[ln - 1::-1])
                pos += ln
    return out


def digest_poly128(data: bytes | np.ndarray, lengths) -> np.ndarray:
    """(n_chunks, 2) uint64 digest words for consecutive chunks of `data`.
    C kernel when compiled (one pass, no per-chunk call overhead; see
    tools/profile_kernels.py for why sha256 dominates chunking cost),
    numpy closed form otherwise; both differentially pinned vs the
    pure-Python Horner reference in tests/test_native.py."""
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray, memoryview)) else data)
    from . import native

    if native.available():
        got = native.digest_poly128_native(arr, lengths, POLY128_P1, POLY128_P2)
        if got is not None:
            return got
    return _poly128_numpy(arr, lengths)


def split_chunks(
    algorithm_or_opts, data: bytes, opts: ChunkerOpts | None = None,
    digest: bool | str = True,
):
    """(offset, length, digest) triples, the Split() output shape
    (chunkers.go:214-232). digest: True/"sha256" = the per-chunk sha256 of
    cmd/cdc/stats.go:135 (the reference-parity identity; default);
    "poly128" = 16-byte LE poly128 words (the cheap identity for the
    near-dup path); False = empty."""
    if digest not in (True, False, "sha256", "poly128"):
        raise ValueError(
            f"unknown digest kind {digest!r}: expected True/'sha256', "
            "'poly128', or False")
    lengths = split_lengths(algorithm_or_opts, data, opts)
    if digest == "poly128":
        packed = np.ascontiguousarray(
            digest_poly128(data, lengths), dtype="<u8").tobytes()
        out = []
        pos = 0
        for i, ln in enumerate(lengths):
            out.append((pos, ln, packed[16 * i:16 * i + 16]))
            pos += ln
        return out
    out = []
    pos = 0
    mv = memoryview(data)  # no per-chunk slice copies in the digest loop
    for ln in lengths:
        d = hashlib.sha256(mv[pos : pos + ln]).digest() if digest else b""
        out.append((pos, ln, d))
        pos += ln
    return out


def fingerprint(algorithm_or_opts, data: bytes, opts: ChunkerOpts | None = None) -> dict:
    """The golden-test fingerprint (tests/golden_test.go:52-92): chunk count,
    sha256 over the LE-uint64 length sequence, sha256 of the content."""
    lengths = split_lengths(algorithm_or_opts, data, opts)
    h = hashlib.sha256()
    for ln in lengths:
        h.update(struct.pack("<Q", ln))
    return {
        "chunks": len(lengths),
        "cuts_hash": h.hexdigest(),
        "content": hashlib.sha256(data).hexdigest(),
    }
