"""Regenerate Go math/rand's rngCooked table offline, then verify by
reproducing rand.New(rand.NewSource(0)).Read streams against the
reference golden `content` hashes (tests/fixtures/golden.json).

Background: the reference harness (tests/harness_test.go:101-107) builds its
two random inputs from Go's additive lagged-Fibonacci generator
(x[n] = x[n-273] + x[n-607] mod 2^64).  Seeding that generator requires the
607-entry rngCooked constant table, which the Go authors produced by running
the LFG 7.8e12 steps from srand(1) (math/rand/gen_cooked.go).  Running
7.8e12 steps directly is infeasible in Python, but the step map is LINEAR
over Z/2^64, so t^N mod (t^607 - t^334 - 1) computed by square-and-multiply
(86 polynomial multiplications of 607 coefficients) jumps the whole distance
in seconds.

Public knowledge only: the Mitchell/Reeds LFG parameters, the minstd Lehmer
seeder (a=48271, m=2^31-1, q=44488, r=3399), and gen_cooked.go's structure
are all in the public Go source tree; no proprietary material.

Verification oracle: sha256(first 64 bytes) must equal the reference's
golden `content` for input tiny-64:
  565966bd0e0cedaa92f154c2d17abfa4c5f98a668cef2e20b0855558e0583db9
"""
from __future__ import annotations

import hashlib
import sys

import numpy as np

LEN = 607
TAP = 273
M31 = (1 << 31) - 1
MASK63 = (1 << 63) - 1
U64 = np.uint64

TARGET_TINY64 = "565966bd0e0cedaa92f154c2d17abfa4c5f98a668cef2e20b0855558e0583db9"


def seedrand(x: int) -> int:
    """Lehmer minstd step with Schrage's trick (exact Go semantics)."""
    hi, lo = divmod(x, 44488)
    x = 48271 * lo - 3399 * hi
    if x < 0:
        x += M31
    return x


def srand_vec(seed: int, shifts=(20, 10, 0)) -> np.ndarray:
    """gen_cooked.go srand: initial rngVec (uint64, wraps later via numpy)."""
    seed %= M31
    if seed < 0:
        seed += M31
    if seed == 0:
        seed = 89482311
    x = seed
    vec = np.zeros(LEN, dtype=np.uint64)
    for i in range(-20, LEN):
        x = seedrand(x)
        if i >= 0:
            u = 0
            for si, sh in enumerate(shifts):
                if si > 0:
                    x = seedrand(x)
                u ^= (x << sh) & ((1 << 64) - 1)
            vec[i] = u
    return vec


# ---------------------------------------------------------------------------
# Polynomial arithmetic over Z/2^64 mod f(t) = t^607 - t^334 - 1
# (recurrence x_n = x_{n-273} + x_{n-607}  =>  t^607 == t^334 + 1)
# ---------------------------------------------------------------------------

def poly_reduce(c: np.ndarray) -> np.ndarray:
    c = c.astype(np.uint64, copy=True)
    while len(c) > LEN:
        h = c[LEN:]
        c = c[:LEN].copy()
        # t^(607+j) == t^(334+j) + t^j
        add1 = np.zeros(LEN + len(h) - TAP, dtype=np.uint64)  # 334+j may exceed 606
        add1[334:334 + len(h)] += h
        add1[:len(h)] += h
        if len(add1) > LEN:
            pad = np.zeros(len(add1), dtype=np.uint64)
            pad[:LEN] = c
            c = pad + add1
        else:
            c[:len(add1)] += add1
    out = np.zeros(LEN, dtype=np.uint64)
    out[:len(c)] = c
    return out


def poly_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    conv = np.zeros(2 * LEN - 1, dtype=np.uint64)
    for i in range(LEN):
        if a[i]:
            conv[i:i + LEN] += a[i] * b
    return poly_reduce(conv)


def t_pow(n: int) -> np.ndarray:
    """t^n mod f, coefficients uint64."""
    result = np.zeros(LEN, dtype=np.uint64)
    result[0] = 1
    base = np.zeros(LEN, dtype=np.uint64)
    base[1] = 1
    while n:
        if n & 1:
            result = poly_mul(result, base)
        n >>= 1
        if n:
            base = poly_mul(base, base)
    return result


def poly_shift1(c: np.ndarray) -> np.ndarray:
    """c * t mod f."""
    hi = c[LEN - 1]
    out = np.empty(LEN, dtype=np.uint64)
    out[1:] = c[:-1]
    out[0] = hi
    out[334] += hi
    return out


def jump_state(vec_init: np.ndarray, n_steps: int) -> np.ndarray:
    """Final rngVec array after n_steps vrand() calls from vec_init.

    Emission index map (derived from gen_cooked.go's feed/tap walk,
    validated against direct simulation below): step s writes array
    position (334 - s) mod 607; x_j for j<=0 is vec_init[(334 - j) % 607].
    """
    # basis vector v[j] = x_{j-606} = vec_init[(334-(j-606)) % 607]
    v = np.empty(LEN, dtype=np.uint64)
    for j in range(LEN):
        v[j] = vec_init[(334 - (j - 606)) % LEN]
    q = t_pow(n_steps)  # exponent for x_{N-606} is (N-606)+606 = N
    final = np.zeros(LEN, dtype=np.uint64)
    for idx, s in enumerate(range(n_steps - 606, n_steps + 1)):
        final[(334 - s) % LEN] = np.sum(q * v, dtype=np.uint64)
        if idx < LEN - 1:
            q = poly_shift1(q)
    return final


def vrand_direct(vec: np.ndarray, n: int) -> np.ndarray:
    """Reference direct simulation (for validating jump_state on small n)."""
    vec = vec.copy()
    tap, feed = 0, LEN - TAP
    for _ in range(n):
        tap = (tap - 1) % LEN
        feed = (feed - 1) % LEN
        x = np.uint64(vec[feed] + vec[tap])
        vec[feed] = x
    return vec


# ---------------------------------------------------------------------------
# rng.go: Seed + Uint64 + rand.Read
# ---------------------------------------------------------------------------

def go_seed_vec(seed: int, cooked: np.ndarray) -> np.ndarray:
    seed %= M31
    if seed < 0:
        seed += M31
    if seed == 0:
        seed = 89482311
    x = seed
    vec = np.zeros(LEN, dtype=np.uint64)
    for i in range(-20, LEN):
        x = seedrand(x)
        if i >= 0:
            u = (x << 40) & ((1 << 64) - 1)
            x = seedrand(x)
            u ^= (x << 20)
            x = seedrand(x)
            u ^= x
            u ^= int(cooked[i])
            vec[i] = u
    return vec


def go_rand_read(n: int, cooked: np.ndarray) -> bytes:
    """rand.New(rand.NewSource(0)).Read(make([]byte, n)) -- 7 low bytes per
    Int63 (math/rand/rand.go read())."""
    vec = go_seed_vec(0, cooked)
    tap, feed = 0, LEN - TAP
    out = bytearray()
    n_vals = (n + 6) // 7
    for _ in range(n_vals):
        tap = (tap - 1) % LEN
        feed = (feed - 1) % LEN
        x = np.uint64(vec[feed] + vec[tap])
        vec[feed] = x
        val = int(x) & MASK63
        for _b in range(7):
            out.append(val & 0xFF)
            val >>= 8
    return bytes(out[:n])


def main():
    # 1. validate jump machinery vs direct simulation
    vec0 = srand_vec(1)
    for n in (1, 5, 606, 607, 608, 1000, 5000):
        d = vrand_direct(vec0, n)
        j = jump_state(vec0, n)
        assert np.array_equal(d, j), f"jump mismatch at n={n}"
    print("jump machinery validated vs direct simulation")

    # 2. candidate parameterizations of gen_cooked.go (memory-uncertain bits)
    n_steps = int(7.8e12)
    candidates = []
    for shifts in [(20, 10, 0), (40, 20, 0)]:
        vec_init = srand_vec(1, shifts)
        final = jump_state(vec_init, n_steps)
        for mask63 in (True, False):
            cooked = (final & np.uint64(MASK63)) if mask63 else final
            candidates.append((f"shifts={shifts} mask63={mask63} order=array", cooked))
            # alternate dump order: starting at feed
            feed = (334 - n_steps) % LEN
            rot = np.roll(cooked, -feed)
            candidates.append((f"shifts={shifts} mask63={mask63} order=feed-rot", rot))

    for desc, cooked in candidates:
        got = hashlib.sha256(go_rand_read(64, cooked)).hexdigest()
        mark = "  <-- MATCH" if got == TARGET_TINY64 else ""
        print(f"{desc}: {got[:16]}{mark}")
        if got == TARGET_TINY64:
            np.save("/tmp/rngcooked.npy", cooked)
            print("saved /tmp/rngcooked.npy")
            return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
