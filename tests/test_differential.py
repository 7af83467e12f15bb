"""Differential tests: vectorized kernels vs the naive per-byte oracle.

Mirrors the reference's reference_test.go matrices
(chunkers/{fastcdc,jc,ultracdc}/reference_test.go): boundary lengths around
min/normal/max x filler patterns x size configs, for every registered
algorithm. Also asserts the API contract: no chunk < MinSize except the final
one, none > MaxSize, and reconstruction (sum of lengths) == input length
(tests/chunkers_test.go:19-33).
"""

import numpy as np
import pytest

from go_cdc_chunkers_spark.cdc import kernels, naive
from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts, resolve

ALGOS = [
    "fastcdc",
    "fastcdc-v1.0.0",
    "kfastcdc",
    "jc",
    "jc-v1.0.0",
    "jc-v1.1.0",
    "ultracdc",
    "ultracdc-v1.0.0",
    "fastcdc4stadia",
    "fixed-v1.0.0",
]

KEY = bytes((i * 7 + 3) & 0xFF for i in range(32))

# (min, normal, max) configs; mirrors reference_test.go:24-40 shapes.
CONFIGS = [
    (64, 128, 256),
    (64, 512, 4096),
    (100, 180, 300),  # non-pow2 normal (jc/ultracdc accept it)
    (2048, 8192, 65536),
]

FILLERS = ["random", "zeros", "seq", "block8", "repeat6"]


def make_data(filler: str, n: int, seed: int = 1234) -> bytes:
    if filler == "zeros":
        return bytes(n)
    if filler == "seq":
        return bytes(np.arange(n, dtype=np.int64).astype(np.uint8))
    if filler == "block8":
        return bytes(np.repeat(np.arange((n + 7) // 8, dtype=np.int64), 8).astype(np.uint8)[:n])
    if filler == "repeat6":
        pat = np.frombuffer(b"plakar", dtype=np.uint8)
        return bytes(np.tile(pat, n // 6 + 1)[:n])
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def lengths_for(algo, data, cfg):
    mn, nm, mx = cfg
    if algo == "fixed-v1.0.0":
        # fixed requires pow2 normal and min=max=normal (fixed.go:49-72)
        nm = 1 << (nm.bit_length() - 1)
        opts = ChunkerOpts(normal_size=nm, key=None)
    else:
        key = KEY if algo == "kfastcdc" else None
        opts = ChunkerOpts(min_size=mn, normal_size=nm, max_size=mx, key=key)
    r = resolve(algo, opts)
    return r, kernels.split_lengths(r, data)


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("cfg", CONFIGS[:3])
@pytest.mark.parametrize("filler", FILLERS)
def test_kernel_equals_naive(algo, cfg, filler):
    mn, nm, mx = cfg
    if algo in ("fastcdc", "fastcdc-v1.0.0", "kfastcdc") and nm & (nm - 1):
        pytest.skip("fastcdc requires pow2 normal")
    boundary = sorted(
        {0, 1, mn - 1, mn, mn + 1, nm, mx - 1, mx, mx + 1, 2 * mx, 3 * mx + 17}
    )
    for n in boundary:
        data = make_data(filler, n)
        r, fast = lengths_for(algo, data, cfg)
        slow = naive.split_naive(r, data)
        assert fast == slow, (algo, cfg, filler, n, fast[:5], slow[:5])


@pytest.mark.parametrize("algo", ALGOS)
def test_contract_invariants(algo):
    # No chunk > MaxSize; no chunk < MinSize except the final; reconstruction.
    data = make_data("random", 300_000, seed=7)
    r, lens = lengths_for(algo, data, (2048, 8192, 65536))
    assert sum(lens) == len(data)
    assert all(l <= r.max_size for l in lens)
    assert all(l >= r.min_size for l in lens[:-1])
    # Determinism / batch-size invariance analogue: same result twice.
    assert lens == kernels.split_lengths(r, data)


@pytest.mark.parametrize("algo", ALGOS)
def test_empty_and_tiny(algo):
    for n in (0, 1, 2, 63):
        data = make_data("random", n)
        r, lens = lengths_for(algo, data, (64, 128, 256))
        assert sum(lens) == n
        assert lens == naive.split_naive(r, data)
    assert lengths_for(algo, b"", (64, 128, 256))[1] == []


def test_default_geometry_larger_random():
    # One bigger randomized run per algorithm at the default geometry, so the
    # sparse-event fast paths cross many windows.
    data = make_data("random", 1_500_000, seed=99)
    for algo in ALGOS:
        r, fast = lengths_for(algo, data, (2048, 8192, 65536))
        assert sum(fast) == len(data)
        slow = naive.split_naive(r, data)
        assert fast == slow, algo
