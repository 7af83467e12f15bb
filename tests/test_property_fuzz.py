"""Property-based differential fuzzing (hypothesis): for random geometries,
algorithms and byte patterns, the vectorized kernels must equal the naive
per-byte transliteration and satisfy the API contract invariants
(tests/chunkers_test.go:19-33). This is the randomized arm of the
reference's reference_test.go strategy.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_cdc_chunkers_spark.cdc import kernels, naive
from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts, resolve

ALGOS = [
    "fastcdc", "fastcdc-v1.0.0", "kfastcdc", "jc", "jc-v1.0.0", "jc-v1.1.0",
    "ultracdc", "ultracdc-v1.0.0", "fastcdc4stadia",
]
KEY = bytes((i * 7 + 3) & 0xFF for i in range(32))


@st.composite
def geometry(draw):
    # min < normal < max, normal pow2 (fastcdc requires it; others accept).
    nbits = draw(st.integers(min_value=7, max_value=11))
    normal = 1 << nbits
    mn = draw(st.integers(min_value=64, max_value=normal - 1))
    mx = draw(st.integers(min_value=normal + 1, max_value=normal * 8))
    return mn, normal, mx


@st.composite
def payload(draw):
    n = draw(st.integers(min_value=0, max_value=40_000))
    kind = draw(st.sampled_from(["random", "zeros", "repeat", "mixed"]))
    seed = draw(st.integers(min_value=0, max_value=2**31))
    rng = np.random.default_rng(seed)
    if kind == "zeros":
        return bytes(n)
    if kind == "repeat":
        pat = rng.integers(0, 256, draw(st.integers(1, 9)), dtype=np.uint8)
        return np.tile(pat, n // len(pat) + 1)[:n].tobytes()
    if kind == "mixed":
        a = rng.integers(0, 256, n // 2, dtype=np.uint8)
        return a.tobytes() + bytes(n - len(a))
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(algo=st.sampled_from(ALGOS), geom=geometry(), data=payload())
def test_fuzz_kernel_equals_naive(algo, geom, data):
    mn, normal, mx = geom
    opts = ChunkerOpts(min_size=mn, normal_size=normal, max_size=mx,
                       key=KEY if algo == "kfastcdc" else None)
    r = resolve(algo, opts)
    fast = kernels.split_lengths(r, data)
    assert fast == naive.split_naive(r, data)
    assert sum(fast) == len(data)
    assert all(l <= r.max_size for l in fast)
    assert all(l >= 1 for l in fast)
    # interior chunks never under MinSize (only the final chunk may be short)
    assert all(l >= r.min_size for l in fast[:-1])
