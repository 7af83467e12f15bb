"""Hand-derived cutpoint unit vectors, straight from the reference unit tests
(FIXTURES.md F3): these pin the behavioural spec independently of goldens.
"""

import numpy as np
import pytest

from go_cdc_chunkers_spark.cdc import kernels, naive
from go_cdc_chunkers_spark.cdc.opts import (
    ChunkerOpts,
    ChunkerError,
    ResolvedOpts,
    calculate_masks,
    embed_mask,
    generate_spaced_mask,
    resolve,
    validate,
)


def test_ultracdc_low_entropy_cut():
    # ultracdc_test.go:89-114: zeros, min=64 normal=512 max=4096,
    # n = 64 + 8*72 -> 64 consecutive identical windows force cut at min+8*65.
    r = resolve("ultracdc", ChunkerOpts(min_size=64, normal_size=512, max_size=4096))
    n = 64 + 8 * 72
    data = bytes(n)
    assert naive.ultracdc_cutpoint(r, data, n) == 64 + 8 * 65
    assert kernels.split_lengths(r, data)[0] == 64 + 8 * 65


def test_ultracdc_mask_s_early_cut():
    # ultracdc_test.go:116-145: data[min:min+8]=0xAA (dist 0) -> maskS match
    # at the first in-window check -> cut = min+8 (legacy returns i+j with j=0
    # -> i = min+8).
    mn = 64
    r = resolve("ultracdc", ChunkerOpts(min_size=mn, normal_size=2048, max_size=4096))
    data = bytearray(4096)
    for t in range(mn, mn + 8):
        data[t] = 0xAA
    data[mn + 8] = 0xAB  # make the next window differ
    got = naive.ultracdc_cutpoint(r, bytes(data), len(data))
    assert got == mn + 8
    assert kernels.split_lengths(r, bytes(data))[0] == mn + 8


def test_ultracdc_mask_l_early_cut():
    # ultracdc_test.go:147-172: same but normal = min+8 so the block at
    # i = min+8 >= normal uses maskL.
    mn = 64
    r = resolve("ultracdc", ChunkerOpts(min_size=mn, normal_size=mn + 8, max_size=4096))
    data = bytearray(4096)
    for t in range(mn, mn + 8):
        data[t] = 0xAA
    data[mn + 8] = 0xAB
    assert naive.ultracdc_cutpoint(r, bytes(data), len(data)) == mn + 8


def test_ultracdc_spec_window_edge():
    # ultracdc_test.go:230-264: spec variant returns the window's right edge
    # i+8 regardless of the matching j.
    mn = 64
    legacy = resolve("ultracdc", ChunkerOpts(min_size=mn, normal_size=2048, max_size=4096))
    spec = resolve("ultracdc-v1.0.0", ChunkerOpts(min_size=mn, normal_size=2048, max_size=4096))
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    cl = naive.ultracdc_cutpoint(legacy, data, len(data))
    cspec = naive.ultracdc_cutpoint(spec, data, len(data))
    if cl != len(data):
        # spec cut is the enclosing window's right edge: legacy i+j, spec i+8.
        assert cspec - cl in range(0, 9)
        assert (cspec - mn) % 8 == 0
    assert kernels.split_lengths(spec, data) == naive.split_naive(spec, data)


def test_ultracdc_short_tail_no_panic():
    # ultracdc_test.go:269-280: MinSize < n < MinSize+8 -> cut == n.
    for algo in ("ultracdc", "ultracdc-v1.0.0"):
        r = resolve(algo, ChunkerOpts(min_size=2048, normal_size=10240, max_size=65536))
        for n in (2049, 2050, 2052, 2055):
            data = bytes(n)
            assert naive.ultracdc_cutpoint(r, data, n) == n
            assert kernels.split_lengths(r, data) == [n]


def test_jc_immediate_cut_and_jump():
    # jc_test.go:360-415 semantics with synthetic masks/tables: build a
    # ResolvedOpts by hand to mirror the zero-G-table tricks.
    # Immediate cut: G table all zero -> fp stays 0, maskC=maskJ=1 -> at
    # i=MinSize fp&maskJ==0 and fp&maskC==0 -> cut = MinSize.
    r = ResolvedOpts(algorithm="jc", min_size=4, max_size=32, normal_size=5,
                     mask_c=1, mask_j=1, jump_length=3, spec_faithful=True)
    zero_table = [0] * 256
    data = bytes(10)
    assert naive.jc_cutpoint(r, data, 10, table=zero_table) == 4

    # Jump branch: G[7]=1, data[4]=7 -> fp=1 at i=4; maskJ=0 (always jump
    # branch), maskC=1 (fp&1 != 0 -> no cut) -> fp=0, i=4+3=7 >= n -> min(i,n)=7.
    r2 = ResolvedOpts(algorithm="jc", min_size=4, max_size=32, normal_size=5,
                      mask_c=1, mask_j=0, jump_length=3, spec_faithful=True)
    table = [0] * 256
    table[7] = 1
    data2 = bytes([0, 0, 0, 0, 7, 0, 0])
    assert naive.jc_cutpoint(r2, data2, 7, table=table) == 7


def test_jc_legacy_vs_spec_tail():
    # jc_test.go:270-317: legacy returns a final sub-NormalSize segment whole;
    # spec (jc-v1.1.0) scans it.
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    legacy = resolve("jc", ChunkerOpts(min_size=64, normal_size=8192, max_size=65536))
    spec = resolve("jc-v1.1.0", ChunkerOpts(min_size=64, normal_size=8192, max_size=65536))
    # n=5000 <= NormalSize: legacy cut == n always.
    assert naive.jc_cutpoint(legacy, data, 5000) == 5000
    # spec scans: must equal the naive spec scan (may or may not cut early).
    assert kernels.split_lengths(spec, data) == naive.split_naive(spec, data)


def test_sub_min_returns_n():
    for algo in ("fastcdc", "jc-v1.1.0", "ultracdc", "fastcdc4stadia"):
        r = resolve(algo, ChunkerOpts(min_size=128, normal_size=256, max_size=512))
        data = bytes(100)
        assert naive.cutpoint(r, data, 100) == 100


def test_mask_derivations():
    # fastcdc_test.go:317-388 analogues: spaced masks & defaults.
    assert generate_spaced_mask(0) == 0
    assert generate_spaced_mask(64) == 0xFFFFFFFFFFFFFFFF
    assert generate_spaced_mask(70) == 0xFFFFFFFFFFFFFFFF
    m = generate_spaced_mask(13)
    assert bin(m).count("1") == 13
    assert m >> 63 == 1  # first bit at position 63
    s, l = calculate_masks(8192, 2)  # 13 bits -> 15 / 11 ones
    assert bin(s).count("1") == 15 and bin(l).count("1") == 11
    assert embed_mask(0b1011000) == 0b1010000
    assert embed_mask(0) == 0
    # legacy default geometry uses fixed masks
    r = resolve("fastcdc-v1.0.0", ChunkerOpts(min_size=2048, normal_size=8192, max_size=65536))
    assert r.mask_s == 0x0003590703530000 and r.mask_l == 0x0000D90003530000
    # non-default geometry on the versioned algo computes spaced masks
    r2 = resolve("fastcdc-v1.0.0", ChunkerOpts(min_size=4096, normal_size=16384, max_size=131072))
    assert r2.mask_s == calculate_masks(16384, 2)[0]
    # legacy algo keeps fixed masks regardless of geometry
    r3 = resolve("fastcdc", ChunkerOpts(min_size=4096, normal_size=16384, max_size=131072))
    assert r3.mask_s == 0x0003590703530000


def test_jc_jump_length():
    # jc.go:157-164: normal=8192 -> bits=13, c=12, j=11 -> 2^23/(4096-2048)=4096.
    r = resolve("jc", None)
    assert r.jump_length == 4096
    assert r.mask_c == 0x590003570000 and r.mask_j == 0x590003560000


def test_defaults_per_algorithm():
    # chunkers.go:86-98 + per-algo DefaultOptions.
    assert resolve("ultracdc", None).normal_size == 10 * 1024
    assert resolve("fastcdc", None).min_size == 2048
    f = resolve("fixed-v1.0.0", None)
    assert (f.min_size, f.normal_size, f.max_size) == (65536, 65536, 65536)
    # partial defaulting: only zero fields are filled
    r = resolve("fastcdc", ChunkerOpts(min_size=1024))
    assert (r.min_size, r.normal_size, r.max_size) == (1024, 8192, 65536)


def test_validation_errors():
    with pytest.raises(ChunkerError, match="unknown algorithm"):
        resolve("nope", None)
    with pytest.raises(ChunkerError, match="power of two"):
        validate(resolve("fastcdc", ChunkerOpts(min_size=64, normal_size=100, max_size=400)))
    with pytest.raises(ChunkerError, match="MinSize"):
        validate(resolve("ultracdc", ChunkerOpts(min_size=32, normal_size=128, max_size=512)))
    with pytest.raises(ChunkerError, match="MaxSize"):
        validate(resolve("jc", ChunkerOpts(min_size=64, normal_size=128, max_size=128)))
    with pytest.raises(ChunkerError, match="key is required"):
        validate(resolve("kfastcdc", ChunkerOpts(min_size=64, normal_size=128, max_size=512)))
    with pytest.raises(ChunkerError, match="single size"):
        # fixed Setup forces min=max=normal, then validates; direct validate
        # with mismatched sizes must fail (fixed.go:68-70)
        validate(ResolvedOpts(algorithm="fixed-v1.0.0", min_size=64,
                              max_size=128, normal_size=128))
    # fixed Setup validates eagerly (fixed.go:58)
    with pytest.raises(ChunkerError, match="power of two"):
        resolve("fixed-v1.0.0", ChunkerOpts(normal_size=100))


def test_registry_contract():
    # D6 (chunkers.go:59-67): 10 names, duplicate registration errors.
    from go_cdc_chunkers_spark.cdc.registry import ALGORITHMS

    assert len(ALGORITHMS.names()) == 10
    assert "fastcdc-v1.0.0" in ALGORITHMS and "fixed-v1.0.0" in ALGORITHMS
    with pytest.raises(ChunkerError, match="already registered"):
        ALGORITHMS.register("fastcdc", lambda r, d: [])
    with pytest.raises(ChunkerError, match="unknown algorithm"):
        ALGORITHMS.split_lengths("nope", b"xx")
    assert sum(ALGORITHMS.split_lengths("fixed-v1.0.0", bytes(100_000))) == 100_000


def test_distribution_semantics_match_go():
    # stats.go:91-116: index-based percentiles, truncated avg, population
    # stddev -- checked against a direct Python transliteration.
    import math
    import numpy as np
    rng = np.random.default_rng(2)
    lengths = sorted(int(x) for x in rng.integers(100, 10_000, 333))
    mn, mx = lengths[0], lengths[-1]
    p50 = lengths[len(lengths) * 50 // 100]
    p95 = lengths[len(lengths) * 95 // 100]
    mean = sum(lengths) / len(lengths)
    avg = int(mean)
    stddev = math.sqrt(sum((l - mean) ** 2 for l in lengths) / len(lengths))
    # Spark path
    from go_cdc_chunkers_spark.session import get_spark
    from go_cdc_chunkers_spark.operators.stats import distribution
    spark = get_spark(app="dist-test", cpus=4, shuffle_partitions=4)
    df = spark.createDataFrame([("a", l) for l in lengths], "algo string, length int")
    row = distribution(df).collect()[0]
    assert (row.min_len, row.p50, row.avg_len, row.p95, row.max_len) == (mn, p50, avg, p95, mx)
    assert abs(row.stddev_len - stddev) < 1e-9
