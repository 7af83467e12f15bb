"""Native (C/ctypes) kernels vs the vectorized numpy kernels.

kernels.split_lengths dispatches to cdc/native.py when a compiler exists,
so the rest of the suite exercises the native path; this file keeps the
numpy path covered by comparing the two directly on the differential input
matrix (both are independently validated against naive.py elsewhere).
"""

import numpy as np
import pytest

from go_cdc_chunkers_spark.cdc import kernels, native
from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts, family, resolve
from go_cdc_chunkers_spark.cdc.tables import GEAR, get_gear_table

ALGOS = ["fastcdc", "fastcdc-v1.0.0", "kfastcdc", "jc", "jc-v1.0.0",
         "jc-v1.1.0", "ultracdc", "ultracdc-v1.0.0", "fastcdc4stadia"]
KEY = bytes((i * 7 + 3) & 0xFF for i in range(32))


def _numpy_lengths(r, arr):
    fam = family(r.algorithm)
    if fam in ("fastcdc", "kfastcdc"):
        return kernels._fastcdc_lengths(arr, r, GEAR if fam == "fastcdc"
                                        else get_gear_table(r.key))
    if fam == "jc":
        return kernels._jc_lengths(arr, r, get_gear_table(r.key))
    if fam == "ultracdc":
        return kernels._ultracdc_lengths(arr, r)
    return kernels._stadia_lengths(arr, r)


def _table_for(r):
    fam = family(r.algorithm)
    if fam == "fastcdc":
        return GEAR
    if fam in ("kfastcdc", "jc"):
        return get_gear_table(r.key)
    return None


@pytest.mark.skipif(not native.available(), reason="no C compiler in image")
@pytest.mark.parametrize("algo", ALGOS)
def test_native_matches_numpy(algo):
    key = KEY if algo == "kfastcdc" else None
    fillers = {
        "random": np.random.default_rng(9).integers(0, 256, 600_000, dtype=np.uint8),
        "zeros": np.zeros(300_000, dtype=np.uint8),
        "block8": np.tile(np.arange(8, dtype=np.uint8), 40_000),
        "seq": (np.arange(500_000) % 256).astype(np.uint8),
    }
    for mn, nm, mx in [(64, 128, 256), (2048, 8192, 65536), (2048 + 1, 8192, 65536)]:
        r = resolve(algo, ChunkerOpts(min_size=mn, normal_size=nm, max_size=mx, key=key))
        for name, arr in fillers.items():
            got = native.split_lengths_native(r, arr, _table_for(r))
            want = _numpy_lengths(r, arr)
            assert got == want, (algo, (mn, nm, mx), name)


@pytest.mark.skipif(not native.available(), reason="no C compiler in image")
def test_native_edge_sizes():
    r = resolve("fastcdc-v1.0.0", ChunkerOpts(min_size=64, normal_size=128, max_size=256))
    for n in (0, 1, 63, 64, 65, 128, 255, 256, 257, 512):
        arr = (np.arange(n) % 251).astype(np.uint8)
        got = native.split_lengths_native(r, arr, GEAR)
        want = kernels._fastcdc_lengths(arr, r, GEAR)
        assert got == want, n
        assert sum(got) == n


def test_native_random_configs_vs_naive():
    """Seeded randomized sweep straight against the per-byte oracle
    (naive.py): random geometry x random fillers x all families. Catches C
    port edge cases the fixed matrix might miss (jump overshoot, LEST runs,
    spec_faithful switches)."""
    if not native.available():
        pytest.skip("no C compiler in image")
    from go_cdc_chunkers_spark.cdc import naive

    rng = np.random.default_rng(123)
    algos = ALGOS
    for case in range(40):
        algo = algos[case % len(algos)]
        key = KEY if algo == "kfastcdc" else None
        mn = int(rng.integers(16, 512))
        nm = mn * int(rng.integers(2, 6))
        mx = nm * int(rng.integers(2, 6))
        r = resolve(algo, ChunkerOpts(min_size=mn, normal_size=nm, max_size=mx, key=key))
        kind = case % 4
        n = int(rng.integers(0, 48_000))
        if kind == 0:
            arr = rng.integers(0, 256, n, dtype=np.uint8)
        elif kind == 1:
            arr = np.zeros(n, dtype=np.uint8)
        elif kind == 2:
            arr = np.tile(np.frombuffer(b"plakar", dtype=np.uint8), n // 6 + 1)[:n]
        else:
            arr = rng.integers(0, 4, n, dtype=np.uint8)  # low-entropy-ish
        got = native.split_lengths_native(r, arr, _table_for(r))
        want = naive.split_naive(r, arr.tobytes())
        assert got == want, (algo, (mn, nm, mx), kind, n)


def test_profile_kernels_tool_smoke():
    """tools/profile_kernels.py (the cmd/cdcprofile analogue) emits a sane
    breakdown: every rate positive, digest share in (0, 1)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    tool = Path(__file__).parent.parent / "tools" / "profile_kernels.py"
    r = subprocess.run(
        [sys.executable, str(tool), "--mb", "8", "--no-numpy-pass"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert len(out["algos"]) == 3
    for row in out["algos"]:
        assert row["scan_mb_s"] > 0 and row["total_mb_s"] > 0
        assert 0.0 < row["digest_share"] < 1.0


def _poly128_ref(data: bytes, lengths):
    """Pure-Python Horner reference of the poly128 digest."""
    from go_cdc_chunkers_spark.cdc.kernels import POLY128_P1, POLY128_P2

    M = 1 << 64
    out, pos = [], 0
    for ln in lengths:
        h1 = h2 = 1
        for b in data[pos:pos + ln]:
            h1 = (h1 * POLY128_P1 + b) % M
            h2 = (h2 * POLY128_P2 + b) % M
        out.append((h1, h2))
        pos += ln
    return out


def test_poly128_native_numpy_reference_agree():
    import numpy as np

    from go_cdc_chunkers_spark.cdc import kernels, native

    rng = np.random.default_rng(11)
    for trial in range(8):
        n = int(rng.integers(1, 50_000))
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        lengths = []
        left = n
        while left:
            ln = int(min(left, rng.integers(1, 4096)))
            lengths.append(ln)
            left -= ln
        ref = _poly128_ref(data, lengths)
        got_np = kernels._poly128_numpy(
            np.frombuffer(data, dtype=np.uint8), lengths)
        assert [tuple(map(int, r)) for r in got_np] == ref, trial
        if native.available():
            got_c = native.digest_poly128_native(
                np.frombuffer(data, dtype=np.uint8), lengths,
                kernels.POLY128_P1, kernels.POLY128_P2)
            assert [tuple(map(int, r)) for r in got_c] == ref, trial
    # empty stream -> no chunks, no digests
    assert kernels.digest_poly128(b"", []).shape == (0, 2)


def test_split_chunks_poly128_shape_and_determinism():
    import numpy as np

    from go_cdc_chunkers_spark.cdc import kernels
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts

    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    opts = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)
    a = kernels.split_chunks("fastcdc-v1.0.0", data, opts, digest="poly128")
    b = kernels.split_chunks("fastcdc-v1.0.0", data, opts, digest="poly128")
    sha = kernels.split_chunks("fastcdc-v1.0.0", data, opts, digest=True)
    assert a == b
    # identical cuts as the sha256 path; only the identity differs
    assert [(o, l) for o, l, _ in a] == [(o, l) for o, l, _ in sha]
    assert all(len(d) == 16 for _, _, d in a)
    # distinct chunks get distinct digests on this corpus
    assert len({d for _, _, d in a}) == len(a)
