"""Golden fingerprint parity against the reference's own oracle.

tests/fixtures/golden.json is the reference's tests/testdata/golden.json
verbatim: 126 fingerprints = 7 algorithms (tests/harness_test.go:39-47) x 3
size profiles (:70-74) x 6 inputs (:100-129). A fingerprint is
{chunks, cuts_hash=sha256(LE-uint64 length sequence), content=sha256(bytes)}
(tests/golden_test.go:52-92); matching it means our cutpoints are
byte-for-byte identical to the reference's.

Input coverage: the 4 deterministic inputs (empty, one-byte, zeros-2x-maxmax,
repeat-2x-maxmax) are regenerated here exactly, giving 84/126 cases verified
bit-for-bit, including the keyed kfastcdc cases (which transitively pin the
pure-Python BLAKE3 keyed-XOF table derivation).

The 2 random inputs (tiny-64, random-3x-maxmax) are byte streams from Go's
math/rand rand.NewSource(0) (harness_test.go:101-107). That generator's
seeding constants (the Go runtime's rngCooked table) are not reproducible in
this sandbox (no Go toolchain, no network), so those 42 cases cannot be
replayed bit-exact; FIXTURES.md's fallback (snapshotting the streams) needs
the Go toolchain too. Instead, test_random_substitute_goldens freezes
locally-generated fingerprints over a documented numpy-seeded stream of the
same shape, produced by the naive oracle (itself validated by the 84 exact
cases + the differential matrix), guarding the same regression surface.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from go_cdc_chunkers_spark.cdc import kernels
from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts, resolve

FIXTURES = Path(__file__).parent / "fixtures"
GOLDEN = json.loads((FIXTURES / "golden.json").read_text())

ALGOS = [
    ("fastcdc", False),
    ("fastcdc-v1.0.0", False),
    ("kfastcdc", True),
    ("jc", False),
    ("jc-v1.0.0", False),
    ("ultracdc", False),
    ("fastcdc4stadia", False),
]
FIXED_KEY = bytes((i * 7 + 3) & 0xFF for i in range(32))
PROFILES = {
    "2K-8K-64K": (2 * 1024, 8 * 1024, 64 * 1024),
    "256K-512K-1M": (256 * 1024, 512 * 1024, 1024 * 1024),
    "1M-4M-16M": (1024 * 1024, 4 * 1024 * 1024, 16 * 1024 * 1024),
}
MAX_MAX = 16 * 1024 * 1024

_INPUT_CACHE: dict[str, bytes] = {}


def deterministic_input(name: str) -> bytes:
    if name not in _INPUT_CACHE:
        if name == "empty":
            data = b""
        elif name == "one-byte":
            data = b"\x42"
        elif name == "zeros-2x-maxmax":
            data = bytes(2 * MAX_MAX)
        elif name == "repeat-2x-maxmax":
            n = 2 * MAX_MAX
            pat = np.frombuffer(b"plakar", dtype=np.uint8)
            data = np.tile(pat, n // 6 + 1)[:n].tobytes()
        else:
            raise KeyError(name)
        _INPUT_CACHE[name] = data
    return _INPUT_CACHE[name]


DETERMINISTIC_INPUTS = ["empty", "one-byte", "zeros-2x-maxmax", "repeat-2x-maxmax"]


@pytest.mark.parametrize("profile", list(PROFILES))
@pytest.mark.parametrize("algo,keyed", ALGOS)
def test_golden_deterministic(algo, keyed, profile):
    mn, nm, mx = PROFILES[profile]
    opts = ChunkerOpts(min_size=mn, normal_size=nm, max_size=mx,
                       key=FIXED_KEY if keyed else None)
    r = resolve(algo, opts)
    for input_name in DETERMINISTIC_INPUTS:
        want = GOLDEN[f"{algo}|{profile}|{input_name}"]
        got = kernels.fingerprint(r, deterministic_input(input_name))
        assert got == want, (algo, profile, input_name)


def substitute_random(n: int) -> bytes:
    # Documented substitute for Go rand.NewSource(0): numpy PCG64 seed 0.
    return np.random.default_rng(0).integers(0, 256, n, dtype=np.uint8).tobytes()


def test_random_substitute_goldens():
    """Self-goldens over a substitute random stream (see module docstring)."""
    path = FIXTURES / "golden_random_substitute.json"
    got = {}
    for name, n in [("pyrand-tiny-64", 64), ("pyrand-1p5x-maxmax", 3 * MAX_MAX // 2)]:
        data = substitute_random(n)
        for algo, keyed in ALGOS:
            for profile, (mn, nm, mx) in PROFILES.items():
                r = resolve(algo, ChunkerOpts(min_size=mn, normal_size=nm,
                                              max_size=mx,
                                              key=FIXED_KEY if keyed else None))
                got[f"{algo}|{profile}|{name}"] = kernels.fingerprint(r, data)
    if not path.exists():
        path.write_text(json.dumps(got, indent=1, sort_keys=True))
        pytest.skip("wrote substitute goldens (first run)")
    want = json.loads(path.read_text())
    assert got == want
