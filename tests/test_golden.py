"""Golden fingerprint parity against the reference's own oracle.

tests/fixtures/golden.json is the reference's tests/testdata/golden.json
verbatim: 126 fingerprints = 7 algorithms (tests/harness_test.go:39-47) x 3
size profiles (:70-74) x 6 inputs (:100-129). A fingerprint is
{chunks, cuts_hash=sha256(LE-uint64 length sequence), content=sha256(bytes)}
(tests/golden_test.go:52-92); matching it means our cutpoints are
byte-for-byte identical to the reference's.

All 126 cases replay bit-exact, including the two random inputs (tiny-64,
random-3x-maxmax) drawn from Go's math/rand rand.NewSource(0)
(harness_test.go:101-107): cdc/gorand.py regenerates Go's rngCooked seeding
table offline by jumping the lagged-Fibonacci recurrence 7.8e12 steps with
polynomial exponentiation over Z/2^64, so the exact byte streams are
reproduced without the Go toolchain.  The `content` field of each golden
(sha256 of the raw input) independently pins the streams; the keyed
kfastcdc cases transitively pin the pure-Python BLAKE3 keyed-XOF table
derivation.
"""

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

from go_cdc_chunkers_spark.cdc import gorand, kernels
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


def golden_input(name: str) -> bytes:
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
        elif name == "tiny-64":
            data = gorand.read_bytes(64)
        elif name == "random-3x-maxmax":
            data = gorand.read_bytes(3 * MAX_MAX)
        else:
            raise KeyError(name)
        _INPUT_CACHE[name] = data
    return _INPUT_CACHE[name]


ALL_INPUTS = ["empty", "one-byte", "tiny-64", "random-3x-maxmax",
              "zeros-2x-maxmax", "repeat-2x-maxmax"]


@pytest.mark.parametrize("profile", list(PROFILES))
@pytest.mark.parametrize("algo,keyed", ALGOS)
def test_golden(algo, keyed, profile):
    """All 126 reference fingerprints, byte-for-byte."""
    mn, nm, mx = PROFILES[profile]
    opts = ChunkerOpts(min_size=mn, normal_size=nm, max_size=mx,
                       key=FIXED_KEY if keyed else None)
    r = resolve(algo, opts)
    for input_name in ALL_INPUTS:
        want = GOLDEN[f"{algo}|{profile}|{input_name}"]
        got = kernels.fingerprint(r, golden_input(input_name))
        assert got == want, (algo, profile, input_name)


# ---------------------------------------------------------------------------
# gorand internals: the jump machinery and the reconstructed streams
# ---------------------------------------------------------------------------

def test_gorand_jump_matches_direct_simulation():
    vec0 = gorand._srand_vec(1, (20, 10, 0))
    for n in (1, 5, 606, 607, 608, 1000, 5000):
        assert np.array_equal(gorand.vrand_direct(vec0, n),
                              gorand.jump_state(vec0, n)), n


def test_gorand_streams_match_reference_content_hashes():
    # sha256 of the raw inputs as recorded by the reference goldens
    tiny = GOLDEN["fastcdc-v1.0.0|2K-8K-64K|tiny-64"]["content"]
    big = GOLDEN["fastcdc-v1.0.0|2K-8K-64K|random-3x-maxmax"]["content"]
    assert hashlib.sha256(golden_input("tiny-64")).hexdigest() == tiny
    assert hashlib.sha256(golden_input("random-3x-maxmax")).hexdigest() == big


def test_gorand_read_is_prefix_stable():
    # Read(64) must be a prefix of Read(1024) (same fresh Source(0) stream),
    # mirroring the harness's fresh rand.New per input.
    assert gorand.read_bytes(1024)[:64] == gorand.read_bytes(64)


def test_regen_golden_tool_byte_identical():
    """tools/regen_golden.py --check: the kernels alone re-emit the exact
    fixture bytes (the reference's `-update` flow, golden_test.go:44)."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "tools" / "regen_golden.py"),
         "--check"],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
