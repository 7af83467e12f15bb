#!/usr/bin/env python3
"""CPU-cost breakdown of the chunking path -- the repo's analogue of the
reference's profiling harness (cmd/cdcprofile + profiling/profiling.go,
which wraps pprof around Chunker.Next). No pprof exists for the mixed
numpy/C/JVM path, so this measures the same question directly: where does
a chunked byte go -- cutpoint scan, sha256 digest, or framework overhead?

Per algorithm it reports, over a deterministic PRNG corpus:
  scan_mb_s          cutpoint scan only (digest=False), native kernel if
                     compiled (cdc/native.py), else numpy;
  scan_numpy_mb_s    the same with SPARK_GRAFT_NO_NATIVE=1 (subprocess);
  digest_mb_s        incremental cost of sha256 over the found chunks
                     (total - scan, expressed as standalone MB/s);
  sha256_floor_mb_s  hashlib.sha256 over the whole buffer -- the hard
                     floor no chunker can beat while digesting;
  total_mb_s         split_chunks(digest=True), the Split() shape.

Prints one JSON line; --md appends a markdown table to stdout. Warm-up
runs precede timing (Firecracker first-touch pages + scratch-pool fill;
see cdc/kernels._scratch and BASELINE.md).

Usage: python tools/profile_kernels.py [--mb 256] [--md]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALGOS = ("fastcdc-v1.0.0", "ultracdc-v1.0.0", "jc-v1.1.0")


def _corpus(mb: int) -> bytes:
    import numpy as np

    rng = np.random.default_rng(20260816)
    return rng.integers(0, 256, size=mb * 1_000_000, dtype=np.uint8).tobytes()


def _time(fn, warmups: int = 2, reps: int = 3) -> float:
    for _ in range(warmups):
        fn()
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best


def profile_one(algo: str, data: bytes) -> dict:
    from go_cdc_chunkers_spark.cdc import kernels

    mb = len(data) / 1e6
    t_scan = _time(lambda: kernels.split_lengths(algo, data))
    t_total = _time(lambda: kernels.split_chunks(algo, data, digest=True))
    t_poly = _time(lambda: kernels.split_chunks(algo, data, digest="poly128"))
    t_sha = _time(lambda: hashlib.sha256(data).digest())
    t_digest = max(t_total - t_scan, 1e-9)
    return {
        "algo": algo,
        "scan_mb_s": round(mb / t_scan, 1),
        "digest_mb_s": round(mb / t_digest, 1),
        "sha256_floor_mb_s": round(mb / t_sha, 1),
        "total_mb_s": round(mb / t_total, 1),
        "total_poly128_mb_s": round(mb / t_poly, 1),
        "digest_share": round(t_digest / t_total, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=int(os.environ.get("SPARK_GRAFT_PROFILE_MB", "256")))
    ap.add_argument("--md", action="store_true")
    ap.add_argument("--no-numpy-pass", action="store_true",
                    help="skip the SPARK_GRAFT_NO_NATIVE subprocess pass")
    args = ap.parse_args()

    from go_cdc_chunkers_spark.cdc import native

    data = _corpus(args.mb)
    rows = [profile_one(a, data) for a in ALGOS]
    numpy_err = None

    if native.available() and not args.no_numpy_pass:
        # numpy-fallback numbers from a child process (native caches per
        # process, so the env var must be set before first use)
        # rates are size-independent; the numpy scan at ~13-50 MB/s does not
        # need the full corpus to stabilize
        r = subprocess.run(
            [sys.executable, __file__, "--mb", str(min(args.mb, 32)), "--no-numpy-pass"],
            capture_output=True, text=True,
            env=dict(os.environ, SPARK_GRAFT_NO_NATIVE="1"),
            timeout=3600,
        )
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode == 0 and lines:
            numpy_rows = {x["algo"]: x for x in json.loads(lines[-1])["algos"]}
            for row in rows:
                row["scan_numpy_mb_s"] = numpy_rows[row["algo"]]["scan_mb_s"]
        else:
            # a partial report must be distinguishable from a skipped pass
            print(f"numpy pass failed (exit {r.returncode}): "
                  f"{r.stderr.strip()[-400:]}", file=sys.stderr)
            numpy_err = f"exit {r.returncode}"

    out = {
        "metric": "kernel_profile",
        "corpus_mb": args.mb,
        "native_kernel": native.available(),
        "algos": rows,
    }
    if numpy_err:
        out["numpy_pass_error"] = numpy_err
    print(json.dumps(out))

    if args.md:
        print("\n| algo | scan MB/s | scan(numpy) | digest MB/s | sha256 floor | total MB/s | total(poly128) | digest share |")
        print("|---|---|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['algo']} | {r['scan_mb_s']} | {r.get('scan_numpy_mb_s', '-')} "
                  f"| {r['digest_mb_s']} | {r['sha256_floor_mb_s']} "
                  f"| {r['total_mb_s']} | {r['total_poly128_mb_s']} | {r['digest_share']} |")


if __name__ == "__main__":
    main()
