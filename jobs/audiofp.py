#!/usr/bin/env python3
"""Audio near-dup detection over a file tree via spectral landmark
fingerprints (operators/audio_fp.py) -- the audio-native channel that
recovers amplitude-perturbed duplicates chunk digests cannot see.

    python jobs/audiofp.py --path DIR [--glob '*.pcm'] \
        [--min-frac 0.25] [--min-matches 8] [--max-df 32] \
        [--fingerprints OUT_DIR]

Prints ONE JSON document: {"pairs": [(a, b, aligned_matches, match_frac)],
"n_clips": N, "n_fingerprints": M}. --fingerprints persists the landmark
relation (the stage boundary the matcher requires; reused across runs and
by downstream clustering). Cluster usage mirrors jobs/pipeline.py
(--py-files dist zip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True)
    ap.add_argument("--glob", default=None)
    ap.add_argument("--codec", default="pcm_s16le")
    ap.add_argument("--sr-hz", type=int, default=16000)
    ap.add_argument("--min-frac", type=float, default=0.25)
    ap.add_argument("--min-matches", type=int, default=8)
    ap.add_argument("--max-df", type=int, default=32)
    ap.add_argument("--fingerprints", default=None,
                    help="persist/reuse the landmark relation at this path")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from go_cdc_chunkers_spark.operators import audio_fp
    from go_cdc_chunkers_spark.session import get_spark
    from go_cdc_chunkers_spark.sources.files import clips_from_files

    spark = get_spark(app="audiofp", cpus=args.cpus)
    try:
        fp_dir = args.fingerprints or os.path.join(
            tempfile.mkdtemp(prefix="audiofp_"), "fp")
        if not os.path.exists(os.path.join(fp_dir, "_SUCCESS")):
            clips = clips_from_files(spark, args.path, glob=args.glob,
                                     codec=args.codec, sr_hz=args.sr_hz)
            audio_fp.spectral_fingerprints(clips).write.mode(
                "overwrite").parquet(fp_dir)
        fps = spark.read.parquet(fp_dir)
        pairs = audio_fp.fingerprint_pairs(
            fps, min_frac=args.min_frac, min_matches=args.min_matches,
            max_df=args.max_df,
        ).orderBy("a", "b")
        out = {
            "pairs": [[r.a, r.b, r.aligned_matches, round(r.match_frac, 4)]
                      for r in pairs.collect()],
            "n_clips": fps.select("clip_id").distinct().count(),
            "n_fingerprints": fps.count(),
            "fingerprints": fp_dir,
        }
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
