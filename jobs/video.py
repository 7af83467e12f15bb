#!/usr/bin/env python3
"""Video near-dup detection over a file tree of MJPEG AVIs
(operators/avi.py) -- frame-sampled perceptual hashing with temporal
alignment; the video face of the near-dup toolbox, symmetric to
jobs/audiofp.py. Mirrors the reference's corpus tooling walking arbitrary
file trees (/root/reference/cmd/cdc/stats.go:158-171), which hold video.

    python jobs/video.py --path DIR [--glob '*.avi'] [--every-n 1] \
        [--max-hamming 3] [--max-df 16] [--min-aligned 2] \
        [--max-band-df N] [--hashes OUT_DIR]

Prints ONE JSON document: {"pairs": [(a, b, offset, n_aligned,
n_matches)], "n_videos": N, "n_frame_hashes": M, "hashes": DIR}.
--every-n samples every Nth frame (byte slicing, 1/N of the decode --
measured 5x at N=6, BASELINE.md). --hashes persists the frame-hash
relation (the stage boundary: decode once, re-pair cheaply with different
thresholds). Cluster usage mirrors jobs/pipeline.py (--py-files dist zip).
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
    ap.add_argument("--glob", default="*.avi")
    ap.add_argument("--every-n", type=int, default=1)
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--max-df", type=int, default=16)
    ap.add_argument("--min-aligned", type=int, default=2)
    ap.add_argument("--max-band-df", type=int, default=None,
                    help="drop band buckets hotter than this before the "
                         "join (skew cap; trades recall, see avi.py)")
    ap.add_argument("--hashes", default=None,
                    help="persist/reuse the frame-hash relation at this path")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.operators import avi
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app="videodup", cpus=args.cpus)
    try:
        hash_dir = args.hashes or os.path.join(
            tempfile.mkdtemp(prefix="videodup_"), "hashes")
        if not os.path.exists(os.path.join(hash_dir, "_SUCCESS")):
            vids = (
                spark.read.format("binaryFile")
                .option("recursiveFileLookup", "true")
                .option("pathGlobFilter", args.glob)
                .load(args.path)
                .select(F.col("path").alias("item_id"),
                        F.col("content").alias("bytes"))
            )
            avi.mjpeg_frame_hashes(vids, every_n=args.every_n).write.mode(
                "overwrite").parquet(hash_dir)
        hashes = spark.read.parquet(hash_dir)
        pairs = avi.video_near_pairs(
            hashes, max_hamming=args.max_hamming, max_df=args.max_df,
            min_aligned=args.min_aligned, max_band_df=args.max_band_df,
        ).orderBy("a", "b")
        out = {
            "pairs": [[r.a, r.b, r.offset, r.n_aligned, r.n_matches]
                      for r in pairs.collect()],
            "n_videos": hashes.select("item_id").distinct().count(),
            "n_frame_hashes": hashes.count(),
            "hashes": hash_dir,
        }
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
