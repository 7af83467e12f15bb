#!/usr/bin/env python3
"""The `cdc` tooling face (reference cmd/cdc: analyze / compare / resync /
sweep / histogram) as a spark-submit job over a file tree or parquet clips
table. Prints ONE JSON document per command.

    python jobs/cdc.py analyze  --path DIR [--glob '*.pcm'] [--algo A]
    python jobs/cdc.py compare  --path DIR --algo A --candidate B [--tolerance 0.02]
    python jobs/cdc.py resync   --path DIR --edited DIR2 [--algo A]
    python jobs/cdc.py sweep    --path DIR --avg-sizes 1024,4096
    python jobs/cdc.py histogram --path DIR [--bins 20]

`--path` accepts a directory of payload files (binaryFile source,
sources/files.py -- the reference's file-tree input) or a parquet clips
table (`--format parquet`). `--ranged [--range-mb N]` switches the tree
source to bounded-memory range-split chunking (operators/bigfile.py) for
files larger than a task's memory -- the reference's streaming-reader
contract at Spark scale. Cluster usage mirrors jobs/pipeline.py
(--py-files dist zip).

Reference semantics: analyze = measure + distribution
(cmd/cdc/stats.go:122-155 + :91-116); compare gate = candidate dedup ratio
worse by > tolerance (cmd/cdc/compare.go:54-57); resync = shared-bytes
fraction (cmd/cdc/resync.go:82-102); sweep/histogram = cmd/cdcplot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(spark, args, path):
    if args.format == "parquet":
        return spark.read.parquet(path)
    from go_cdc_chunkers_spark.sources.files import clips_from_files

    return clips_from_files(spark, path, glob=args.glob, codec=args.codec,
                            sr_hz=args.sr_hz)


def _make_chunker(spark, args):
    """(source_df, chunker) pair. Default: whole-file cells (binaryFile /
    parquet). --ranged: bounded-memory range-split + seam-stitch chunking
    (operators/bigfile.py, the reference's 2xMaxSize reader contract,
    reader.go:35-107) -- for trees whose files exceed a task's memory. The
    listing reads binaryFile METADATA only (path/length pruned before any
    content column), so no file is ever loaded whole."""
    if not args.ranged:
        from go_cdc_chunkers_spark.operators.chunking import chunk_clips

        return _load(spark, args, args.path), chunk_clips

    if args.format != "files":
        raise SystemExit("--ranged requires --format files")
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.operators.bigfile import chunk_files_ranged

    def listing(path):
        reader = spark.read.format("binaryFile")
        if args.glob:
            reader = reader.option("pathGlobFilter", args.glob)
        return reader.load(path).select(
            F.col("path").alias("clip_id"), F.col("length").alias("size"))

    def chunker(files_df, algo, opts=None):
        return chunk_files_ranged(
            spark, files_df, algo, opts,
            range_bytes=args.range_mb << 20)

    chunker.listing = listing
    return listing(args.path), chunker


def _opts(args):
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts

    if args.min_size or args.normal_size or args.max_size:
        return ChunkerOpts(min_size=args.min_size, normal_size=args.normal_size,
                           max_size=args.max_size)
    return None


def _rows(df):
    return [r.asDict() for r in df.collect()]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["analyze", "compare", "resync", "sweep",
                                        "histogram"])
    ap.add_argument("--path", required=True)
    ap.add_argument("--edited", default=None, help="edited corpus (resync)")
    ap.add_argument("--format", choices=["files", "parquet"], default="files")
    ap.add_argument("--glob", default=None)
    ap.add_argument("--codec", default="pcm_s16le")
    ap.add_argument("--sr-hz", type=int, default=16000)
    ap.add_argument("--algo", default="fastcdc-v1.0.0")
    ap.add_argument("--candidate", default="jc-v1.1.0")
    ap.add_argument("--tolerance", type=float, default=0.02)
    ap.add_argument("--avg-sizes", default="1024,4096")
    ap.add_argument("--bins", type=int, default=20)
    ap.add_argument("--ranged", action="store_true",
                    help="bounded-memory range-split chunking for trees "
                         "with files larger than a task's memory")
    ap.add_argument("--range-mb", type=int, default=32,
                    help="bytes read per task with --ranged (MB)")
    ap.add_argument("--min-size", type=int, default=0)
    ap.add_argument("--normal-size", type=int, default=0)
    ap.add_argument("--max-size", type=int, default=0)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from go_cdc_chunkers_spark.operators import stats
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app=f"cdc-{args.command}", cpus=args.cpus)
    try:
        clips, chunker = _make_chunker(spark, args)
        opts = _opts(args)

        if args.command == "analyze":
            chunks = chunker(clips, args.algo, opts)
            out = {
                "measure": _rows(stats.measure(chunks)),
                "distribution": _rows(stats.distribution(chunks)),
            }
        elif args.command == "compare":
            base = stats.measure(chunker(clips, args.algo, opts))
            cand = stats.measure(chunker(clips, args.candidate, opts))
            rows = _rows(stats.compare(base, cand, tolerance=args.tolerance))
            out = {"compare": rows}
            if any(r["regressed"] for r in rows):
                print(json.dumps(out, default=str))
                return 2  # the reference's non-zero regression exit
        elif args.command == "resync":
            if not args.edited:
                ap.error("resync requires --edited")
            oc = chunker(clips, args.algo, opts)
            edited = (chunker.listing(args.edited) if args.ranged
                      else _load(spark, args, args.edited))
            ec = chunker(edited, args.algo, opts)
            out = {"resync": _rows(stats.resync_shared(oc, ec))}
        elif args.command == "sweep":
            sizes = [int(s) for s in args.avg_sizes.split(",")]
            out = {"sweep": _rows(
                stats.dedup_sweep(clips, args.algo, sizes, chunker)
            )}
        else:  # histogram
            chunks = chunker(clips, args.algo, opts)
            out = {"histogram": _rows(stats.length_histogram(chunks, n_bins=args.bins))}

        print(json.dumps(out, default=str))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
