#!/usr/bin/env python3
"""Incremental chunk-store maintenance (operators/incremental.py) as a
spark-submit job: keep a bucketed dedup store across ingest batches and
report each batch's dup/novel accounting against it. Prints ONE JSON
document per command.

    python jobs/store.py init   --store DIR [--buckets 64] --path SRC [--glob G]
    python jobs/store.py report --store DIR --path SRC [--broadcast-batch]
    python jobs/store.py append --store DIR --path SRC

`--kind bands` maintains a NEAR-DUP band store instead (LSH bands of the
chunk MinHash, bucketed by band_hash): `report` prints candidate pairs of
the batch against the store via stop-band-pruned equi-join (using the
compaction-maintained _band_df sidecar when present -- no store-wide
aggregate in the probe), `append` grows the store by the batch's bands
(idempotence is the caller's schedule, like the streaming registry), and
`compact` rewrites + regenerates the df sidecar. Signature parameters
(k / bands / rows-per-band on top of the chunk sizing) persist in
_chunking.json and define hash identity the same way.

`--path` accepts a directory of payload files (binaryFile tree,
sources/files.py) or a parquet clips table (`--format parquet`). The store
lives at --store as a bucketed parquet table; commands re-attach it to the
session catalog (register_chunk_store), so runs are independent
spark-submit invocations. `report` prints per-clip accounting plus corpus
totals (bytes the store already holds = write elimination); `append` grows
the store by the batch's first-occurrence novel hashes. Cluster usage
mirrors jobs/pipeline.py (--py-files dist zip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE = "chunk_store"
BAND_TABLE = "band_store_cli"
CHUNKING_FILE = "_chunking.json"
_CHUNK_KEYS = ("algo", "min_size", "normal_size", "max_size")
_SIG_KEYS = ("k", "bands", "rows_per_band")


def _effective_chunking(args) -> dict:
    """Chunking parameters DEFINE hash identity: a batch chunked with
    different sizing than the store produces disjoint hashes, so a
    byte-identical file would silently report fully novel. init persists
    the parameters beside the store (_chunking.json); later commands
    default to them and refuse explicit flags that conflict."""
    saved = None
    cpath = os.path.join(args.store, CHUNKING_FILE)
    if args.cmd != "init" and os.path.exists(cpath):
        saved = json.load(open(cpath))
    eff = {}
    keys = _CHUNK_KEYS + (_SIG_KEYS if args.kind == "bands" else ())
    for key in keys:
        given = getattr(args, key)
        if saved is not None:
            if key not in saved:
                raise SystemExit(
                    f"store at {args.store} was initialized without "
                    f"{key!r} -- it is a different --kind than requested")
            if given is not None and given != saved[key]:
                raise SystemExit(
                    f"--{key.replace('_', '-')} {given} conflicts with the "
                    f"store's persisted chunking ({saved[key]}); the store's "
                    "hashes were cut with the init-time parameters")
            eff[key] = saved[key]
        else:
            eff[key] = given
    eff["algo"] = eff["algo"] or "fastcdc-v1.0.0"
    if args.kind == "bands":
        eff["k"] = eff["k"] or 128
        eff["bands"] = eff["bands"] or 32
        eff["rows_per_band"] = eff["rows_per_band"] or 4
    return eff


def _bands(spark, args, cfg: dict):
    """Batch LSH bands: chunk -> MinHash(k) -> banded hashes (pcm stream;
    the file-tree source carries no transcript channel)."""
    from go_cdc_chunkers_spark.operators import signatures

    sig = signatures.minhash_signatures(_chunks(spark, args, cfg), k=cfg["k"])
    return signatures.lsh_bands(sig, cfg["bands"], cfg["rows_per_band"],
                                src="pcm")


def _opts_of(chunking_cfg: dict):
    """ChunkerOpts from the effective chunking dict. ANY size flag builds
    opts (fields left None resolve to the algorithm's defaults in
    cdc/opts.resolve); gating on normal_size alone would silently ignore
    --min-size/--max-size while _chunking.json still records them as the
    store's hash-defining parameters."""
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts

    c = chunking_cfg
    if not any(c[k] is not None for k in ("min_size", "normal_size", "max_size")):
        return None
    return ChunkerOpts(min_size=c["min_size"], normal_size=c["normal_size"],
                       max_size=c["max_size"])


def _chunks(spark, args, chunking_cfg: dict):
    from go_cdc_chunkers_spark.operators.chunking import chunk_clips

    if args.format == "parquet":
        clips = spark.read.parquet(args.path)
    else:
        from go_cdc_chunkers_spark.sources.files import clips_from_files

        clips = clips_from_files(spark, args.path, glob=args.glob,
                                 codec=args.codec, sr_hz=args.sr_hz)
    # offset is part of the store schema; chunk_clips emits it
    return chunk_clips(clips, chunking_cfg["algo"], _opts_of(chunking_cfg))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["init", "report", "append", "compact",
                                "estimate"])
    ap.add_argument("--kind", choices=["chunks", "bands"], default="chunks",
                    help="chunks = exact-dedup store; bands = near-dup "
                         "LSH band store")
    ap.add_argument("--store", required=True)
    ap.add_argument("--path", default=None,
                    help="batch source (required except for compact)")
    ap.add_argument("--format", choices=["files", "parquet"], default="files")
    ap.add_argument("--glob", default=None)
    ap.add_argument("--codec", default="pcm_s16le")
    ap.add_argument("--sr-hz", type=int, default=16000)
    ap.add_argument("--algo", default=None,
                    help="chunking algorithm at init (default fastcdc-v1.0.0); "
                         "later commands read it from the store's _chunking.json")
    ap.add_argument("--min-size", type=int, default=None)
    ap.add_argument("--normal-size", type=int, default=None)
    ap.add_argument("--max-size", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=64,
                    help="bucket count at init; later commands read it from "
                         "the store's _store_meta.json")
    ap.add_argument("--k", type=int, default=None,
                    help="bands kind: MinHash signature length at init")
    ap.add_argument("--bands", type=int, default=None)
    ap.add_argument("--rows-per-band", dest="rows_per_band", type=int,
                    default=None)
    ap.add_argument("--max-df", type=int, default=64,
                    help="bands report: stop-band document frequency cap")
    ap.add_argument("--broadcast-batch", action="store_true",
                    help="small-batch inverted probe (store never shuffled/sorted)")
    ap.add_argument("--sketch-k", dest="sketch_k", type=int, default=None,
                    help="estimate/init: bottom-k sketch size "
                         "(default 65536)")
    ap.add_argument("--limit", type=int, default=2000,
                    help="report: max per-clip/pair detail rows in the JSON "
                         "(aggregates stay exact; truncated:true marks a cut)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from go_cdc_chunkers_spark.operators import incremental
    from go_cdc_chunkers_spark.session import get_spark

    if args.cmd != "compact" and not args.path:
        ap.error("--path is required for init/report/append/estimate")
    if args.cmd == "estimate" and args.kind != "chunks":
        ap.error("estimate is a chunk-store verb (exact-dedup planning)")

    table = BAND_TABLE if args.kind == "bands" else TABLE
    # the store's own bucketing metadata says what kind it is -- running a
    # chunks command against a bands store (or vice versa) is refused
    # before any Spark work, not discovered as a schema error mid-probe
    if args.cmd != "init" and os.path.exists(
            os.path.join(args.store, "_store_meta.json")):
        got = incremental.read_store_meta(args.store)["bucket_cols"]
        want = ["band_hash"] if args.kind == "bands" else ["chunk_hash"]
        if got != want:
            raise SystemExit(
                f"store at {args.store} is bucketed by {got}: it was "
                f"initialized as a different --kind than {args.kind!r}")
    spark = get_spark(app=f"store-{args.cmd}", cpus=args.cpus)
    try:
        if args.cmd == "compact":
            incremental.register_chunk_store(spark, table, args.store)
            out = {"cmd": "compact", "kind": args.kind, "store": args.store,
                   **incremental.compact_store(spark, table, args.store)}
            print(json.dumps(out))
            return 0
        chunking_cfg = _effective_chunking(args)
        if args.kind == "bands":
            return _main_bands(spark, args, chunking_cfg)
        batch = _chunks(spark, args, chunking_cfg)
        if args.cmd == "init":
            if os.path.exists(os.path.join(args.store, "_SUCCESS")):
                raise SystemExit(f"store already exists at {args.store}")
            incremental.write_chunk_store(batch, TABLE, args.store,
                                          n_buckets=args.buckets)
            incremental.write_store_sketch(
                spark, batch, args.store,
                k=args.sketch_k or incremental.DEFAULT_SKETCH_K)
            with open(os.path.join(args.store, CHUNKING_FILE), "w") as f:
                json.dump(chunking_cfg, f)
            store = spark.table(TABLE)
            out = {"cmd": "init", "store": args.store,
                   "rows": store.count(), "buckets": args.buckets,
                   "chunking": chunking_cfg}
        elif args.cmd == "estimate":
            # sidecar + batch only -- the store's bucketed data is read at
            # most ONCE, and only to backfill a legacy store's sidecar
            built = False
            if incremental.read_store_sketch_meta(args.store) is None:
                store = incremental.register_chunk_store(
                    spark, TABLE, args.store)
                incremental.write_store_sketch(
                    spark, store, args.store,
                    k=args.sketch_k or incremental.DEFAULT_SKETCH_K)
                built = True
            out = {"cmd": "estimate", "store": args.store,
                   "sketch_backfilled_from_store": built,
                   **incremental.estimate_vs_store(spark, batch, args.store)}
        else:
            # bucketing + schema come from the store's own _store_meta.json
            store = incremental.register_chunk_store(spark, TABLE, args.store)
            if args.cmd == "report":
                from pyspark.sql import functions as F

                rep = incremental.exact_dedup_vs_store(
                    batch, store, broadcast_batch=args.broadcast_batch
                ).persist()
                # aggregates computed distributed and EXACT; only the
                # per-clip detail list is bounded by --limit (a batch can
                # be millions of clips -- the driver JSON must not be)
                agg = rep.agg(
                    F.count("*").alias("n"),
                    F.coalesce(F.sum("dup_bytes"), F.lit(0)).alias("dup"),
                    F.coalesce(F.sum(F.col("total_bytes")
                                     - F.col("dup_bytes")), F.lit(0)
                               ).alias("novel"),
                    F.coalesce(F.sum(F.col("fully_dup").cast("long")),
                               F.lit(0)).alias("full"),
                ).collect()[0]
                rows = [r.asDict() for r in
                        rep.orderBy("clip_id").limit(args.limit).collect()]
                rep.unpersist()
                out = {
                    "cmd": "report", "store": args.store,
                    "n_clips": int(agg["n"]),
                    "dup_bytes": int(agg["dup"]),
                    "novel_bytes": int(agg["novel"]),
                    "fully_dup_clips": int(agg["full"]),
                    "clips": rows,
                    "truncated": int(agg["n"]) > len(rows),
                }
            else:  # append
                before = store.count()
                incremental.append_novel(spark, batch, TABLE, args.store)
                after = spark.table(TABLE).count()
                out = {"cmd": "append", "store": args.store,
                       "rows_before": before, "rows_added": after - before,
                       "rows_after": after}
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()


def _main_bands(spark, args, cfg: dict) -> int:
    from go_cdc_chunkers_spark.operators import incremental

    batch = _bands(spark, args, cfg)
    if args.cmd == "init":
        if os.path.exists(os.path.join(args.store, "_SUCCESS")):
            raise SystemExit(f"store already exists at {args.store}")
        incremental.write_band_store(batch, BAND_TABLE, args.store,
                                     n_buckets=args.buckets)
        with open(os.path.join(args.store, CHUNKING_FILE), "w") as f:
            json.dump(cfg, f)
        out = {"cmd": "init", "kind": "bands", "store": args.store,
               "rows": spark.table(BAND_TABLE).count(),
               "buckets": args.buckets, "signature": cfg}
    else:
        store = incremental.register_chunk_store(spark, BAND_TABLE, args.store)
        if args.cmd == "report":
            bdf = incremental.read_band_df(spark, args.store)
            cand = incremental.near_dup_candidates_vs_store(
                batch, store, max_df=args.max_df, store_df=bdf
            ).persist()
            n_cand = cand.count()  # exact; the detail list is --limit-bounded
            pairs = cand.orderBy("new_clip", "store_clip") \
                        .limit(args.limit).collect()
            cand.unpersist()
            out = {
                "cmd": "report", "kind": "bands", "store": args.store,
                "n_candidates": n_cand,
                "used_df_sidecar": bdf is not None,
                "pairs": [[r["new_clip"], r["store_clip"]] for r in pairs],
                "truncated": n_cand > len(pairs),
            }
        else:  # append
            before = store.count()
            incremental.write_band_store(
                batch, BAND_TABLE, args.store,
                n_buckets=incremental.read_store_meta(args.store)["n_buckets"],
                mode="append")
            out = {"cmd": "append", "kind": "bands", "store": args.store,
                   "rows_before": before,
                   "rows_after": spark.table(BAND_TABLE).count()}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
