#!/usr/bin/env python3
"""spark-submit entry point for the near-duplicate pipeline (P12).

Cluster usage (the 10^12-clip deployment shape):

    python tools/package.py   # builds dist/go_cdc_chunkers_spark.zip
    spark-submit \
      --py-files dist/go_cdc_chunkers_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      jobs/pipeline.py --clips <iceberg-ident-or-parquet-path> \
                       --workdir <checkpoint root> [--synthetic N]

Local smoke: python jobs/pipeline.py --synthetic 200 --workdir /tmp/pipe
Resume: re-run with the same --workdir; finished stages are reused
(per-stage _SUCCESS markers + the lineage table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Allow running directly from the repo without --py-files (local smoke).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", default=None, help="clips table (parquet path or Iceberg ident)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a deterministic synthetic clips table of N base clips")
    ap.add_argument("--algorithm", default="fastcdc-v1.0.0")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores (local mode only)")
    ap.add_argument("--audio-fp", action="store_true",
                    help="enable the spectral-fingerprint evidence channel "
                         "(PipelineConfig.use_audio_fp)")
    ap.add_argument("--digest", choices=["sha256", "poly128"], default="sha256",
                    help="chunk identity hash (poly128 = cheap near-dup identity)")
    ap.add_argument("--exact-first", action="store_true",
                    help="collapse byte-identical clips before the expensive "
                         "stages; identical components, dup fraction skipped "
                         "(PipelineConfig.exact_first)")
    ap.add_argument("--max-cell-bytes", type=int, default=None,
                    help="route clips larger than this through the bounded-"
                         "memory ranged chunker (PipelineConfig."
                         "max_cell_bytes; chunks byte-identical either way)")
    ap.add_argument("--normalize-pcm", action="store_true",
                    help="chunk each clip's DECODED PCM instead of its "
                         "storage bytes (PipelineConfig.normalize_pcm): "
                         "cross-codec lossless re-uploads dedup together")
    ap.add_argument("--mixed-codecs", action="store_true",
                    help="with --synthetic: deterministically re-encode a "
                         "third of the clips as FLAC and a third as WAV "
                         "(same audio), to exercise --normalize-pcm")
    args = ap.parse_args()

    from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
    from go_cdc_chunkers_spark.session import get_spark
    from go_cdc_chunkers_spark.sources import iceberg
    from go_cdc_chunkers_spark.sources import clips as clips_src

    spark = get_spark(app="neardup-pipeline", cpus=args.cpus)

    if args.synthetic:
        # Executor-side generation (generate_clips_df): every clip is a
        # pure function of (seed, role, index), so the corpus never
        # crosses the driver -- the driver-list flavor stalls a default
        # 1g spark-submit driver heap past ~10k base clips. Materialize it
        # ONCE under the workdir: the pipeline scans its input 4+ times
        # (chunks, shingles, simhash, containment, components) and a
        # mapInPandas source would re-synthesize all PCM per scan with no
        # column pruning; a real deployment's input is already a table,
        # so the generator should be one too. Idempotent like the stages.
        src = os.path.join(args.workdir, "clips_input")
        # cache key includes the generation params: a reused workdir with
        # a different --synthetic N / --mixed-codecs must regenerate, not
        # silently reuse the stale corpus
        params = {"n_base": int(args.synthetic),
                  "mixed_codecs": bool(args.mixed_codecs)}
        params_path = os.path.join(src, "_gen_params.json")
        cached = False
        if os.path.exists(os.path.join(src, "_SUCCESS")):
            try:
                with open(params_path) as f:
                    cached = json.load(f) == params
            except (OSError, json.JSONDecodeError, ValueError):
                cached = False
        if not cached:
            gen, _ = clips_src.generate_clips_df(
                spark, n_base=args.synthetic,
                mixed_codecs=args.mixed_codecs)
            gen.write.mode("overwrite").parquet(src)
            tmp = f"{params_path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(params, f)
            os.replace(tmp, params_path)
        clips = spark.read.parquet(src)
    elif args.clips:
        clips = iceberg.read_table(spark, args.clips)
    else:
        ap.error("need --clips or --synthetic")
        return 2

    cfg = PipelineConfig(algorithm=args.algorithm, use_audio_fp=args.audio_fp,
                         digest_kind=args.digest, exact_first=args.exact_first,
                         max_cell_bytes=args.max_cell_bytes,
                         normalize_pcm=args.normalize_pcm)
    t0 = time.time()
    pipe = Pipeline(spark, args.workdir, cfg)
    comps = pipe.run(clips)
    n_clips = comps.count()
    n_comps = comps.select("component_id").distinct().count()
    dt = time.time() - t0
    print(json.dumps({
        "clips": n_clips,
        "components": n_comps,
        "seconds": round(dt, 2),
        "clips_per_sec": round(n_clips / dt, 2),
        "workdir": args.workdir,
        # ops breadcrumb; also pins that a spark-submit --master was
        # respected, not overridden by get_spark's local default
        "master": spark.conf.get("spark.master"),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
