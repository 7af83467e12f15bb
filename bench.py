#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Workloads:
  - cdc_chunk_throughput: chunk a deterministic synthetic clips corpus with
    fastcdc-v1.0.0 (the reference's headline benchmark shape: MB/s over
    seeded data, benchmarks/chunkers_test.go:23-29) -> also reports
    mb_per_sec and clips_per_sec.
  - neardup_pipeline: the full near-duplicate pipeline (chunk -> minhash ->
    LSH -> verify -> connected components) over the synthetic clips table ->
    clips_per_sec.
  - driver-table queries at $SPARK_GRAFT_SF_DIR: TPC-H-ish aggregates,
    dedup, ANN.

Scaling evidence (north_rule: throughput scaling efficiency >= 0.8 between
N and 4N executors, evidenced at local[8] vs local[32] per the driver
instruction): run `python bench.py --scaling`; results also land in
BENCH/BASELINE.md via tools/update_baseline.py.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def build_clips_df(spark, n_base: int, seed: int = 42):
    from go_cdc_chunkers_spark.sources import clips as clips_src

    rows, _ = clips_src.generate_clips(
        n_base=n_base, dup_frac=0.2, near_frac=0.2, n_const=4, seed=seed
    )
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in rows],
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    total_bytes = sum(len(r["bytes"]) for r in rows)
    return df.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))), len(rows), total_bytes


def run_workloads(spark, sf_dir: str, n_base: int):
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark import entry_queries as EQ
    from go_cdc_chunkers_spark.operators import chunking
    from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    clips, n_clips, total_bytes = build_clips_df(spark, n_base)
    clips.cache().count()

    t = time.time()
    n_chunks = chunking.chunk_clips(clips, "fastcdc-v1.0.0").count()
    dt = time.time() - t
    timings["cdc_chunk_throughput"] = round(dt, 3)
    extras["mb_per_sec"] = round(total_bytes / 1e6 / dt, 2)
    extras["n_chunks"] = n_chunks

    wd = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        t = time.time()
        pipe = Pipeline(spark, wd, PipelineConfig())
        pipe.run(clips).count()
        dt = time.time() - t
        timings["neardup_pipeline"] = round(dt, 3)
        extras["clips_per_sec"] = round(n_clips / dt, 2)
        extras["n_clips"] = n_clips
    finally:
        shutil.rmtree(wd, ignore_errors=True)

    for name in (
        "tpch_q1_pricing",
        "region_revenue_rollup",
        "top_orders_per_customer",
        "doc_exact_dedup",
        "doc_length_stats",
    ):
        fn = EQ.QUERIES[name]
        t = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t, 3)

    return timings, extras


def one_session(cpus: int, sf_dir: str, n_base: int, app: str):
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app=app, cpus=cpus, shuffle_partitions=max(cpus, 8))
    try:
        return run_workloads(spark, sf_dir, n_base)
    finally:
        spark.stop()


def scaling_run(sf_dir: str, n_base: int):
    """Same job at local[8] vs local[32] (N vs 4N stand-in)."""
    import subprocess

    out = {}
    for cpus in (8, 32):
        # fresh JVM per parallelism level so nothing is shared
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        r = subprocess.run(
            [sys.executable, __file__, "--single", str(cpus), str(n_base)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
        out[cpus] = json.loads(line)
    tp8 = out[8]["clips_per_sec"]
    tp32 = out[32]["clips_per_sec"]
    eff = (tp32 / tp8) / 4.0
    return out, tp8, tp32, round(eff, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_base = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "1500"))

    if len(sys.argv) >= 2 and sys.argv[1] == "--single":
        cpus = int(sys.argv[2])
        n_base = int(sys.argv[3])
        timings, extras = one_session(cpus, sf_dir, n_base, f"bench-{cpus}")
        print(json.dumps({"cpus": cpus, **timings, **extras}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--scaling":
        out, tp8, tp32, eff = scaling_run(sf_dir, n_base)
        print(json.dumps({
            "metric": "scaling_efficiency_local8_vs_local32",
            "value": eff, "unit": "ratio",
            "clips_per_sec_8": tp8, "clips_per_sec_32": tp32,
            "detail": out, "sf": sf,
        }))
        return

    timings, extras = one_session(cpus, sf_dir, n_base, "bench")
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "engine_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }))


if __name__ == "__main__":
    main()
