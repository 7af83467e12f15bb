#!/usr/bin/env python3
"""r06 optimization-round measurement harness (bench.py is frozen for the
driver; everything exploratory lives here).

Modes:
  --queries [names...]  noop-sink timing (guide 1.4) + plan red-flag scan
                        for every declared driver query (default: all).
                        Prints one JSON line per query: warm best-of-3
                        seconds, Exchange count, Python eval nodes,
                        CartesianProduct, and whether a parquet scan
                        carries PushedFilters.
  --pipeline-stages     one fresh pipeline run at bench geometry; prints
                        per-stage seconds from lineage + total wall.
  --chunk N             the bench chunk-throughput workload at replicate N
                        (same shape bench.py times, sha256 + poly128).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Materializations go to a scratch MAT dir so concurrent oracle_check runs
are never raced.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_MAT_DIR", "/tmp/mat_r06_bench_extra")
ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def flags(p: str) -> dict:
    return {
        "exchanges": p.count("\nExchange") + p.count("- Exchange"),
        "bcast_exchanges": p.count("BroadcastExchange"),
        "arrow_py": p.count("ArrowEvalPython"),
        "batch_py": p.count("BatchEvalPython"),
        "map_py": p.count("MapInPandas") + p.count("MapInArrow")
        + p.count("FlatMapGroupsInPandas"),
        "cartesian": p.count("CartesianProduct"),
        "smj": p.count("SortMergeJoin"),
        "shj": p.count("ShuffledHashJoin"),
        "bhj": p.count("BroadcastHashJoin"),
        "pushed": "PushedFilters: [" in p
        and "PushedFilters: []" not in p.split("PushedFilters: [", 1)[0],
    }


def run_queries(names: list[str] | None) -> None:
    from go_cdc_chunkers_spark import entry_queries as EQ
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app="bench-extra-queries", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    sel = names or sorted(EQ.QUERIES)
    out = {}
    try:
        for name in sel:
            fn = EQ.QUERIES[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            try:
                df = fn(spark, SF_DIR)   # builder may materialize side inputs
                p = flags(plan_of(df))
                noop(df)                 # warm
                best = float("inf")
                for _ in range(3):
                    t = time.time()
                    noop(fn(spark, SF_DIR))
                    best = min(best, time.time() - t)
                row = {"q": name, "sec": round(best, 3), **p}
            except Exception as e:  # noqa: BLE001
                row = {"q": name, "err": f"{type(e).__name__}: {e}"[:200]}
            out[name] = row
            print(json.dumps(row), flush=True)
    finally:
        spark.sparkContext.setJobDescription(None)
        spark.stop()
    total = sum(r.get("sec", 0) for r in out.values())
    print(json.dumps({"metric": "bench_extra_queries_total",
                      "value": round(total, 3), "n": len(out)}))


def run_pipeline_stages() -> None:
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
    from go_cdc_chunkers_spark.session import get_spark

    import bench as B

    corpus, n_clips, _ = B.ensure_corpus(600)
    spark = get_spark(app="bench-extra-pipe", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    try:
        clips = spark.read.parquet(corpus).repartition(CPUS * 2).cache()
        clips.count()
        best = None
        for _ in range(2):
            wd = tempfile.mkdtemp(prefix="bx_pipe_")
            try:
                cfg = PipelineConfig(chunk_opts=ChunkerOpts(
                    min_size=256, normal_size=1024, max_size=8192))
                pipe = Pipeline(spark, wd, cfg)
                t = time.time()
                pipe.run(clips).count()
                dt = time.time() - t
                stages = {}
                with open(os.path.join(wd, "lineage.jsonl")) as f:
                    for line in f:
                        r = json.loads(line)
                        stages[r["stage"]] = round(r["finished"] - r["started"], 3)
                if best is None or dt < best["wall"]:
                    best = {"wall": round(dt, 3), "stages": stages}
            finally:
                shutil.rmtree(wd, ignore_errors=True)
        print(json.dumps({"metric": "pipeline_stage_breakdown",
                          "n_clips": n_clips, **best}))
    finally:
        spark.stop()


def run_chunk(replicate: int) -> None:
    from go_cdc_chunkers_spark.session import get_spark

    import bench as B

    corpus, _, total_bytes = B.ensure_corpus(600)
    spark = get_spark(app="bench-extra-chunk", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    try:
        res = B.chunk_throughput(spark, corpus, total_bytes, replicate, CPUS,
                                 digests=("sha256", "poly128"))
        out = {"metric": "chunk_throughput", "replicate": replicate}
        for d, (sec, mbs, n) in res.items():
            out[f"sec_{d}"] = round(sec, 3)
            out[f"mb_per_sec_{d}"] = round(mbs, 2)
            out[f"n_chunks_{d}"] = n
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--queries":
        run_queries(sys.argv[2:] or None)
    elif len(sys.argv) >= 2 and sys.argv[1] == "--pipeline-stages":
        run_pipeline_stages()
    elif len(sys.argv) >= 2 and sys.argv[1] == "--chunk":
        run_chunk(int(sys.argv[2]) if len(sys.argv) > 2 else 24)
    else:
        print(__doc__)
