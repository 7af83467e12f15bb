#!/usr/bin/env python3
"""Capture .explain("formatted") for every query/operator touched in the
r06 optimization round -> plans/r06/<name>_{before,after}.txt.

Usage: python tools/capture_plans_r06.py before|after

Uses its own MAT dir so it never races the oracle_check fixed dir.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_MAT_DIR", "/tmp/mat_r06_plans")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(ROOT, "plans", "r06")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark import entry_queries as EQ
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.operators import candidates as cand_ops
    from go_cdc_chunkers_spark.operators import chunking, components, signatures
    from go_cdc_chunkers_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app=f"plans-r06-{TAG}", cpus=8, shuffle_partitions=8)

    def dump(name: str, df) -> None:
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan_of(df))
        print("dumped", name)

    # --- bench-timed sf-dir queries (plain DataFrame builders; explain
    # only, no execution) ---------------------------------------------------
    for name in ("tpch_q1_pricing", "region_revenue_rollup",
                 "top_orders_per_customer", "doc_exact_dedup",
                 "doc_length_stats", "cdc_distribution"):
        dump(name, EQ.QUERIES[name](spark, SF))

    # --- chunk throughput shape (what bench.py counts) ---------------------
    clips = EQ.load_clips(spark)
    chunked = chunking.chunk_clips(clips, "fastcdc-v1.0.0", digest="sha256")
    dump("cdc_chunk_throughput", chunked.groupBy().count())

    # --- pipeline stages ---------------------------------------------------
    opts = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)
    chunks = chunking.chunk_clips(clips, "fastcdc-v1.0.0", opts)
    sig = signatures.minhash_signatures(chunks, k=32)
    dump("pipeline_sig_pcm", sig)
    sig_text = signatures.minhash_signatures(
        signatures.char_shingles(clips, n=4), item_col="shingle", k=32)
    dump("pipeline_sig_text", sig_text)
    dump("pipeline_simhash", signatures.simhash64(clips))
    bands = signatures.lsh_bands(sig, bands=8, rows_per_band=4)

    # candidate join: star + salted over a synthetic band relation with a
    # hot bucket so both branches appear in the plan
    synth = spark.createDataFrame(
        [(i % 4, i % 7, f"c{i}", "pcm") for i in range(200)],
        "band_id int, band_hash long, clip_id string, src string",
    )
    dump("candidate_pairs_star",
         cand_ops.candidate_pairs(synth, pair_cap=4, shuffle_partitions=8))
    dump("candidate_pairs_salted",
         cand_ops.candidate_pairs(synth, pair_cap=4, shuffle_partitions=8,
                                  skew_mode="salted"))
    sim = signatures.simhash64(clips)
    v = cand_ops.verify_pairs_dual(
        cand_ops.candidate_pairs(bands, pair_cap=32), sig, sig_text, sim, k=32)
    dump("pipeline_verified", v)
    dump("pipeline_containment", cand_ops.containment_pass(v, clips))

    # one CC round's merged-label plan (the per-round unit of work)
    verts = spark.createDataFrame(
        [(f"v{i}",) for i in range(16)], "clip_id string")
    edges = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(8)], "a string, b string")
    labels = verts.select(
        F.col("clip_id"), F.col("clip_id").alias("component_id"))
    und = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(edges.select(F.col("b").alias("src"),
                                     F.col("a").alias("dst"))).distinct())
    neigh = (und.join(labels, und.src == labels.clip_id)
             .groupBy(F.col("dst").alias("clip_id"))
             .agg(F.min("component_id").alias("_n")))
    merged = labels.join(neigh, "clip_id", "left").select(
        "clip_id",
        F.least(F.col("component_id"),
                F.coalesce(F.col("_n"), F.col("component_id"))).alias(
                    "component_id"))
    dump("cc_one_round", merged)

    # resync sweep final relation (materializes its chunk relation to the
    # scratch MAT dir as part of building the DataFrame)
    dump("cdc_resync_sweep", EQ.QUERIES["cdc_resync_sweep"](spark, SF))

    spark.stop()


if __name__ == "__main__":
    main()
