#!/usr/bin/env python3
"""Dump formatted physical plans for the engine's key operators -> PLANS.md.

This is the evidence trail for the scale claims: which stages are narrow
(no Exchange), where the single shuffle of each aggregate lands, which joins
broadcast, that parquet scans carry PushedFilters/ReadSchema pruning, and
that the only Python in any hot path is ArrowEvalPython / FlatMapsInPandas.
Re-run after operator changes: python tools/explain_plans.py
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark import entry_queries as EQ
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.operators import chunking, signatures, stats
    from go_cdc_chunkers_spark.operators import candidates as cand_ops
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app="explain", cpus=8, shuffle_partitions=8)
    clips = EQ.load_clips(spark)
    opts = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)
    chunks = chunking.chunk_clips(clips, "fastcdc-v1.0.0", opts)
    sig = signatures.minhash_signatures(chunks, k=16)
    bands = signatures.lsh_bands(sig, bands=4, rows_per_band=4)
    cands = cand_ops.candidate_pairs(bands, pair_cap=32)

    sections = [
        ("P3 chunking (clips -> chunks)",
         "Narrow: Scan -> ArrowEvalPython -> Generate(posexplode) -> Project. "
         "No Exchange; one Python stage, Arrow-batched.",
         chunks),
        ("Q1/Q2 measure (dedup ratio)",
         "Two-phase hash aggregates; the distinct-by-digest is partial_agg -> "
         "Exchange(algo, chunk_hash) -> agg, then a tiny join.",
         stats.measure(chunks)),
        ("P4 minhash signatures",
         "Single hash aggregate keyed clip_id: k min() columns ride one "
         "Exchange; map-side partial aggregation applies.",
         sig),
        ("P5+P7 bands -> candidate pairs",
         "Band hashing is a Project; the self-join shuffles once on "
         "(band_id, band_hash); hot buckets (> pair_cap) exit via the "
         "linear star path (window count + broadcast-able hub agg).",
         cands),
        ("P7 salted exact candidates (skew_mode=\"salted\")",
         "Exact-pair flavor: hot-bucket members salted into G = "
         "ceil(m/salt_target) groups (xxhash64 pmod), the right side "
         "replicated per group via explode(sequence(0, G-1)), and the "
         "self-join keyed on (band_id, band_hash, _sg) -- the salt group "
         "is IN the join key, so one bucket's quadratic emission spreads "
         "over G tasks statically, no AQE needed. Still zero Python.",
         cand_ops.candidate_pairs(bands, pair_cap=32, skew_mode="salted")),
        ("audio_fp fingerprint matching (materialized fingerprints -> pairs)",
         "Spectral-channel matching is all-JVM once fingerprints are "
         "materialized at the stage boundary: canonicalize (one Exchange on "
         "clip_id+hash), df-prune via left_semi on hash, hash equi-join, "
         "offset groupBy + max, two small joins for sizes. No Python, no "
         "cartesian.",
         None),  # filled below (needs a parquet round-trip)
        ("incremental store probe (bucketed chunk store, SMJ path)",
         "The store-side FileScan reads the persisted bucketing (Bucketed: "
         "true) with NO Exchange above it; the single Exchange is the new "
         "batch being shuffled into the store's bucketing. Probe shuffle is "
         "O(batch); measured volumes in BASELINE.md (bench.py --store).",
         None),  # filled below (needs a bucketed table on disk)
        ("audio_fp DELTA-bounded matching (scope_clip_ids)",
         "The incremental spectral channel: both join sides are left_semi-"
         "pruned to hashes the delta clips carry (scoped_fingerprints) "
         "before the hash equi-join -- join input is bounded by the "
         "delta's hash set; the only full-relation nodes are the two "
         "count-only aggregates (per-clip n_fp, per-hash df).",
         None),  # filled below (shares the materialized fingerprints)
        ("simhash hot-bucket pairs (windowed hub selection)",
         "Hot buckets (> pair_cap members) pick n_hubs min-id hubs via a "
         "row_number Window over the big subset (sort-based, spills; no "
         "ObjectHashAggregate / collect_list buffering whole buckets), "
         "then broadcast the tiny hub relation back onto members.",
         None),  # filled below
        ("band-store probe with compaction-maintained df sidecar",
         "near_dup_candidates_vs_store(store_df=read_band_df(...)): the "
         "stop-band relation comes from the tiny persisted _band_df scan "
         "-- NO store-wide aggregate in the probe plan; the store-side "
         "FileScan stays bucketed/shuffle-free.",
         None),  # filled below
        ("semantic dedup pair scan (SemDeDup, cluster-scoped)",
         "similarity.semantic_dedup: centroid assignment broadcasts the "
         "tiny centroid relation; the pair enumeration is ONE equi-join "
         "keyed on centroid_id with the _lo < _hi ordering and the cosine "
         "threshold riding the join condition -- linear in cluster size, "
         "no CartesianProduct anywhere.",
         None),  # filled below
        ("image dHash banded near-dup join",
         "imagehash.dhash_near_pairs: 4x16-bit band explode (Project + "
         "Generate), one self-equi-join on (band_idx, band_value), "
         "bit_count(xor) verify in the same stage, groupBy(a,b) dedup -- "
         "the pigeonhole-exact Hamming<=3 shape, no all-pairs scan.",
         None),  # filled below
        ("video MJPEG near-dup (canonicalize + band join + align)",
         "avi.video_near_pairs: min-frame canonicalization (one partial-agg "
         "Exchange), broadcast stop-hash anti-join, 4x16-bit band explode + "
         "self equi-join with bit_count(xor) verify, then the modal-offset "
         "row_number window -- JPEG decode stays ONE Arrow pass upstream "
         "(pinned by test_video_decode_runs_once).",
         None),  # filled below
        ("oracle query: tpch_q1_pricing",
         "Filter + project pushed to parquet scan (PushedFilters/ReadSchema); "
         "one Exchange for the groupBy.",
         EQ.tpch_q1_pricing(spark, SF)),
        ("oracle query: region_revenue_rollup",
         "Star join: dims broadcast (BroadcastHashJoin), fact scans pruned "
         "to the needed columns.",
         EQ.region_revenue_rollup(spark, SF)),
    ]

    # audio_fp: honor the operator's materialize-first contract
    import tempfile

    from go_cdc_chunkers_spark.operators import audio_fp
    from go_cdc_chunkers_spark.sources import clips as clips_src

    rows, _t, _k = clips_src.generate_chord_clips(
        n_base=6, dup_frac=0.25, jitter_frac=0.0, insert_frac=0.0, seed=3)
    fp_dir = tempfile.mkdtemp(prefix="plans_fp_")
    audio_fp.spectral_fingerprints(
        spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"])) for r in rows],
            "clip_id string, bytes binary")
    ).write.mode("overwrite").parquet(fp_dir)
    fp_pairs = audio_fp.fingerprint_pairs(spark.read.parquet(fp_dir))

    # incremental store probe: write a small bucketed store, plan the probe
    # with broadcast off (the scale-representative SMJ shape)
    from go_cdc_chunkers_spark.operators import incremental

    st_dir = tempfile.mkdtemp(prefix="plans_store_")
    incremental.write_chunk_store(
        chunks.limit(5000), "plans_store", os.path.join(st_dir, "t"), n_buckets=8)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    probe = incremental.probe_store(chunks.limit(1000), spark.table("plans_store"))
    plan_of(probe)  # materialize (and cache) the plan under no-broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    # delta-bounded spectral matching over the same materialized fingerprints
    scope = spark.createDataFrame([(rows[0]["clip_id"],)], "clip_id string")
    fp_scoped = audio_fp.fingerprint_pairs(
        spark.read.parquet(fp_dir), scope_clip_ids=scope)

    # simhash hot-bucket pairs: big buckets exercise the windowed hub path
    from go_cdc_chunkers_spark.operators import dedup_text

    docs = spark.createDataFrame(
        [(i, "spam ham eggs " * 8) for i in range(200)]
        + [(1000 + j, f"doc {j} words {j * 7}") for j in range(4)],
        "doc_id long, text string")
    sim_pairs = dedup_text.simhash_pairs_from_pieces(
        dedup_text.simhash_pieces(docs, text_col="text", id_col="doc_id"),
        max_hamming=16, pair_cap=64)

    # band-store probe with the compaction-persisted df sidecar
    bands_small = bands.limit(2000).select(
        F.col("clip_id"), F.col("band_id"), F.col("band_hash"))
    bd_dir = os.path.join(st_dir, "bands")
    incremental.write_band_store(bands_small, "plans_band_store", bd_dir,
                                 n_buckets=8)
    incremental.compact_store(spark, "plans_band_store", bd_dir)
    band_df = incremental.read_band_df(spark, bd_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    band_probe = incremental.near_dup_candidates_vs_store(
        bands_small.limit(200), spark.table("plans_band_store"),
        max_df=16, store_df=band_df)
    plan_of(band_probe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    # semantic dedup + dHash banded join (small in-line inputs; the plan
    # shape is input-size independent)
    from go_cdc_chunkers_spark.operators import imagehash, similarity

    sd_emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0, 0.0]) for i in range(12)],
        "vec_id long, embedding array<double>")
    sd_cents = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id int, centroid array<double>")
    sem_dedup = similarity.semantic_dedup(sd_emb, sd_cents)
    dh = spark.createDataFrame(
        [(f"i{i}", (i * 2654435761) % (2**63)) for i in range(16)],
        "item_id string, dhash long")
    dhash_pairs = imagehash.dhash_near_pairs(dh, max_hamming=3)

    # video near-dup: plan shape over synthetic frame hashes (decode is an
    # upstream mapInPandas; the join/align shape is input-independent)
    from go_cdc_chunkers_spark.operators import avi

    vh = spark.createDataFrame(
        [(f"v{i % 4}", i % 10, (i * 2654435761) % (2**63)) for i in range(40)],
        "item_id string, frame_idx int, dhash long")
    video_pairs = avi.video_near_pairs(vh, persist_hashes=False)

    filled = iter([fp_pairs, probe, fp_scoped, sim_pairs, band_probe,
                   sem_dedup, dhash_pairs, video_pairs])
    sections = [
        (t, n, next(filled) if d is None else d) for t, n, d in sections
    ]

    out = io.StringIO()
    out.write("# PLANS - physical plans of the key operators\n\n")
    out.write("Generated by tools/explain_plans.py (re-run after changes).\n")
    out.write(f"Session: local[8], shuffle.partitions=8, AQE on. sf dir: {SF}\n\n")
    for title, note, df in sections:
        out.write(f"## {title}\n\n{note}\n\n```\n")
        out.write(plan_of(df).strip())
        out.write("\n```\n\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
