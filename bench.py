#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Workloads:
  - cdc_chunk_throughput: chunk a deterministic synthetic clips corpus
    (realistic 2-8 s pcm_s16le clips, parquet-cached under .bench/) with
    fastcdc-v1.0.0 -- the reference's headline benchmark shape (MB/s over
    seeded data, benchmarks/chunkers_test.go:23-29). Reports mb_per_sec.
  - neardup_pipeline: full pipeline (chunk -> minhash -> LSH -> verify ->
    connected components) -> clips_per_sec.
  - driver-table queries at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north_rule: throughput scaling efficiency >= 0.8 between
N and 4N executors; sandbox stand-in per the driver note: "the same job at
two parallelism levels (e.g. local[8] and local[32], or N and 4N cores)").
This box advertises 32 vCPUs but pure-CPU work (sha256 in N processes)
measures 1->8 procs ~linear and 8->32 only 1.9x -- i.e. ~8-15 effective
cores -- so the honest N vs 4N pair here is local[2] vs local[8]
(efficiency between *real* cores, not oversubscribed vCPU slots; the
measured curve is recorded in BASELINE.md). `python bench.py --scaling`
runs a replicated (compute-dominated) chunking job plus the pipeline at
both levels in fresh JVMs and reports throughputs + efficiency.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_CLIPS (default 600 base clips),
     SPARK_GRAFT_BENCH_REPL (default 24; scaling-run volume multiplier),
     SPARK_GRAFT_SKEW_CLIPS / SPARK_GRAFT_SKEW_CONST (default 6400/1600;
     the adversarial skew-evidence corpus, see skew_evidence()).

Evidence modes (beyond the default one-line bench): --scaling (N vs 4N
efficiency), --skew (candidate-stage hot-bucket growth), --store
(bucketed-store probe shuffle volumes, see store_evidence()), --sketch
(sidecar dedup-planning estimate cost vs exact store scan, see
sketch_evidence()),
--video (MJPEG frame-sampling decode cut: every_n vs full decode, see
video_evidence()),
--pipeline-scale (volume amortization), --bigfile (GB-scale ranged
chunking vs whole-buffer, stitch overhead + identity), --ab-pipeline
(interleaved fresh-JVM neardup_pipeline, head tree vs a snapshot-commit
worktree, default = previous round; SPARK_GRAFT_AB_REF overrides),
--rss (peak process-tree RSS per pipeline mode), --exact-first
(canonical-first per-stage savings), --normalize (codec-normalized
chunking: per-container MB-of-PCM/s, FLAC decode cost, cross-container
chunk identity).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(ROOT, ".bench")

CORPUS_KW = dict(dup_frac=0.2, near_frac=0.2, n_const=4, seed=42,
                 min_ms=2000, max_ms=8000)


def ensure_corpus(n_base: int) -> tuple[str, int, int]:
    """Write (once) and describe the parquet clips corpus. Returns
    (path, n_clips, total_bytes)."""
    from go_cdc_chunkers_spark.sources import clips as clips_src

    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"clips_{n_base}.parquet")
    meta = path + ".meta.json"
    if not (os.path.exists(path) and os.path.exists(meta)):
        rows, _ = clips_src.generate_clips(n_base=n_base, **CORPUS_KW)
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table({
            "clip_id": pa.array([r["clip_id"] for r in rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "sr_hz": pa.array([r["sr_hz"] for r in rows], pa.int32()),
            "dur_ms": pa.array([r["dur_ms"] for r in rows], pa.int32()),
            "codec": pa.array([r["codec"] for r in rows], pa.string()),
            "transcript": pa.array([r["transcript"] for r in rows], pa.string()),
        })
        pq.write_table(table, path, row_group_size=64)
        with open(meta, "w") as f:
            json.dump({"n": len(rows), "bytes": sum(len(r["bytes"]) for r in rows)}, f)
    with open(meta) as f:
        m = json.load(f)
    return path, m["n"], m["bytes"]


def chunk_throughput(spark, corpus_path: str, total_bytes: int, replicate: int,
                     cpus: int, digests=("sha256",)):
    """Chunk the corpus (optionally replicated x R) once per digest kind;
    returns {kind: (sec, MB/s, n_chunks)}. Warm-up pass first so
    Python-worker startup and first-touch page faults are excluded
    (steady-state throughput, like the reference's b.ResetTimer pattern in
    benchmarks/chunkers_test.go). Timed repetitions are INTERLEAVED across
    digest kinds so every kind samples the same noise windows -- a
    sequential A-then-B layout hands B the tail of A's warmup and makes the
    comparison (and the headline mb_per_sec) an artifact of run order."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.operators import chunking

    clips = spark.read.parquet(corpus_path).select("clip_id", "bytes")
    if replicate > 1:
        clips = clips.crossJoin(
            spark.range(replicate).select(F.col("id").alias("_rep"))
        ).withColumn("clip_id", F.concat_ws("#", "clip_id", "_rep")).drop("_rep")
    clips = clips.repartition(cpus * 2).cache()
    clips.count()
    chunked = {
        d: chunking.chunk_clips(clips, "fastcdc-v1.0.0", digest=d)
        for d in digests
    }
    # Warm-up to steady state: on this Firecracker VM the first ~4 identical
    # jobs ramp from ~60 to ~1500 MB/s as the JVM heap is first-touched and
    # codegen JIT-compiles (measured 10-iteration curve in BASELINE.md);
    # keep warming until two consecutive runs are within 25%, then time.
    # Same discipline as the reference's b.ResetTimer.
    prev = None
    for _ in range(6):
        t = time.time()
        chunked[digests[0]].count()
        dt = time.time() - t
        if prev is not None and dt > prev * 0.75:
            break
        prev = dt
    best = {d: float("inf") for d in digests}
    n_chunks = {d: 0 for d in digests}
    for _ in range(4):
        for d in digests:
            t = time.time()
            n_chunks[d] = chunked[d].count()
            best[d] = min(best[d], time.time() - t)
    vol = total_bytes * replicate
    clips.unpersist()
    return {d: (best[d], vol / 1e6 / best[d], n_chunks[d]) for d in digests}


def run_workloads(spark, sf_dir: str, n_base: int, cpus: int, replicate: int = 1):
    from go_cdc_chunkers_spark import entry_queries as EQ
    from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    corpus, n_clips, total_bytes = ensure_corpus(n_base)
    extras["n_clips"] = n_clips
    extras["corpus_mb"] = round(total_bytes / 1e6, 1)

    # Replicate the corpus to ~3.3 GB for the throughput workload: at 139 MB
    # the timed job is scheduler-latency-bound (~1 s) and mb_per_sec reads
    # 10x below the engine's real rate; longer timed jobs also average over
    # this VM's second-scale noisy-neighbor jitter.
    # sha256 (the headline, reference-parity identity) and poly128 (the
    # cheap near-dup identity, PipelineConfig.digest_kind) timed with
    # interleaved repetitions -- same noise windows for both.
    thr_repl = max(replicate, 24)
    res = chunk_throughput(spark, corpus, total_bytes, thr_repl, cpus,
                           digests=("sha256", "poly128"))
    dt, mbs, n_chunks = res["sha256"]
    timings["cdc_chunk_throughput"] = round(dt, 3)
    extras["mb_per_sec"] = round(mbs, 2)
    extras["n_chunks"] = n_chunks
    extras["throughput_replicate"] = thr_repl
    dt_p, mbs_p, _ = res["poly128"]
    timings["cdc_chunk_throughput_poly128"] = round(dt_p, 3)
    extras["mb_per_sec_poly128"] = round(mbs_p, 2)

    # Chunk geometry tracks clip size: the near-dup channel needs chunks
    # <= clip_bytes/(4*n_edits); bench clips are 2-8 s (~160 KB), so
    # 1 KB-average chunks keep the Jaccard signal with 4x fewer rows
    # than the tiny-clip test geometry. Best-of-2 fresh-workdir runs: the
    # pipeline is ~40 Spark jobs of mostly fixed latency at this corpus
    # size and a single run can land in a noisy-neighbor window.
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts

    clips = spark.read.parquet(corpus).repartition(cpus * 2).cache()
    clips.count()
    best = float("inf")
    for _ in range(2):
        wd = tempfile.mkdtemp(prefix="bench_pipe_")
        try:
            cfg = PipelineConfig(chunk_opts=ChunkerOpts(
                min_size=256, normal_size=1024, max_size=8192))
            pipe = Pipeline(spark, wd, cfg)
            t = time.time()
            pipe.run(clips).count()
            best = min(best, time.time() - t)
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    timings["neardup_pipeline"] = round(best, 3)
    extras["clips_per_sec"] = round(n_clips / best, 2)
    clips.unpersist()

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

    # Edit-robustness sweep (cmd/cdc/resync.go headline quality story):
    # shared% of original chunk digests after N sample insertions per clip.
    # Monotone decay is asserted in tests/test_entry_contract.py; the curve
    # itself is the bench evidence.
    t = time.time()
    sweep = sorted(
        EQ.QUERIES["cdc_resync_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["n_edits"],
    )
    timings["cdc_resync_sweep"] = round(time.time() - t, 3)
    for r in sweep:
        extras[f"resync_shared_pct_n{r['n_edits']}"] = round(r["shared_pct"], 4)
    extras["resync_monotone"] = all(
        b["shared_pct"] < a["shared_pct"] for a, b in zip(sweep, sweep[1:])
    )

    # Candidate-stage skew evidence (adversarial 20%-constant corpus, 8k
    # clips): capped-mode timing + hot-bucket geometry only. The uncapped
    # quadratic contrast arm runs under `python bench.py --skew` (growth
    # curve at two corpus sizes) -- paying for it in every default bench
    # buried the cross-round regression signal (VERDICT r4 item 4).
    t = time.time()
    extras.update(skew_evidence(spark, cpus, include_uncapped=False))
    timings["skew_candidate_stage"] = round(time.time() - t, 3)

    return timings, extras


def ensure_skew_corpus(n_base: int, n_const: int) -> tuple[str, int]:
    """Adversarial 20%-constant-PCM corpus (FIXTURES.md F5 at volume):
    constant clips collapse to one MinHash signature per fill group, so
    every band maps each group to ONE hot bucket. Cached parquet."""
    from go_cdc_chunkers_spark.sources import clips as clips_src

    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"skew_{n_base}_{n_const}.parquet")
    if not os.path.exists(path):
        clips_src.write_clips_parquet(
            path, n_base=n_base, dup_frac=0.0, near_frac=0.0, n_const=n_const,
            seed=1337, min_ms=500, max_ms=2000)
    return path, n_base + n_const


def skew_evidence(spark, cpus: int, n_base: int | None = None,
                  n_const: int | None = None,
                  include_uncapped: bool = True) -> dict:
    """VERDICT r2 item 8 / SCALE.md P7 evidence: candidate-stage skew on an
    adversarial corpus (default 8,000 clips, 20% constant PCM in two
    identical-signature groups). Reports the hot-bucket geometry, the
    pairs-per-bucket work distribution (the quadratic driver of task-time
    skew: one shuffle task owns its bucket's m(m-1)/2 pairs), and measured
    wall-clock of the candidate stage with the star fallback (pair_cap=64,
    the shipped path) vs uncapped pairwise joins. `--skew` runs this at two
    corpus sizes: star-edge count grows linearly in bucket size while the
    uncapped pair count grows quadratically -- the measured growth curve is
    the 100x-scale-up argument (SCALE.md P7)."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.operators import candidates as cand_ops
    from go_cdc_chunkers_spark.operators import chunking, signatures

    if n_base is None:
        n_base = int(os.environ.get("SPARK_GRAFT_SKEW_CLIPS", "6400"))
    if n_const is None:
        n_const = int(os.environ.get("SPARK_GRAFT_SKEW_CONST", str(n_base // 4)))
    path, n_clips = ensure_skew_corpus(n_base, n_const)

    # Band relation cached as parquet keyed by corpus + signature config:
    # the chunk/minhash/band prep is already regression-timed every run by
    # cdc_chunk_throughput and neardup_pipeline, so re-deriving it here
    # only inflates skew_candidate_stage with work the row is not about.
    # Cached, the row times exactly what it claims: the candidate join
    # under an adversarial hot-bucket distribution (VERDICT r4 item 4).
    bpath = os.path.join(BENCH_DIR, f"skewbands_k128b32r4_{n_base}_{n_const}.parquet")
    if not os.path.exists(os.path.join(bpath, "_SUCCESS")):
        # _SUCCESS, not the bare dir: a killed prior write must regenerate,
        # not silently benchmark a truncated band relation
        clips = spark.read.parquet(path).repartition(cpus * 2)
        chunks = chunking.chunk_clips(
            clips, "fastcdc-v1.0.0",
            ChunkerOpts(min_size=256, normal_size=1024, max_size=8192))
        sig = signatures.minhash_signatures(chunks, k=128)
        signatures.lsh_bands(sig, 32, 4, src="pcm").write.mode(
            "overwrite").parquet(bpath)
    bands = spark.read.parquet(bpath).persist()
    bands.count()

    ev: dict = {"skew_n_clips": n_clips, "skew_const_frac": round(n_const / n_clips, 3)}
    bucket_sizes = bands.groupBy("band_id", "band_hash").count()
    stats = bucket_sizes.agg(
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.5)").alias("med"),
        F.sum(F.expr("count*(count-1)/2")).cast("long").alias("pairs_uncapped_total"),
        F.max(F.expr("count*(count-1)/2")).cast("long").alias("pairs_hot_bucket"),
    ).collect()[0]
    ev["skew_bucket_max"] = int(stats["mx"])
    ev["skew_bucket_median"] = int(stats["med"])
    ev["skew_pairs_hot_bucket"] = int(stats["pairs_hot_bucket"])
    ev["skew_pairs_total_uncapped"] = int(stats["pairs_uncapped_total"])

    # Interleaved best-of-2 per mode (same discipline as chunk_throughput:
    # a sequential cold-first layout would charge warm-up to whichever mode
    # runs first and make the speedup a run-order artifact). The uncapped
    # arm is a deliberately-quadratic contrast workload; default bench runs
    # capped-only so engine_bench_total stays a like-for-like regression
    # signal (VERDICT r4 item 4).
    # "salted" = the exact pair set with the hot buckets' quadratic work
    # salted across G = ceil(m/64) join keys per bucket (candidates.py
    # skew_mode="salted") -- same pair count as uncapped, but no single
    # task owns a whole bucket's m^2/2 output.
    modes = (("capped", 64, "star"), ("salted", 64, "salted"),
             ("uncapped", 1 << 30, "star")) if include_uncapped \
        else (("capped", 64, "star"),)
    best = {m: float("inf") for m, _, _ in modes}
    counts = {}
    for _ in range(2):
        for mode, cap, skew_mode in modes:
            t = time.time()
            counts[mode] = cand_ops.candidate_pairs(
                bands, pair_cap=cap, shuffle_partitions=cpus * 2,
                skew_mode=skew_mode,
            ).count()
            best[mode] = min(best[mode], time.time() - t)
    for mode, _, _ in modes:
        ev[f"skew_candidates_sec_{mode}"] = round(best[mode], 3)
        ev[f"skew_candidates_{mode}"] = counts[mode]
    bands.unpersist()
    if include_uncapped:
        ev["skew_speedup_star_vs_uncapped"] = round(
            ev["skew_candidates_sec_uncapped"] / ev["skew_candidates_sec_capped"], 2)
        ev["skew_speedup_salted_vs_uncapped"] = round(
            ev["skew_candidates_sec_uncapped"] / ev["skew_candidates_sec_salted"], 2)
        ev.update(_single_bucket_salt_arm(spark, cpus))
    return ev


def _single_bucket_salt_arm(spark, cpus: int, m: int = 3200) -> dict:
    """The case salting is FOR: one hot bucket concentrated on ONE join key
    (the 32-band corpus above spreads its constant-PCM clique over 64 keys,
    so even the uncapped join parallelizes -- real skew is a clique that
    collides in few bands). m members -> m(m-1)/2 pairs on a single key.
    Exact-pair arms, interleaved best-of-2 each:
      - uncapped with AQE skew-join ON (Spark's runtime salting: splits the
        skewed SMJ partition and duplicates the other side);
      - uncapped with AQE OFF (the one-task emission floor);
      - salted with AQE OFF (candidates.py static salting: the bound holds
        with no runtime re-plan to lean on).
    Measured conclusion (recorded honestly in BASELINE.md): at sandbox
    scale the arms TIE -- the m^2/2-pair dedup groupBy downstream dominates
    and parallelizes in every mode, so single-key emission is a small
    fraction of wall-clock until m is far beyond where exact enumeration
    is the right tool at all (star-cap is). The salted mode's value is
    semantic (the exact pair set where star trades it away) plus a static
    per-task emission bound that does not depend on AQE being on; it is
    NOT a wall-clock win here, and the numbers say so."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.operators import candidates as cand_ops

    hot = (spark.range(m)
           .select(F.lit(0).alias("band_id"), F.lit(1).alias("band_hash"),
                   F.format_string("c%07d", "id").alias("clip_id"),
                   F.lit("pcm").alias("src"))
           .persist())
    hot.count()
    arms = (("uncapped_aqe", 1 << 30, "star", "true"),
            ("uncapped_noaqe", 1 << 30, "star", "false"),
            ("salted_noaqe", 64, "salted", "false"))
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    best = {a: float("inf") for a, _, _, _ in arms}
    counts = {}
    try:
        for _ in range(2):
            for arm, cap, skew_mode, aqe in arms:
                spark.conf.set("spark.sql.adaptive.enabled", aqe)
                t = time.time()
                counts[arm] = cand_ops.candidate_pairs(
                    hot, pair_cap=cap, shuffle_partitions=cpus * 2,
                    skew_mode=skew_mode).count()
                best[arm] = min(best[arm], time.time() - t)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        hot.unpersist()
    assert len(set(counts.values())) == 1, counts  # all exact: same pairs
    ev = {"onebucket_m": m, "onebucket_pairs": counts["salted_noaqe"]}
    for arm, _, _, _ in arms:
        ev[f"onebucket_sec_{arm}"] = round(best[arm], 3)
    ev["onebucket_salted_vs_serial"] = round(
        best["uncapped_noaqe"] / best["salted_noaqe"], 2)
    ev["onebucket_salted_vs_aqe"] = round(
        best["uncapped_aqe"] / best["salted_noaqe"], 2)
    return ev


def _synth_chunk_rows(spark, n: int, salt: str, n_dup_of: tuple[str, int] | None = None):
    """Synthetic chunk-store relation (clip_id, chunk_idx, length,
    chunk_hash): realistic key width (32-byte sha2) without chunking
    gigabytes -- probe mechanics depend only on the relation shape.
    n_dup_of=(store_salt, k): the first k rows reuse the store's hashes
    (the batch's dup fraction)."""
    from pyspark.sql import functions as F

    df = spark.range(n)
    h = F.sha2(F.concat(F.lit(salt), F.col("id").cast("string")), 256)
    if n_dup_of:
        s_salt, k = n_dup_of
        hs = F.sha2(F.concat(F.lit(s_salt), F.col("id").cast("string")), 256)
        h = F.when(F.col("id") < k, hs).otherwise(h)
    return df.select(
        F.concat(F.lit("c"), (F.col("id") / 100).cast("long").cast("string")).alias("clip_id"),
        (F.col("id") % 100).cast("int").alias("chunk_idx"),
        F.lit(1024).alias("length"),
        F.unhex(h).alias("chunk_hash"),
    )


def _exec_count_with_shuffle(df) -> tuple[int, float, int]:
    """Execute count(*) over df and return (count, seconds,
    total shuffle bytes written) from the SAME execution's SQL metrics.
    Shuffle volume is the scale-honest metric on a single box: local
    'shuffles' move through memory at GB/s, so wall-clock hides exactly
    the cost that dominates on a 1000-executor cluster network."""
    from pyspark.sql import functions as F

    cnt_df = df.agg(F.count("*").alias("n"))
    t = time.time()
    n = cnt_df.collect()[0]["n"]
    sec = time.time() - t

    total = 0

    def walk(node):
        nonlocal total
        cls = node.getClass().getSimpleName()
        if cls.startswith("ReusedExchange"):
            # a reused exchange mirrors the original's metrics and subtree;
            # counting or recursing would double-count the one physical
            # shuffle
            return
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleBytesWritten":
                total += kv._2().value()
        if node.nodeName() == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(cnt_df._jdf.queryExecution().executedPlan())
    return int(n), sec, int(total)


def store_evidence(cpus: int) -> dict:
    """Bucketed-store probe evidence (operators/incremental.py): measure a
    fixed 400k-row batch probed against chunk stores of 4M and 16M rows,
    (a) bucketed layout vs (b) plain parquet, plus the broadcast-inverted
    small-batch path. The headline metric is measured SHUFFLE VOLUME (from
    each execution's own SQL metrics), not wall-clock: on one box a
    'shuffle' moves through memory at GB/s, so elapsed time hides exactly
    the cost that dominates a 1000-executor cluster's network. Claims under
    measurement:
      - the plain store shuffles O(store) bytes per probe and the bucketed
        store shuffles only the batch, so the shuffle saved -> 100% as the
        store grows while the batch stays fixed;
      - the broadcast-inverted path shuffles only batch-sized distincts
        regardless of layout;
      - wall-clock is reported for completeness but is near-noise here.
    Results land in BENCH/BASELINE.md; run: python bench.py --store."""
    from go_cdc_chunkers_spark.operators import incremental
    from go_cdc_chunkers_spark.session import get_spark

    n_batch = 400_000
    sizes = tuple(
        int(s) * 1_000_000 for s in
        os.environ.get("SPARK_GRAFT_STORE_SIZES", "4,16").split(",")
        if s.strip())
    spark = get_spark(app="bench-store", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    ev: dict = {"store_batch_rows": n_batch, "store_sizes": list(sizes)}
    try:
        # broadcast would hide the join shape under test (the 400k batch is
        # deliberately broadcastable; production batches are not)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = None
        for n in sizes:
            tag = f"{n // 1_000_000}m"
            bpath = os.path.join(BENCH_DIR, f"store_bucketed_{tag}")
            ppath = os.path.join(BENCH_DIR, f"store_plain_{tag}")
            table = f"bench_store_{tag}"
            rows = _synth_chunk_rows(spark, n, salt=f"st{tag}")
            cached = all(os.path.exists(os.path.join(bpath, f))
                         for f in ("_SUCCESS", "_store_meta.json"))
            if not cached:  # also rebuilds pre-metadata cache dirs
                incremental.write_chunk_store(rows, table, bpath, n_buckets=64)
            else:
                incremental.register_chunk_store(spark, table, bpath)
            if not os.path.exists(os.path.join(ppath, "_SUCCESS")):
                rows.write.mode("overwrite").parquet(ppath)
            batch = _synth_chunk_rows(
                spark, n_batch, salt=f"nb{tag}",
                n_dup_of=(f"st{tag}", n_batch // 2)).cache()
            batch.count()

            modes = {
                "bucketed": lambda: incremental.probe_store(
                    batch, spark.table(table)),
                "plain": lambda: incremental.probe_store(
                    batch, spark.read.parquet(ppath)),
                "broadcast": lambda: incremental.probe_store(
                    batch, spark.table(table), broadcast_batch=True),
            }
            for fn in modes.values():  # warm page cache + JIT before timing
                fn().count()
            best = {m: float("inf") for m in modes}
            hits, shuf = {}, {}
            for _ in range(2):  # interleaved best-of-2 (skew_evidence note)
                for m, fn in modes.items():
                    cnt, sec, sb = _exec_count_with_shuffle(fn())
                    hits[m], shuf[m] = cnt, sb
                    best[m] = min(best[m], sec)
            assert len(set(hits.values())) == 1, hits  # all plans agree
            ev[f"store_probe_hits_{tag}"] = hits["bucketed"]
            for m in modes:
                ev[f"store_probe_sec_{m}_{tag}"] = round(best[m], 3)
                ev[f"store_probe_shuffle_mb_{m}_{tag}"] = round(
                    shuf[m] / 1e6, 2)
            ev[f"store_shuffle_saved_vs_plain_{tag}"] = round(
                (shuf["plain"] - shuf["bucketed"]) / max(shuf["plain"], 1), 4)
            batch.unpersist()
        if len(sizes) >= 2:  # growth is meaningless from a single point
            t0, t1 = (f"{sizes[0] // 1_000_000}m", f"{sizes[-1] // 1_000_000}m")
            ev["store_growth_factor"] = round(sizes[-1] / sizes[0], 1)
            ev["store_probe_growth_bucketed"] = round(
                ev[f"store_probe_sec_bucketed_{t1}"]
                / ev[f"store_probe_sec_bucketed_{t0}"], 2)
            ev["store_probe_growth_broadcast"] = round(
                ev[f"store_probe_sec_broadcast_{t1}"]
                / ev[f"store_probe_sec_broadcast_{t0}"], 2)
    finally:
        spark.stop()
    return ev


def sketch_evidence(cpus: int) -> dict:
    """Dedup-planning estimate cost (operators/incremental.py sketch
    sidecar + operators/sketches.py): the petabyte question "how much
    would appending this batch actually add?" answered WITHOUT touching
    the store's data. Reuses store_evidence's cached bucketed stores
    (SPARK_GRAFT_STORE_SIZES, default 4M/16M rows). Claims under
    measurement:
      - estimate_vs_store reads sidecar + batch only -- proven by
        estimating from a directory holding NOTHING but the _sketch
        sidecar (kilobytes on disk, size reported) and, for the real
        store, by the flat estimate time as the store grows 4x;
      - the exact answer (left_anti novel count) must scan the store,
        so its cost grows with it -- that growth ratio is reported as
        the contrast arm;
      - the HLL novel-unique estimate lands within a few % of the
        exact count (both reported; the batch is 400k rows, half dups
        of store hashes, so truth is 200k novel uniques).
    Run: python bench.py --sketch."""
    import shutil

    from go_cdc_chunkers_spark.operators import incremental
    from go_cdc_chunkers_spark.session import get_spark

    n_batch = 400_000
    sizes = tuple(
        int(s) * 1_000_000 for s in
        os.environ.get("SPARK_GRAFT_STORE_SIZES", "4,16").split(",")
        if s.strip())
    spark = get_spark(app="bench-sketch", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    ev: dict = {"sketch_batch_rows": n_batch,
                "sketch_store_sizes": list(sizes),
                "sketch_k": incremental.DEFAULT_SKETCH_K}
    try:
        for n in sizes:
            tag = f"{n // 1_000_000}m"
            bpath = os.path.join(BENCH_DIR, f"store_bucketed_{tag}")
            table = f"bench_store_{tag}"
            rows = _synth_chunk_rows(spark, n, salt=f"st{tag}")
            cached = all(os.path.exists(os.path.join(bpath, f))
                         for f in ("_SUCCESS", "_store_meta.json"))
            if not cached:
                incremental.write_chunk_store(rows, table, bpath,
                                              n_buckets=64)
            else:
                incremental.register_chunk_store(spark, table, bpath)
            if incremental.read_store_sketch_meta(bpath) is None:
                t = time.time()  # one-time backfill: ONE store scan
                incremental.write_store_sketch(spark, spark.table(table),
                                               bpath)
                ev[f"sketch_build_sec_{tag}"] = round(time.time() - t, 3)
            sk_dir = os.path.join(bpath, incremental._SKETCH_DIR)
            ev[f"sketch_sidecar_kb_{tag}"] = round(sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(sk_dir) for f in fs) / 1024, 1)
            ev[f"sketch_store_disk_mb_{tag}"] = round(sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(bpath) for f in fs
                if incremental._SKETCH_DIR not in r) / 1e6, 1)
            batch = _synth_chunk_rows(
                spark, n_batch, salt=f"nb{tag}",
                n_dup_of=(f"st{tag}", n_batch // 2)).cache()
            batch.count()
            # the no-scan proof: a dir holding ONLY the sidecar
            bare = os.path.join(BENCH_DIR, f"sketch_only_{tag}")
            shutil.rmtree(bare, ignore_errors=True)
            os.makedirs(bare)
            shutil.copytree(sk_dir, os.path.join(
                bare, incremental._SKETCH_DIR))
            est = incremental.estimate_vs_store(spark, batch, bare)  # warm
            best_est = float("inf")
            best_exact = float("inf")
            exact = -1
            for _ in range(2):  # interleaved best-of-2 after warm
                t = time.time()
                est = incremental.estimate_vs_store(spark, batch, bare)
                best_est = min(best_est, time.time() - t)
                t = time.time()
                exact = (incremental.novel_chunks(batch,
                                                  spark.table(table))
                         .select("chunk_hash").distinct().count())
                best_exact = min(best_exact, time.time() - t)
            ev[f"sketch_estimate_sec_{tag}"] = round(best_est, 3)
            ev[f"sketch_exact_novel_sec_{tag}"] = round(best_exact, 3)
            ev[f"sketch_novel_est_{tag}"] = est["novel_unique_est"]
            ev[f"sketch_novel_exact_{tag}"] = exact
            ev[f"sketch_novel_rel_err_{tag}"] = round(
                abs(est["novel_unique_est"] - exact) / max(exact, 1), 4)
            ev[f"sketch_containment_est_{tag}"] = \
                est["containment_batch_in_store_est"]
            batch.unpersist()
        if len(sizes) >= 2:
            t0 = f"{sizes[0] // 1_000_000}m"
            t1 = f"{sizes[-1] // 1_000_000}m"
            ev["sketch_store_growth_factor"] = round(sizes[-1] / sizes[0], 1)
            ev["sketch_estimate_growth"] = round(
                ev[f"sketch_estimate_sec_{t1}"]
                / ev[f"sketch_estimate_sec_{t0}"], 2)
            ev["sketch_exact_novel_growth"] = round(
                ev[f"sketch_exact_novel_sec_{t1}"]
                / ev[f"sketch_exact_novel_sec_{t0}"], 2)
    finally:
        spark.stop()
    return ev


def submit_scaling_evidence() -> dict:
    """North-rule deployment shape, measured literally: the PACKAGED
    pipeline (`tools/package.py` zip) run via `spark-submit --py-files`
    from a scratch cwd (imports resolve through the zip only, like a
    cluster) at --master local[2] (N) and local[8] (4N) over the same
    deterministic synthetic corpus. Interleaved best-of-2 per
    configuration; a FRESH workdir per run (the pipeline resumes from
    checkpoints, so a reused workdir would skip the stages under
    measurement). Throughput is the job's own internal wall (its printed
    `seconds`, inside the session), with the whole-process wall recorded
    next to it so the fixed submit+JVM startup cost stays visible.

    Each level also runs a DOUBLED corpus: at sandbox scale the E2E time
    is dominated by fixed per-run latency (9 checkpointed stage
    boundaries, CC-round floors, scheduler latency -- ~28 s at local[8]
    regardless of corpus) that a 10^12-clip deployment amortizes to
    nothing, so the raw E2E ratio measures the floor, not the engine.
    Decomposition is done PER STAGE from each run's own lineage.jsonl
    (stage wall minima across reps), not by differencing noisy run
    totals: stage_marginal = t(2x) - t(1x), stage_floor = 2*t(1x) -
    t(2x), both per level, summed across the 10 stages. Three views are
    reported next to each other -- raw E2E efficiency, the 2x-size
    stage-sum ratio, and the floor/compute split per level -- because on
    this VM cold fresh-JVM runs swing +-25% per stage and no single
    number is trustworthy alone. Run: python bench.py --submit-scaling
    (SPARK_GRAFT_SUBMIT_CLIPS base clips, doubled arm 2x;
    SPARK_GRAFT_SUBMIT_REPS interleaved repetitions, default 3).
    """
    import shutil
    import subprocess

    n_base = int(os.environ.get("SPARK_GRAFT_SUBMIT_CLIPS", "6000"))
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "package.py")],
                   check=True, capture_output=True)
    zip_path = os.path.join(ROOT, "dist", "go_cdc_chunkers_spark.zip")
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    scratch = os.path.join(BENCH_DIR, "submit_scaling")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    job = os.path.join(scratch, "pipeline.py")
    shutil.copyfile(os.path.join(ROOT, "jobs", "pipeline.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    levels = (2, 8)
    sizes = (n_base, 2 * n_base)
    best = {}    # (level, size) -> best internal sec
    walls = {}   # (level, size) -> best whole-process sec
    n_clips = {}  # size -> clips
    # Per-run timeout + one retry: a rare local-mode scheduler race can
    # hang a run indefinitely (components.py module docstring); a hung
    # run is killed, counted honestly, and retried once in a fresh
    # workdir rather than poisoning the whole evidence run.
    run_timeout = int(os.environ.get("SPARK_GRAFT_SUBMIT_TIMEOUT", "900"))
    hung = 0
    run_id = 0
    stage_best: dict = {}  # (level, size, stage) -> min sec
    reps = int(os.environ.get("SPARK_GRAFT_SUBMIT_REPS", "3"))
    for _ in range(reps):
        for n in levels:
            for nb in sizes:
                run_id += 1
                for attempt in (1, 2):
                    wd = os.path.join(scratch, f"wd{run_id}_{attempt}")
                    t = time.time()
                    try:
                        proc = subprocess.run(
                            [submit, "--master", f"local[{n}]",
                             # a real executor gets several GB; submit's 1g
                             # default is a misconfiguration for binary-
                             # heavy tables, not a level playing field
                             "--driver-memory",
                             os.environ.get("SPARK_GRAFT_SUBMIT_MEM", "4g"),
                             "--py-files", zip_path,
                             job, "--synthetic", str(nb), "--workdir", wd,
                             "--cpus", str(n)],
                            capture_output=True, text=True,
                            timeout=run_timeout, cwd=scratch, env=env)
                    except subprocess.TimeoutExpired:
                        hung += 1
                        shutil.rmtree(wd, ignore_errors=True)
                        if attempt == 2:
                            raise
                        continue
                    wall = time.time() - t
                    if proc.returncode != 0:
                        raise RuntimeError(proc.stderr[-2000:])
                    out = json.loads([ln for ln in proc.stdout.splitlines()
                                      if ln.startswith("{")][-1])
                    n_clips[nb] = out["clips"]
                    k = (n, nb)
                    best[k] = min(best.get(k, float("inf")), out["seconds"])
                    walls[k] = min(walls.get(k, float("inf")), wall)
                    with open(os.path.join(wd, "lineage.jsonl")) as f:
                        for line in f:
                            r = json.loads(line)
                            dur = r["finished"] - r["started"]
                            sk = (n, nb, r["stage"])
                            stage_best[sk] = min(
                                stage_best.get(sk, float("inf")), dur)
                    shutil.rmtree(wd, ignore_errors=True)
                    break
    lo, hi = levels
    s1, s2 = sizes
    cps = {n: round(n_clips[s1] / best[(n, s1)], 2) for n in levels}
    stages = sorted({s for (_, _, s) in stage_best})
    # per-level per-stage linear split from the stage minima themselves:
    # t(1x) = floor + m, t(2x) = floor + 2m  (clamped at 0)
    floor, marg, ssum = {}, {}, {}
    for n in levels:
        m = {s: max(stage_best[(n, s2, s)] - stage_best[(n, s1, s)], 0.0)
             for s in stages}
        f = {s: max(stage_best[(n, s1, s)] - m[s], 0.0) for s in stages}
        marg[n] = sum(m.values())
        floor[n] = sum(f.values())
        ssum[n] = sum(stage_best[(n, s2, s)] for s in stages)
    ev = {
        "submit_n_base": n_base,
        "submit_sizes_clips": [n_clips[s1], n_clips[s2]],
        "submit_levels": list(levels),
        "submit_reps": reps,
        "submit_hung_runs": hung,
    }
    for n in levels:
        ev[f"submit_internal_sec_local{n}"] = round(best[(n, s1)], 2)
        ev[f"submit_internal_sec_local{n}_2x"] = round(best[(n, s2)], 2)
        ev[f"submit_wall_sec_local{n}"] = round(walls[(n, s1)], 2)
        ev[f"submit_clips_per_sec_local{n}"] = cps[n]
        ev[f"submit_stage_sum_sec_local{n}_2x"] = round(ssum[n], 2)
        ev[f"submit_floor_sec_local{n}"] = round(floor[n], 2)
        ev[f"submit_marginal_sec_per_x_local{n}"] = round(marg[n], 2)
        ev[f"submit_stage_sec_local{n}_2x"] = {
            s: round(stage_best[(n, s2, s)], 2) for s in stages}
    ev["submit_scaling_efficiency_e2e"] = round(
        (cps[hi] / cps[lo]) / (hi / lo), 3)
    ev["submit_scaling_efficiency_stage_sum_2x"] = round(
        (ssum[lo] / ssum[hi]) / (hi / lo), 3)
    if marg[hi] > 0:
        ev["submit_scaling_efficiency_marginal"] = round(
            (marg[lo] / marg[hi]) / (hi / lo), 3)
    return ev


def one_session(cpus: int, sf_dir: str, n_base: int, replicate: int, app: str):
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app=app, cpus=cpus, shuffle_partitions=max(cpus, 8))
    try:
        return run_workloads(spark, sf_dir, n_base, cpus, replicate)
    finally:
        spark.stop()


def chunk_only_session(cpus: int, n_base: int, replicate: int):
    from go_cdc_chunkers_spark.session import get_spark

    corpus, n_clips, total_bytes = ensure_corpus(n_base)
    spark = get_spark(app=f"chunk-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    try:
        dt, mbs, n_chunks = chunk_throughput(
            spark, corpus, total_bytes, replicate, cpus)["sha256"]
        return {"cpus": cpus, "sec": round(dt, 3), "mb_per_sec": round(mbs, 2),
                "n_chunks": n_chunks}
    finally:
        spark.stop()


class RssSampler:
    """Peak-RSS sampling over this process tree (driver python + the local
    JVM + pyspark workers), the cmd/cdcbench memory story
    (/root/reference/cmd/cdcbench/bench.go:138-173 samples RSS/GC over the
    run): a daemon thread sums /proc/<pid>/status VmRSS across all
    descendants every `interval` seconds and keeps the max. On a real
    cluster Spark's executor metrics carry this; locally the process tree
    IS the cluster."""

    def __init__(self, interval: float = 0.5):
        import threading

        self.interval = interval
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)

    @staticmethod
    def _descendants_rss() -> int:
        me = os.getpid()
        ppid_of, rss_of = {}, {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/status") as f:
                    ppid = rss = 0
                    for line in f:
                        if line.startswith("PPid:"):
                            ppid = int(line.split()[1])
                        elif line.startswith("VmRSS:"):
                            rss = int(line.split()[1]) * 1024
                ppid_of[int(d)], rss_of[int(d)] = ppid, rss
            except OSError:
                continue
        total = rss_of.get(me, 0)
        members = {me}
        # pids are unordered; iterate to closure (tree depth is tiny)
        changed = True
        while changed:
            changed = False
            for pid, ppid in ppid_of.items():
                if ppid in members and pid not in members:
                    members.add(pid)
                    total += rss_of.get(pid, 0)
                    changed = True
        return total

    def _loop(self):
        while not self._stop.is_set():
            try:
                self.peak = max(self.peak, self._descendants_rss())
            except OSError:
                pass
            self._stop.wait(self.interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=5)
        return False

    @property
    def peak_mb(self) -> float:
        return round(self.peak / 1e6, 1)


def _jvm_gc_stats(spark) -> tuple[int, int]:
    """(collections, ms) summed over the local JVM's GC beans -- the
    cmd/cdcbench GC-count story (bench.go:138-173 reports ~840 GCs for
    the default buffers vs 41 pooled) read from the live JVM."""
    beans = spark._jvm.java.lang.management.ManagementFactory \
        .getGarbageCollectorMXBeans()
    it = beans.iterator()
    n = ms = 0
    while it.hasNext():
        b = it.next()
        n += max(b.getCollectionCount(), 0)
        ms += max(b.getCollectionTime(), 0)
    return int(n), int(ms)


def pipeline_session(cpus: int, n_base: int, exact_first: bool = False,
                     ranged: bool = False):
    """One fresh-JVM pipeline run; returns clips/sec + per-stage seconds
    (from the pipeline's own lineage rows) + peak process-tree RSS + the
    run's JVM GC collection count/time delta.
    ranged=True sets max_cell_bytes=128 KB, routing the 4-8 s clips
    (~128-256 KB) through the bounded-memory ranged chunker."""
    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
    from go_cdc_chunkers_spark.session import get_spark

    corpus, n_clips, total_bytes = ensure_corpus(n_base)
    spark = get_spark(app=f"pipe-{n_base}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    wd = tempfile.mkdtemp(prefix=f"bench_pipe_{n_base}_")
    try:
        clips = spark.read.parquet(corpus).repartition(cpus * 2).cache()
        clips.count()
        cfg = PipelineConfig(chunk_opts=ChunkerOpts(
            min_size=256, normal_size=1024, max_size=8192),
            exact_first=exact_first,
            max_cell_bytes=(128 << 10) if ranged else None)
        pipe = Pipeline(spark, wd, cfg)
        gc0 = _jvm_gc_stats(spark)
        with RssSampler() as rss:
            t = time.time()
            pipe.run(clips).count()
            dt = time.time() - t
        gc1 = _jvm_gc_stats(spark)
        stages = {}
        extras = {}
        with open(os.path.join(wd, "lineage.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                stages[row["stage"]] = round(row["finished"] - row["started"], 3)
                if row["stage"] == "bigfile_stitch":
                    extras["bigfile_routed_files"] = row["rows_out"]
                    extras["bigfile_fallback_files"] = row["bigfile_fallback_files"]
        return {
            "cpus": cpus, "n_clips": n_clips,
            "corpus_mb": round(total_bytes / 1e6, 1),
            "sec": round(dt, 3), "clips_per_sec": round(n_clips / dt, 2),
            "peak_rss_mb": rss.peak_mb,
            "gc_collections": gc1[0] - gc0[0],
            "gc_ms": gc1[1] - gc0[1],
            "stage_sec": stages, **extras,
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def video_evidence(cpus: int) -> dict:
    """Frame-sampling decode economics for the MJPEG video channel
    (operators/avi.py): the AVI container gives frame boundaries without
    decoding (each 00dc chunk is a standalone JPEG), so hashing every Nth
    frame should cost ~1/N of the full decode -- that's the claim SCALE.md
    makes for the thumbnail pass; this measures it. Corpus is encoded once
    and cached under .bench; timing is warm best-of-3, alternating full /
    sampled. Also asserts the sampling invariant on the measured runs:
    every_n hashes == the full run's rows at frame_idx % N == 0."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.entry_queries import _video_frames
    from go_cdc_chunkers_spark.operators.avi import avi_encode, mjpeg_frame_hashes
    from go_cdc_chunkers_spark.session import get_spark

    n_videos, n_frames, every_n = (
        int(s) for s in os.environ.get("SPARK_GRAFT_VIDEO", "24,90,6").split(","))
    spark = get_spark(app="bench-video", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    try:
        path = os.path.join(BENCH_DIR, f"videos_{n_videos}x{n_frames}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            items = [(f"v{i}",
                      avi_encode(_video_frames(n_frames, seed=i, w=96, h=64),
                                 fps=10, quality=85))
                     for i in range(n_videos)]
            spark.createDataFrame(
                [(k, bytearray(v)) for k, v in items],
                "item_id string, bytes binary"
            ).repartition(cpus).write.mode("overwrite").parquet(path)
        vids = spark.read.parquet(path)
        total_mb = vids.agg(F.sum(F.length("bytes"))).collect()[0][0] / 2**20

        def run(n):
            t0 = time.monotonic()
            rows = mjpeg_frame_hashes(vids, every_n=n).collect()
            return time.monotonic() - t0, rows

        run(every_n)  # warm (JVM + Arrow + scratch pools)
        sec = {1: float("inf"), every_n: float("inf")}
        full_rows = samp_rows = None
        for _ in range(3):
            for n in (1, every_n):
                s, rows = run(n)
                if s < sec[n]:
                    sec[n] = s
                if n == 1:
                    full_rows = rows
                else:
                    samp_rows = rows
        want = {(r["item_id"], r["frame_idx"]): r["dhash"]
                for r in full_rows if r["frame_idx"] % every_n == 0}
        got = {(r["item_id"], r["frame_idx"]): r["dhash"] for r in samp_rows}
        assert got == want, "sampling invariant broken"
        return {
            "n_videos": n_videos, "frames_per_video": n_frames,
            "corpus_mb": round(total_mb, 2), "every_n": every_n,
            "sec_full_decode": round(sec[1], 3),
            "sec_sampled": round(sec[every_n], 3),
            "decode_cut": round(sec[1] / sec[every_n], 2),
            "sampled_hashes_subset_of_full": True,
        }
    finally:
        spark.stop()


def band_store_evidence(cpus: int) -> dict:
    """Touched-bucket scan evidence for the incremental clustering path
    (streaming/lambda_arch.py use_band_store): a fixed 20k-key touched set
    semi-joined against band stores of SPARK_GRAFT_BAND_ROWS (default
    4M/16M) rows, (a) band_hash-bucketed vs (b) plain parquet. Same
    methodology as store_evidence: the headline is measured SHUFFLE VOLUME
    from each execution's own SQL metrics -- the bucketed store's scan
    must shuffle nothing (the only Exchange is the touched side, constant)
    while the plain layout re-shuffles the store per run."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.operators import incremental
    from go_cdc_chunkers_spark.session import get_spark

    sizes = tuple(
        int(s) * 1_000_000 for s in
        os.environ.get("SPARK_GRAFT_BAND_ROWS", "4,16").split(",") if s.strip())
    n_touched = 20_000
    spark = get_spark(app="bench-bandstore", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    ev: dict = {"band_touched_keys": n_touched, "band_store_sizes": list(sizes)}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for n in sizes:
            tag = f"{n // 1_000_000}m"
            bpath = os.path.join(BENCH_DIR, f"bandstore_b_{tag}")
            ppath = os.path.join(BENCH_DIR, f"bandstore_p_{tag}")
            table = f"bench_band_store_{tag}"
            rows = spark.range(n).select(
                (F.col("id") % 32).cast("int").alias("band_id"),
                F.xxhash64(F.col("id") % (n // 8), F.lit(tag)).alias("band_hash"),
                F.concat(F.lit("c"), (F.col("id") / 64).cast("long")
                         .cast("string")).alias("clip_id"),
                F.lit("pcm").alias("src"),
            )
            if not os.path.exists(os.path.join(bpath, "_store_meta.json")):
                incremental.write_band_store(rows, table, bpath, n_buckets=64)
            elif not spark.catalog.tableExists(table):
                incremental.register_chunk_store(spark, table, bpath)
            if not os.path.exists(os.path.join(ppath, "_SUCCESS")):
                rows.write.mode("overwrite").parquet(ppath)
            touched = (spark.range(n_touched).select(
                F.xxhash64(F.col("id") * 97 % (n // 8), F.lit(tag))
                .alias("band_hash")).distinct().cache())
            touched.count()

            modes = {
                "bucketed": lambda: spark.table(table).join(
                    touched, "band_hash", "left_semi"),
                "plain": lambda: spark.read.parquet(ppath).join(
                    touched, "band_hash", "left_semi"),
            }
            for fn in modes.values():
                fn().count()  # warm
            best = {m: float("inf") for m in modes}
            hits, shuf = {}, {}
            for _ in range(2):
                for m, fn in modes.items():
                    cnt, sec, sb = _exec_count_with_shuffle(fn())
                    hits[m], shuf[m] = cnt, sb
                    best[m] = min(best[m], sec)
            assert len(set(hits.values())) == 1, hits
            ev[f"band_scope_rows_{tag}"] = hits["bucketed"]
            for m in modes:
                ev[f"band_scope_sec_{m}_{tag}"] = round(best[m], 3)
                ev[f"band_scope_shuffle_mb_{m}_{tag}"] = round(shuf[m] / 1e6, 2)
            ev[f"band_shuffle_saved_vs_plain_{tag}"] = round(
                (shuf["plain"] - shuf["bucketed"]) / max(shuf["plain"], 1), 4)
            touched.unpersist()
    finally:
        spark.stop()
    return ev


def ensure_big_file(mb: int) -> str:
    """Deterministic pseudo-random >=1 GB payload for the ranged-chunking
    evidence, written once under .bench/ (seeded PCG chunks, 1 MB at a
    time -- no GB-sized allocation)."""
    path = os.path.join(BENCH_DIR, f"bigfile_{mb}mb.bin")
    if not os.path.exists(path):
        import numpy as np

        os.makedirs(BENCH_DIR, exist_ok=True)
        rng = np.random.default_rng(4242)
        with open(path + ".tmp", "wb") as f:
            for _ in range(mb):
                f.write(rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes())
        os.rename(path + ".tmp", path)
    return path


def bigfile_evidence(cpus: int) -> dict:
    """GB-scale ranged-chunking evidence (the '1 TB file = 32k independent
    tasks' claim, operators/bigfile.py): chunk one >=1 GB file as 32 MB
    range tasks + distributed seam stitch vs ONE whole-buffer task.
    Reports byte-identity of the two chunk relations, wall-clock for both,
    the stitch join's own overhead on top of the range scan, the overlap
    read amplification, and the resync-failure (fallback) count -- random
    content must stitch everywhere. SPARK_GRAFT_BIGFILE_MB sizes the file
    (default 1024)."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.cdc.opts import resolve
    from go_cdc_chunkers_spark.operators import bigfile
    from go_cdc_chunkers_spark.session import get_spark

    mb = int(os.environ.get("SPARK_GRAFT_BIGFILE_MB", "1024"))
    path = ensure_big_file(mb)
    size = os.path.getsize(path)
    r = resolve("fastcdc-v1.0.0", None)
    R, O = 32 << 20, 8 * r.max_size
    spark = get_spark(app="bench-bigfile", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    ev: dict = {"bigfile_mb": mb, "bigfile_range_mb": 32}
    try:
        files = spark.createDataFrame([(path, size)], "clip_id string, size long")
        ranges = bigfile.plan_ranges(files, R, O)
        ev["bigfile_n_ranges"] = ranges.count()
        ev["bigfile_read_amplification"] = round(
            (size + (ev["bigfile_n_ranges"] - 1) * O) / size, 4)
        whole = files.select(
            "clip_id", "size", F.lit(1).alias("n_ranges"),
            F.lit(0).alias("range_idx"), F.lit(0).cast("long").alias("start"),
            F.col("size").alias("read_len"))

        def fingerprint(df):
            row = df.agg(
                F.count("*").alias("n"),
                F.sum("length").alias("bytes"),
                # modular row-hash sum: order-free identity check that can't
                # overflow ANSI long arithmetic (n * 1e9+7 << 2^63)
                F.sum(F.pmod(F.xxhash64("offset", "length", "chunk_hash"),
                             F.lit(1_000_000_007))).alias("h"),
            ).collect()[0]
            return int(row["n"]), int(row["bytes"]), int(row["h"])

        # warm page cache + JIT once per shape, then best-of-2
        best_scan = best_ranged = best_whole = float("inf")
        fp_ranged = fp_whole = None
        n_fail = None
        for rep in range(3):  # rep 0 = warmup
            cand = bigfile.chunk_ranges(ranges, r).persist()
            t = time.time()
            cand.count()
            t_scan = time.time() - t
            chunks, failed = bigfile.stitch_candidates(cand, files, r, R)
            t = time.time()
            fp_ranged = fingerprint(chunks)
            t_ranged = t_scan + (time.time() - t)
            n_fail = failed.count()
            cand.unpersist()

            t = time.time()
            fp_whole = fingerprint(
                bigfile.chunk_ranges(whole, r).select(
                    "clip_id", "offset", "length", "chunk_hash"))
            t_whole = time.time() - t
            if rep == 0:
                continue
            best_scan = min(best_scan, t_scan)
            best_ranged = min(best_ranged, t_ranged)
            best_whole = min(best_whole, t_whole)

        assert fp_ranged == fp_whole, (fp_ranged, fp_whole)
        ev["bigfile_chunks"] = fp_ranged[0]
        ev["bigfile_identical_to_whole"] = True
        ev["bigfile_fallback_files"] = int(n_fail)
        ev["bigfile_sec_ranged"] = round(best_ranged, 3)
        ev["bigfile_sec_range_scan"] = round(best_scan, 3)
        ev["bigfile_sec_stitch_overhead"] = round(best_ranged - best_scan, 3)
        ev["bigfile_sec_whole"] = round(best_whole, 3)
        ev["bigfile_speedup_vs_whole"] = round(best_whole / best_ranged, 2)
        ev["bigfile_mb_per_sec_ranged"] = round(size / 1e6 / best_ranged, 1)
        ev["bigfile_mb_per_sec_whole"] = round(size / 1e6 / best_whole, 1)
    finally:
        spark.stop()
    return ev


def normalize_evidence(cpus: int, n_clips: int = 64,
                       clip_mb: float = 1.0) -> dict:
    """Codec-normalized chunking cost (PipelineConfig.normalize_pcm):
    the same speech-ish PCM corpus stored as raw pcm_s16le, WAV, and
    FLAC, chunked through the decode-fused UDF. Reports per-container
    chunk-stage MB-of-PCM/s (warm best-of-3), the decode overhead ratio
    vs raw, chunk-relation identity across containers (the invariance
    the driver query cdc_codec_invariant_chunks pins at sf scale), and
    the single-core FLAC decode rate. The honest headline: FLAC decode
    (~25 MB/s/core C-kernel entropy loops) dominates a FLAC corpus's
    chunking cost; it is embarrassingly parallel across clips, so the
    100 TB answer is cores, not shuffle."""
    import numpy as np

    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.operators import chunking
    from go_cdc_chunkers_spark.operators.flac import flac_decode, flac_encode
    from go_cdc_chunkers_spark.session import get_spark

    rng = np.random.default_rng(17)
    n_samp = int(clip_mb * 1e6 / 2)
    t = np.arange(n_samp)
    clips = []
    for i in range(n_clips):
        sig = (3000 * np.sin(2 * np.pi * (180 + 7 * i) * t / 16000)
               + rng.normal(0, 250, n_samp)).astype(np.int16)
        clips.append(sig)
    pcm_mb = n_clips * n_samp * 2 / 1e6

    from go_cdc_chunkers_spark.operators.codecs import wav_wrap

    def wav_of(p):
        return wav_wrap(p.tobytes(), tag=1, channels=1, block_align=2,
                        sample_rate=16000, bits=16)

    enc = {
        "pcm_s16le": [bytearray(p.tobytes()) for p in clips],
        "wav": [bytearray(wav_of(p)) for p in clips],
        "flac": [bytearray(bytes(flac_encode(p.astype(np.int64), 16000)))
                 for p in clips],
    }
    # single-core decode rate (the per-task cost a planner would budget)
    one = bytes(enc["flac"][0])
    flac_decode(one)
    t0 = time.time()
    for _ in range(3):
        flac_decode(one)
    core_mb_s = round(n_samp * 2 / 1e6 / ((time.time() - t0) / 3), 1)

    spark = get_spark(app="bench-normalize", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    opts = ChunkerOpts(min_size=2048, normal_size=8192, max_size=65536)
    ev: dict = {"n_clips": n_clips, "pcm_mb": round(pcm_mb, 1),
                "flac_ratio": round(
                    sum(len(b) for b in enc["flac"]) / (pcm_mb * 1e6), 3),
                "flac_decode_mb_per_sec_1core": core_mb_s}
    try:
        profiles = {}
        for codec, payloads in enc.items():
            df = spark.createDataFrame(
                [(f"c{i}", b, codec) for i, b in enumerate(payloads)],
                "clip_id string, bytes binary, codec string",
            ).repartition(cpus).cache()
            df.count()
            ch = chunking.chunk_clips(df, "fastcdc-v1.0.0", opts,
                                      codec_col="codec")
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                n = ch.count()
                best = min(best, time.time() - t0)
            from pyspark.sql import functions as F
            profiles[codec] = ch.agg(
                F.count("*"), F.sum("length"),
                F.sum(F.crc32(F.col("chunk_hash")))).first()
            ev[f"mb_pcm_per_sec_{codec}"] = round(pcm_mb / best, 1)
            ev[f"n_chunks_{codec}"] = int(n)
            df.unpersist()
        base = profiles["pcm_s16le"]
        ev["chunks_identical_across_containers"] = all(
            tuple(profiles[c]) == tuple(base) for c in ("wav", "flac"))
        ev["flac_overhead_x"] = round(
            ev["mb_pcm_per_sec_pcm_s16le"] / ev["mb_pcm_per_sec_flac"], 2)
    finally:
        spark.stop()
    return ev


def ab_pipeline_run(cpus: int, n_base: int, rounds: int = 3) -> dict:
    """Interleaved fresh-JVM A/B of neardup_pipeline: this tree ("head")
    vs a snapshot commit ("base", git worktree under /tmp), alternating
    runs so both sample the same noise windows (VERDICT r3 item 5 -- the
    r3-vs-r2 comparison read +9% from non-interleaved single shots).
    Per-tree best-of-rounds total + per-stage minima. The base ref
    defaults to the previous round's end-of-round commit and is
    overridable via SPARK_GRAFT_AB_REF (e.g. fab0741 = round-3 snapshot,
    4705aef = round-4 snapshot)."""
    import subprocess

    ref = os.environ.get("SPARK_GRAFT_AB_REF", "4705aef")
    wt = os.path.join(tempfile.gettempdir(), f"spark_graft_ab_{ref}")
    if not os.path.exists(os.path.join(wt, "bench.py")):
        subprocess.run(["git", "-C", ROOT, "worktree", "add", "--detach",
                        "-f", wt, ref], check=True, capture_output=True)
    trees = {"base": os.path.join(wt, "bench.py"),
             "head": os.path.abspath(__file__)}
    best = {k: float("inf") for k in trees}
    stage_min: dict = {k: {} for k in trees}
    history = []
    for _ in range(rounds):
        for tag, script in trees.items():
            r = subprocess.run(
                [sys.executable, script, "--pipeline-one", str(cpus),
                 str(n_base)],
                capture_output=True, text=True, timeout=1800)
            assert r.returncode == 0, (tag, r.stderr[-2000:])
            run = json.loads(r.stdout.strip().splitlines()[-1])
            history.append({"tree": tag, "sec": run["sec"]})
            best[tag] = min(best[tag], run["sec"])
            for st, sec in run["stage_sec"].items():
                cur = stage_min[tag].get(st)
                stage_min[tag][st] = sec if cur is None else min(cur, sec)
    sums = {k: round(sum(v.values()), 3) for k, v in stage_min.items()}
    return {
        "metric": "pipeline_ab_head_vs_base",
        "base_commit": ref, "rounds": rounds, "n_clips_base": n_base,
        "sec_base": best["base"], "sec_head": best["head"],
        "sum_stage_min_base": sums["base"],
        "sum_stage_min_head": sums["head"],
        "head_over_base_best": round(best["head"] / best["base"], 3),
        "head_over_base_stage_min": round(sums["head"] / sums["base"], 3),
        "stage_sec_base": stage_min["base"],
        "stage_sec_head": stage_min["head"],
        "history": history,
    }


def pipeline_scale_run(cpus: int, sizes=(600, 6000)):
    """Fixed-overhead amortization evidence (VERDICT r1 item 9): the same
    pipeline at ~10x corpus in fresh JVMs. Ideal scaling holds clips/sec
    constant; efficiency = cps_large / cps_small. Stage latencies expose
    where the fixed floor lives."""
    import subprocess

    points = []
    for n_base in sizes:
        r = subprocess.run(
            [sys.executable, __file__, "--pipeline-one", str(cpus), str(n_base)],
            capture_output=True, text=True, timeout=3600,
        )
        lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"pipeline-one {n_base} failed: {r.stderr[-800:]}")
        points.append(json.loads(lines[-1]))
    eff = round(points[-1]["clips_per_sec"] / points[0]["clips_per_sec"], 3)
    return {
        "metric": "pipeline_volume_scaling",
        "value": eff,
        "unit": "ratio",
        "points": points,
        "pipeline_volume_efficiency": eff,
    }


def scaling_run(sf_dir: str, n_base: int, replicate: int, rounds: int = 3):
    """The chunking job at N=2 vs 4N=8 cores, INTERLEAVED across `rounds`
    alternating fresh-JVM runs. This VM has minute-scale noisy-neighbor
    episodes (a single level measured during one can read 2-10x slow);
    interleaving makes both levels sample the same environment and the
    per-level best-of-rounds is the steady-state throughput."""
    import subprocess

    best = {2: None, 8: None}
    history = []
    for _ in range(rounds):
        for cpus in (2, 8):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            r = subprocess.run(
                [sys.executable, __file__, "--chunk-only", str(cpus),
                 str(n_base), str(replicate)],
                capture_output=True, text=True, env=env, timeout=3600,
            )
            lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"bench --chunk-only {cpus} failed: {r.stderr[-800:]}")
            res = json.loads(lines[-1])
            history.append(res)
            if best[cpus] is None or res["mb_per_sec"] > best[cpus]["mb_per_sec"]:
                best[cpus] = res

    mb_lo, mb_hi = best[2]["mb_per_sec"], best[8]["mb_per_sec"]
    chunk_eff = round((mb_hi / mb_lo) / 4.0, 3)
    # Per-round paired efficiency: adjacent (2, 8) runs sample the same
    # noise window, so their ratio is the cleanest estimator.
    paired = [
        round((history[i + 1]["mb_per_sec"] / history[i]["mb_per_sec"]) / 4.0, 3)
        for i in range(0, len(history) - 1, 2)
    ]
    return {
        "metric": "scaling_efficiency_Nx4N_local2_vs_local8",
        "value": chunk_eff,
        "unit": "ratio",
        "chunk_mb_per_sec_N": mb_lo, "chunk_mb_per_sec_4N": mb_hi,
        "chunk_scaling_efficiency": chunk_eff,
        "paired_efficiencies": paired,
        "history": history,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_base = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "600"))
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "24"))

    if len(sys.argv) >= 2 and sys.argv[1] == "--single":
        cpus, n_base, replicate = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        timings, extras = one_session(cpus, sf_dir, n_base, replicate, f"bench-{cpus}")
        print(json.dumps({"cpus": cpus, **timings, **extras}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--chunk-only":
        cpus, n_base, replicate = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        print(json.dumps(chunk_only_session(cpus, n_base, replicate)))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--pipeline-one":
        mode = sys.argv[4] if len(sys.argv) > 4 else "off"
        print(json.dumps(pipeline_session(
            int(sys.argv[2]), int(sys.argv[3]),
            exact_first=mode == "exact", ranged=mode == "ranged")))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--band-store":
        print(json.dumps({"metric": "incremental_band_store_scan",
                          **band_store_evidence(cpus)}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--video":
        print(json.dumps({"metric": "video_frame_sampling",
                          **video_evidence(cpus)}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--bigfile":
        print(json.dumps({"metric": "bigfile_ranged_chunking",
                          **bigfile_evidence(cpus)}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--ab-pipeline":
        print(json.dumps(ab_pipeline_run(cpus, n_base)))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--normalize":
        print(json.dumps({"metric": "codec_normalized_chunking",
                          **normalize_evidence(cpus)}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--rss":
        # peak process-tree RSS per pipeline mode (default / canonical-first
        # / ranged chunking), interleaved fresh JVMs; the cmd/cdcbench
        # memory story. Ranged must not RAISE peak RSS (its point is
        # bounded per-task memory; at this corpus the win is headroom, not
        # footprint -- the whole corpus fits either way).
        import subprocess

        rounds = 2
        out: dict = {"metric": "pipeline_peak_rss", "rounds": rounds}
        peak = {m: 0.0 for m in ("off", "exact", "ranged")}
        sec = {m: float("inf") for m in peak}
        gc = {m: (0, 0) for m in peak}
        for _ in range(rounds):
            for m in peak:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--pipeline-one", str(cpus), str(n_base), m],
                    capture_output=True, text=True, timeout=1800)
                assert r.returncode == 0, (m, r.stderr[-2000:])
                run = json.loads(r.stdout.strip().splitlines()[-1])
                peak[m] = max(peak[m], run["peak_rss_mb"])
                sec[m] = min(sec[m], run["sec"])
                gc[m] = (max(gc[m][0], run.get("gc_collections", 0)),
                         max(gc[m][1], run.get("gc_ms", 0)))
        for m in peak:
            out[f"peak_rss_mb_{m}"] = peak[m]
            out[f"sec_{m}"] = sec[m]
            out[f"gc_collections_{m}"] = gc[m][0]
            out[f"gc_ms_{m}"] = gc[m][1]
        print(json.dumps(out))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--exact-first":
        # canonical-first savings: same corpus, fresh JVM each, off vs on.
        # The corpus carries dup_frac=0.2 exact copies (CORPUS_KW); at
        # 10^12-clip scale re-upload fractions are far higher, so the
        # measured per-stage savings scale with the dup fraction.
        import subprocess

        # Interleaved fresh JVMs, PER-STAGE minima across rounds: single-
        # shot stage times on this box swing up to several x (noisy-
        # neighbor windows -- one observed run had chunks_pcm at 49 s vs a
        # 1.3 s isolated steady-state), so whole-run best-of-N still
        # compares one run's noise against another's. The per-stage min is
        # each stage's demonstrated steady-state cost; sum_stage_min_* is
        # the noise-robust comparison.
        rounds = 3
        stage_min: dict = {"off": {}, "exact": {}}
        total_min = {"off": float("inf"), "exact": float("inf")}
        n_clips = None
        for _ in range(rounds):
            for mode in ("off", "exact"):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--pipeline-one", str(cpus), str(n_base), mode],
                    capture_output=True, text=True, timeout=1800)
                assert r.returncode == 0, r.stderr[-2000:]
                run = json.loads(r.stdout.strip().splitlines()[-1])
                n_clips = run["n_clips"]
                total_min[mode] = min(total_min[mode], run["sec"])
                for st, sec in run["stage_sec"].items():
                    cur = stage_min[mode].get(st)
                    stage_min[mode][st] = sec if cur is None else min(cur, sec)
        sums = {m: round(sum(stage_min[m].values()), 3) for m in stage_min}
        print(json.dumps({
            "metric": "pipeline_exact_first",
            "n_clips": n_clips,
            "sec_off": total_min["off"], "sec_exact": total_min["exact"],
            "sum_stage_min_off": sums["off"],
            "sum_stage_min_exact": sums["exact"],
            "speedup_stage_min": round(sums["off"] / sums["exact"], 3),
            "stage_sec_off": stage_min["off"],
            "stage_sec_exact": stage_min["exact"],
        }))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--pipeline-scale":
        res = pipeline_scale_run(cpus)
        print(json.dumps(res))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--skew":
        from go_cdc_chunkers_spark.session import get_spark

        spark = get_spark(app="bench-skew", cpus=cpus, shuffle_partitions=max(cpus, 8))
        try:
            points = [skew_evidence(spark, cpus, nb, nb // 4)
                      for nb in (6400, 12800)]
            print(json.dumps({
                "metric": "candidate_stage_skew",
                "points": points,
                "uncapped_pair_growth": round(
                    points[1]["skew_pairs_total_uncapped"]
                    / points[0]["skew_pairs_total_uncapped"], 2),
                "star_edge_growth": round(
                    points[1]["skew_candidates_capped"]
                    / points[0]["skew_candidates_capped"], 2),
            }))
        finally:
            spark.stop()
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--store":
        print(json.dumps({"metric": "incremental_store_probe",
                          **store_evidence(cpus)}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--sketch":
        print(json.dumps({"metric": "sketch_estimate_vs_scan",
                          **sketch_evidence(cpus)}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--submit-scaling":
        print(json.dumps({"metric": "submit_scaling_Nx4N",
                          **submit_scaling_evidence()}))
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--scaling":
        res = scaling_run(sf_dir, n_base, replicate)
        res["sf"] = float(sf) if sf.replace(".", "").isdigit() else sf
        print(json.dumps(res))
        return

    timings, extras = one_session(cpus, sf_dir, n_base, 1, "bench")
    for line in emit_lines(timings, extras, sf):
        print(line)


def emit_lines(timings: dict, extras: dict, sf: str) -> list[str]:
    """Default-bench stdout contract (VERDICT r4 item 1). The committed
    heavy-evidence artifact (BENCH_EVIDENCE.json: --ab-pipeline / --bigfile
    / --rss / --store results, each stamped with the git commit that
    produced it) goes out as its OWN line BEFORE the headline. The driver
    captures only the tail of stdout, so the headline -- compact:
    metric/value/queries/in-run extras, no embedded blob -- must be the
    LAST line and stay well under 2,000 chars (r4 shipped parsed:null
    because the merged line hit 6,314 chars)."""
    lines = []
    ev_path = os.path.join(ROOT, "BENCH_EVIDENCE.json")
    if os.path.exists(ev_path):
        with open(ev_path) as f:
            lines.append(json.dumps({"metric": "evidence_artifacts",
                                     "artifacts": json.load(f)}))
    headline = json.dumps({
        "metric": "engine_bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    })
    assert len(headline) < 2000, f"headline {len(headline)} chars >= 2000"
    lines.append(headline)
    return lines


if __name__ == "__main__":
    main()
