"""Streaming ingest: chunk boundaries from the streaming path must equal the
batch path (the kernel is stateless, so streaming == batch by construction;
this pins it)."""

from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
from go_cdc_chunkers_spark.operators.chunking import chunk_clips
from go_cdc_chunkers_spark.sources import clips as clips_src
from go_cdc_chunkers_spark.streaming.ingest import run_ingest_to_memory

OPTS = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)


def test_streaming_chunks_equal_batch(spark, tmp_path):
    src = str(tmp_path / "clips.parquet")
    clips_src.write_clips_parquet(src, n_base=12, dup_frac=0.2, near_frac=0.2,
                                  n_const=1, seed=5)
    run_ingest_to_memory(spark, str(tmp_path), "stream_out", opts=OPTS)
    got = sorted(
        (r.clip_id, r.chunk_idx, r.offset, r.length)
        for r in spark.sql("SELECT * FROM stream_out").collect()
    )
    batch = chunk_clips(spark.read.parquet(src), "fastcdc-v1.0.0", OPTS)
    want = sorted(
        (r.clip_id, r.chunk_idx, r.offset, r.length) for r in batch.collect()
    )
    assert got == want and len(got) > 0


def _write_ts_clips(path, n_base, seed, ts_epochs):
    """Clips parquet with an event_ts column (cycled over ts_epochs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    rows, _ = clips_src.generate_clips(n_base=n_base, dup_frac=0.0, near_frac=0.0,
                                       n_const=0, seed=seed)
    ts = [datetime.fromtimestamp(ts_epochs[i % len(ts_epochs)], tz=timezone.utc)
          for i in range(len(rows))]
    table = pa.table({
        "clip_id": pa.array([r["clip_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "sr_hz": pa.array([r["sr_hz"] for r in rows], pa.int32()),
        "dur_ms": pa.array([r["dur_ms"] for r in rows], pa.int32()),
        "codec": pa.array([r["codec"] for r in rows], pa.string()),
        "transcript": pa.array([r["transcript"] for r in rows], pa.string()),
        "event_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
    })
    pq.write_table(table, path)
    return rows


def test_windowed_chunk_stats_with_watermark(spark, tmp_path):
    """Event-time windowed streaming agg: the watermark finalizes window
    [0, 60s) once later files push event time past end+watermark, and its
    stats equal the batch chunking of the same clips."""
    import time as _time

    from pyspark.sql import functions as F
    from go_cdc_chunkers_spark.streaming.ingest import (
        stream_clips_with_ts, windowed_chunk_stats)

    d = tmp_path / "tsclips"
    d.mkdir()
    rows1 = _write_ts_clips(str(d / "f1.parquet"), 6, 11, [5, 20, 50])
    _time.sleep(1.1)  # file-source ordering is by modification time
    _write_ts_clips(str(d / "f2.parquet"), 3, 12, [300])
    _time.sleep(1.1)
    _write_ts_clips(str(d / "f3.parquet"), 2, 13, [600])

    stream = stream_clips_with_ts(spark, str(d), max_files_per_trigger=1)
    q = (
        windowed_chunk_stats(stream, opts=OPTS)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("win_stats")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.window_start.isoformat(): (r.n_chunks, r.total_bytes)
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    # the first window must have been finalized and emitted
    first = [v for k, v in sorted(got.items())][0]
    # batch ground truth over file1's clips
    batch = chunk_clips(
        spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"])) for r in rows1],
            "clip_id string, bytes binary",
        ),
        "fastcdc-v1.0.0", OPTS,
    ).agg(F.count("*").alias("n"), F.sum("length").alias("b")).collect()[0]
    assert first == (batch.n, batch.b), (first, (batch.n, batch.b))


def test_streaming_exact_dedup_across_microbatches(spark, tmp_path):
    """dropDuplicatesWithinWatermark state: a chunk hash seen in batch 1
    must not be re-emitted by batch 2 (same clips re-ingested)."""
    import shutil
    import time as _time

    from go_cdc_chunkers_spark.streaming.ingest import (
        stream_clips_with_ts, streaming_exact_dedup)

    d = tmp_path / "dedupclips"
    d.mkdir()
    _write_ts_clips(str(d / "f1.parquet"), 5, 21, [10])
    _time.sleep(1.1)
    # identical clip content re-ingested a minute later (same seed)
    _write_ts_clips(str(d / "f2.parquet"), 5, 21, [70])

    stream = stream_clips_with_ts(spark, str(d), max_files_per_trigger=1)
    q = (
        streaming_exact_dedup(stream, opts=OPTS)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT chunk_hash FROM dedup_out").collect()
    hashes = [bytes(r.chunk_hash) for r in out]
    assert len(hashes) == len(set(hashes)) > 0


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: completed sessions from the
    stream == batch lag+cumsum sessions minus each user's final (still
    open) session."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from go_cdc_chunkers_spark.streaming.sessionize import streaming_sessionize

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", F.unix_timestamp("ts").cast("long").alias("t"))
        .orderBy("t")
        .toPandas()
    )
    d = tmp_path / "ev"
    d.mkdir()
    half = len(ev) // 2
    # split at the global time median: per-user event order is preserved
    pq.write_table(pa.Table.from_pandas(ev.iloc[:half]), str(d / "f1.parquet"))
    _time.sleep(1.1)
    pq.write_table(pa.Table.from_pandas(ev.iloc[half:]), str(d / "f2.parquet"))

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("t", T.LongType()),
    ])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.sess_start, r.sess_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }

    # batch ground truth: all sessions, then drop each user's last one
    want = set()
    for uid, g in ev.groupby("user_id"):
        ts = sorted(int(t) for t in g["t"])
        sessions = []
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > 1800:
                sessions.append((int(uid), start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        want.update(sessions)  # final open session intentionally excluded
    assert got == want and len(got) > 0


def test_streaming_sessionize_late_event_across_microbatches(spark, tmp_path):
    """A late event delivered in a LATER micro-batch with t < last must not
    move the open session's end backwards (which would let a following
    in-order event falsely exceed gap_s and split the session)."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T
    from go_cdc_chunkers_spark.streaming.sessionize import streaming_sessionize

    d = tmp_path / "late"
    d.mkdir()
    # batch 1: events at t=0 and t=1000; batch 2: LATE t=500, then t=2500.
    # gap_s=1800: with the bug, the late 500 drags last back to 500 and the
    # 2500 event splits (2500-500=2000>1800), emitting a bogus completed
    # session. Correct behavior: all four events are ONE still-open session
    # (2500-1000=1500<=1800) -> zero completed sessions emitted.
    b1 = pd.DataFrame({"user_id": [7, 7], "t": [0, 1000]})
    b2 = pd.DataFrame({"user_id": [7, 7], "t": [500, 2500]})
    pq.write_table(pa.Table.from_pandas(b1), str(d / "f1.parquet"))
    _time.sleep(1.1)
    pq.write_table(pa.Table.from_pandas(b2), str(d / "f2.parquet"))

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("t", T.LongType()),
    ])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_late")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM sess_late").collect()
    assert got == [], f"late event split the open session: {got}"


def _write_clip_rows(path, rows):
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
    pq.write_table(table, path)


def test_lambda_stream_neardup_clustered(spark, tmp_path):
    """Lambda split end-to-end (streaming/lambda_arch.py): signatures
    computed on the stream land in the store; the scheduled batch job
    clusters the accumulated store; a near-dup arriving on the stream
    AFTER the first batch run is clustered with its base by the next one.
    Also exercises checkpoint resume: the second stream instance must only
    ingest the new file."""
    import time as _time

    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        cluster_store, ingest_signatures_stream, read_store)

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")

    rows, truth = clips_src.generate_clips(
        n_base=16, dup_frac=0.25, near_frac=0.0, n_const=0, seed=9)
    _write_clip_rows(str(src / "f1.parquet"), rows[:10])
    _time.sleep(1.1)
    _write_clip_rows(str(src / "f2.parquet"), rows[10:])

    q = ingest_signatures_stream(spark, str(src), store, max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    assert read_store(spark, store, "clips").count() == len(rows)

    comps1 = cluster_store(spark, store, str(tmp_path / "run1")).collect()
    label1 = {r.clip_id: r.component_id for r in comps1}
    # exact dups from ground truth must already cluster in run 1
    by_group = {}
    for cid, g in truth.items():
        by_group.setdefault(g, []).append(cid)
    n_multi = 0
    for g, cids in by_group.items():
        if len(cids) > 1:
            n_multi += 1
            assert len({label1[c] for c in cids}) == 1, (g, cids)
    assert n_multi >= 2

    # a NEW near-dup of rows[0] arrives on the stream
    base = rows[0]
    nd = dict(
        clip_id="stream-near-dup",
        bytes=clips_src.edit_pcm_bytes(base["bytes"], 4, seed=123),
        sr_hz=base["sr_hz"], dur_ms=base["dur_ms"], codec=base["codec"],
        transcript=base["transcript"],
    )
    _time.sleep(1.1)
    _write_clip_rows(str(src / "f3.parquet"), [nd])

    q2 = ingest_signatures_stream(spark, str(src), store, max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()
    # checkpoint resume: exactly one new clip landed, nothing re-ingested
    assert read_store(spark, store, "clips").count() == len(rows) + 1

    comps2 = cluster_store(spark, store, str(tmp_path / "run2")).collect()
    label2 = {r.clip_id: r.component_id for r in comps2}
    assert label2["stream-near-dup"] == label2[base["clip_id"]]


def test_lambda_stream_spectral_channel(spark, tmp_path):
    """Lambda + spectral channel: a jittered chord variant with a REWRITTEN
    transcript (invisible to chunk-digest and text channels) arrives on the
    stream after the first batch run; the next batch run, with
    use_audio_fp=True, clusters it with its base via the streamed
    fingerprint store."""
    import time as _time

    from go_cdc_chunkers_spark.plans.pipeline import PipelineConfig
    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        cluster_store, ingest_signatures_stream)

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    cfg = PipelineConfig(use_audio_fp=True)

    rows, truth, _k = clips_src.generate_chord_clips(
        n_base=8, dup_frac=0.25, jitter_frac=0.0, insert_frac=0.0, seed=23)
    _write_clip_rows(str(src / "f1.parquet"), rows)

    q = ingest_signatures_stream(spark, str(src), store, cfg)
    q.processAllAvailable()
    q.stop()
    cluster_store(spark, store, str(tmp_path / "run1"), cfg).collect()

    base = rows[0]
    import numpy as np
    pcm = np.frombuffer(base["bytes"], dtype="<i2")
    jit = np.clip(pcm.astype(np.float64) * 1.02, -32768, 32767).astype("<i2")
    nd = dict(base, clip_id="stream-jitter",
              bytes=jit.tobytes(), transcript="totally different words here")
    _time.sleep(1.1)
    _write_clip_rows(str(src / "f2.parquet"), [nd])

    q2 = ingest_signatures_stream(spark, str(src), store, cfg)
    q2.processAllAvailable()
    q2.stop()

    label = {r.clip_id: r.component_id
             for r in cluster_store(spark, store, str(tmp_path / "run2"), cfg).collect()}
    assert label["stream-jitter"] == label[base["clip_id"]]


def test_lambda_history_dedup_report_and_replay(spark, tmp_path):
    """Cross-history exact dedup on the stream (history_dedup): micro-batch
    1 carries an exact copy of a batch-0 clip plus a novel clip -- the
    per-batch dedup report marks the copy fully_dup against the
    accumulated chunk history and the history grows by only the novel
    hashes; REPLAYING batch 1 (foreachBatch at-least-once contract)
    reproduces the identical report and appends nothing."""
    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        history_table_name, make_signature_sink, read_store)

    rows, _truth = clips_src.generate_clips(
        n_base=8, dup_frac=0.0, near_frac=0.0, n_const=0, seed=11)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    def df_of(rs):
        return spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
              r["codec"], r["transcript"]) for r in rs], schema)

    copy = dict(rows[0], clip_id="copy-of-0")
    novel = dict(rows[-1], clip_id="novel")
    novel["bytes"] = bytes(255 - b for b in rows[-1]["bytes"])

    store = str(tmp_path / "store")
    sink = make_signature_sink(store, history_dedup=True, history_buckets=8)
    sink(df_of(rows[:6]), 0)
    sink(df_of([copy, novel]), 1)

    rep = {r["clip_id"]: r.asDict()
           for r in read_store(spark, store, "dedup_report")
           .filter("batch = 1").drop("batch").collect()}
    assert rep["copy-of-0"]["fully_dup"] is True
    assert rep["novel"]["dup_chunks"] == 0

    hist = spark.table(history_table_name(store))
    n_before = hist.count()
    # history holds one row per distinct hash, none from the dup copy
    assert hist.filter("clip_id = 'copy-of-0'").count() == 0
    assert hist.filter("clip_id = 'novel'").count() > 0

    sink(df_of([copy, novel]), 1)  # replay
    rep2 = {r["clip_id"]: r.asDict()
            for r in read_store(spark, store, "dedup_report")
            .filter("batch = 1").drop("batch").collect()}
    assert rep2 == rep
    assert spark.table(history_table_name(store)).count() == n_before


def test_lambda_incremental_cluster_matches_full(spark, tmp_path):
    """Incremental batch layer: after new clips (including exact + near
    dups of already-clustered content) land in the store, folding just the
    delta into the previous labeling (cluster_store_incremental) yields
    BIT-identical components to a full re-cluster of everything."""
    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        cluster_store, cluster_store_incremental, make_signature_sink)

    rows, truth = clips_src.generate_clips(
        n_base=24, dup_frac=0.3, near_frac=0.2, n_const=0, seed=21)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    def df_of(rs):
        return spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
              r["codec"], r["transcript"]) for r in rs], schema)

    # deterministic shuffle so variants straddle the phase boundary
    import hashlib
    rows = sorted(rows, key=lambda r: hashlib.sha256(
        r["clip_id"].encode()).hexdigest())
    cut = 2 * len(rows) // 3
    store = str(tmp_path / "store")
    sink = make_signature_sink(store)
    sink(df_of(rows[: cut // 2]), 0)
    sink(df_of(rows[cut // 2: cut]), 1)

    prev = cluster_store(spark, store, str(tmp_path / "run1")).localCheckpoint()

    sink(df_of(rows[cut:]), 2)
    full = cluster_store(spark, store, str(tmp_path / "run2"))
    incr = cluster_store_incremental(spark, store, prev, since_batch=1)

    want = sorted((r.clip_id, r.component_id) for r in full.collect())
    got = sorted((r.clip_id, r.component_id) for r in incr.collect())
    assert got == want
    # sanity: the delta really merged something across the phase boundary
    by_comp = {}
    for cid, comp in got:
        by_comp.setdefault(comp, []).append(cid)
    new_ids = {r["clip_id"] for r in rows[cut:]}
    mixed = [m for m in by_comp.values()
             if any(c in new_ids for c in m) and any(c not in new_ids for c in m)]
    assert mixed, "fixture produced no cross-phase duplicate group"


def test_lambda_incremental_band_store(spark, tmp_path):
    """Stream-maintained bucketed band store: the sink appends each
    micro-batch's LSH bands to a band_hash-bucketed table; incremental
    clustering with use_band_store=True yields labels identical to a full
    re-cluster, the touched-bucket semi-join scans the store bucketed
    with NO store-side Exchange, and a replayed batch appends nothing
    (the _appended_batches.json registry)."""
    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        band_store_table_name, cluster_store, cluster_store_incremental,
        make_signature_sink)

    rows, truth = clips_src.generate_clips(
        n_base=16, dup_frac=0.3, near_frac=0.2, n_const=0, seed=33)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    def df_of(rs):
        return spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
              r["codec"], r["transcript"]) for r in rs], schema)

    import hashlib
    rows = sorted(rows, key=lambda r: hashlib.sha256(
        r["clip_id"].encode()).hexdigest())
    cut = 2 * len(rows) // 3
    store = str(tmp_path / "store")
    sink = make_signature_sink(store, band_store=True, band_buckets=8)
    sink(df_of(rows[:cut]), 0)
    prev = cluster_store(spark, store, str(tmp_path / "run1")).localCheckpoint()
    sink(df_of(rows[cut:]), 1)

    tbl = band_store_table_name(store)
    n_bands = spark.table(tbl).count()
    sink(df_of(rows[cut:]), 1)  # replay: registry makes the append a no-op
    assert spark.table(tbl).count() == n_bands

    full = cluster_store(spark, store, str(tmp_path / "run2"))
    incr = cluster_store_incremental(spark, store, prev, since_batch=0,
                                     use_band_store=True)
    assert (sorted((r.clip_id, r.component_id) for r in incr.collect())
            == sorted((r.clip_id, r.component_id) for r in full.collect()))

    # plan shape: the touched semi-join is keyed on band_hash (the bucket
    # column), so the store side reads the persisted bucketing with NO
    # Exchange -- exactly ONE Exchange total (the touched side)
    touched = (spark.table(tbl).select("band_hash").distinct()
               .limit(10).localCheckpoint())
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        scoped = spark.table(tbl).join(touched, "band_hash", "left_semi")
        plan = spark._jvm.PythonSQLUtils.explainString(
            scoped._jdf.queryExecution(), "formatted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    assert "Bucketed: true" in plan, plan
    assert plan.count("Exchange (") == 1, plan  # tree lists each node once


def test_lambda_incremental_cluster_spectral_matches_full(spark, tmp_path):
    """Incremental batch layer with the spectral channel ON: the delta run
    must still match a full re-cluster bit-for-bit, including an edge only
    the (now delta-bounded) landmark matcher can find -- a jittered chord
    variant whose transcript was rewritten, invisible to both the
    chunk-digest and text channels."""
    import numpy as np

    from go_cdc_chunkers_spark.plans.pipeline import PipelineConfig
    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        cluster_store, cluster_store_incremental, make_signature_sink)

    cfg = PipelineConfig(use_audio_fp=True)
    rows, truth, _k = clips_src.generate_chord_clips(
        n_base=8, dup_frac=0.25, jitter_frac=0.0, insert_frac=0.0, seed=23)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    def df_of(rs):
        return spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
              r["codec"], r["transcript"]) for r in rs], schema)

    store = str(tmp_path / "store")
    sink = make_signature_sink(store, cfg)
    sink(df_of(rows[: len(rows) // 2]), 0)
    sink(df_of(rows[len(rows) // 2:]), 1)
    prev = cluster_store(
        spark, store, str(tmp_path / "run1"), cfg).localCheckpoint()

    base = rows[0]
    pcm = np.frombuffer(base["bytes"], dtype="<i2")
    jit = np.clip(pcm.astype(np.float64) * 1.02, -32768, 32767).astype("<i2")
    nd = dict(base, clip_id="stream-jitter", bytes=jit.tobytes(),
              transcript="totally different words here")
    sink(df_of([nd]), 2)

    full = cluster_store(spark, store, str(tmp_path / "run2"), cfg)
    incr = cluster_store_incremental(spark, store, prev, since_batch=1, cfg=cfg)
    want = sorted((r.clip_id, r.component_id) for r in full.collect())
    got = sorted((r.clip_id, r.component_id) for r in incr.collect())
    assert got == want
    label = dict(got)
    assert label["stream-jitter"] == label[base["clip_id"]]


def test_band_store_crash_replay_and_registry_repair(spark, tmp_path):
    """ADVICE r4 durability: (a) a replay after a crash BETWEEN the band
    append commit and the registry write must not double the batch's
    bands (src_batch stamps + the O(batch) bucket-scoped probe); (b) a
    torn/unparseable registry is repaired from the stamps instead of
    wedging every future batch; (c) the registry itself is written
    atomically (temp + rename) so (b) can only arise from external
    faults; (d) a band store that misses landed signature batches makes
    use_band_store=True raise instead of silently under-clustering."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        band_store_path, band_store_table_name, cluster_store_incremental,
        make_signature_sink)

    rows, _ = clips_src.generate_clips(
        n_base=10, dup_frac=0.3, near_frac=0.0, n_const=0, seed=44)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    def df_of(rs):
        return spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
              r["codec"], r["transcript"]) for r in rs], schema)

    store = str(tmp_path / "store")
    sink = make_signature_sink(store, band_store=True, band_buckets=4)
    cut = len(rows) // 2
    sink(df_of(rows[:cut]), 0)
    sink(df_of(rows[cut:]), 1)
    tbl = band_store_table_name(store)
    n = spark.table(tbl).count()
    reg = os.path.join(band_store_path(store), "_appended_batches.json")
    with open(reg) as f:
        assert json.load(f) == [0, 1]

    # (a) crash window: batch 1's append committed but its registry write
    # did not -- the replay must detect the stamps and append nothing
    with open(reg, "w") as f:
        json.dump([0], f)
    sink(df_of(rows[cut:]), 1)
    assert spark.table(tbl).count() == n
    with open(reg) as f:
        assert json.load(f) == [0, 1]

    # (b) torn registry: repaired from the src_batch stamps, no raise,
    # still no duplicate append
    with open(reg, "w") as f:
        f.write('{"torn": [0')
    sink(df_of(rows[cut:]), 1)
    assert spark.table(tbl).count() == n
    with open(reg) as f:
        assert json.load(f) == [0, 1]

    # (d) coverage gap: registry missing entirely while signature batches
    # are landed -> fail fast, never trust the store silently
    os.rename(reg, reg + ".bak")
    prev = (spark.table(tbl).select("clip_id").distinct()
            .withColumn("component_id", F.col("clip_id")))
    with pytest.raises(ValueError, match="does not cover"):
        cluster_store_incremental(spark, store, prev, since_batch=0,
                                  use_band_store=True)
    os.rename(reg + ".bak", reg)
    # restored: the incremental path runs again, and the star-cap audit
    # metric reports per run (VERDICT r4 item 5) -- default cap sees no
    # hot bucket here; pair_cap=1 makes every multi-row touched bucket
    # count as capped
    metrics = {}
    out = cluster_store_incremental(spark, store, prev, since_batch=0,
                                    use_band_store=True,
                                    metrics_out=metrics)
    assert out.count() > 0
    assert metrics["capped_touched_buckets"] == 0
    assert metrics["pair_cap"] == 64
    from go_cdc_chunkers_spark.plans.pipeline import PipelineConfig
    metrics = {}
    cluster_store_incremental(
        spark, store, prev, since_batch=0, use_band_store=True,
        cfg=PipelineConfig(pair_cap=1), metrics_out=metrics).count()
    assert metrics["capped_touched_buckets"] > 0
    assert metrics["pair_cap"] == 1


def test_band_store_partial_append_repaired_on_replay(spark, tmp_path):
    """A multi-file bucketed append is not all-or-nothing: a crash mid-
    commit can leave SOME of a batch's bands in the table with the batch
    unregistered. Replay must restore exactly the missing rows (per-ROW
    idempotent anti-join), not skip the batch because one row exists
    (the old limit(1) probe) and not double the committed rows."""
    import glob
    import json
    import os

    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        band_store_path, band_store_table_name, make_signature_sink)

    rows, _ = clips_src.generate_clips(
        n_base=10, dup_frac=0.3, near_frac=0.0, n_const=0, seed=45)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    def df_of(rs):
        return spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
              r["codec"], r["transcript"]) for r in rs], schema)

    store = str(tmp_path / "store")
    sink = make_signature_sink(store, band_store=True, band_buckets=4)
    cut = len(rows) // 2
    sink(df_of(rows[:cut]), 0)
    sink(df_of(rows[cut:]), 1)
    tbl = band_store_table_name(store)
    expected = sorted(map(tuple, spark.table(tbl).collect()))

    # simulate the torn commit: delete one of batch 1's committed parquet
    # files (losing a slice of its bands) and roll the registry back
    path = band_store_path(store)
    before = spark.table(tbl).count()
    parts = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    by_rows = [(spark.read.parquet(p)
                .filter("src_batch = 1").count(), p) for p in parts]
    victim = max(by_rows)  # a file actually holding batch-1 rows
    assert victim[0] > 0
    os.remove(victim[1])
    spark.sql(f"REFRESH TABLE {tbl}")
    assert spark.table(tbl).count() < before
    reg = os.path.join(path, "_appended_batches.json")
    with open(reg, "w") as f:
        json.dump([0], f)

    sink(df_of(rows[cut:]), 1)  # replay
    spark.sql(f"REFRESH TABLE {tbl}")
    assert sorted(map(tuple, spark.table(tbl).collect())) == expected
    with open(reg) as f:
        assert json.load(f) == [0, 1]


def test_band_store_inflight_batch_does_not_trip_coverage(spark, tmp_path):
    """The lambda race (ADVICE r5 review): the batch layer runs while the
    sink is mid-batch -- signature dirs landed, band append/registry not
    yet written. The band store is only read for history (src_batch <=
    since_batch; delta bands come fresh from the signature tables), so
    this must cluster the delta instead of raising 'does not cover'."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.streaming.lambda_arch import (
        cluster_store_incremental, make_signature_sink)

    rows, _ = clips_src.generate_clips(
        n_base=8, dup_frac=0.5, near_frac=0.0, n_const=0, seed=46)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    def df_of(rs):
        return spark.createDataFrame(
            [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
              r["codec"], r["transcript"]) for r in rs], schema)

    store = str(tmp_path / "store")
    cut = len(rows) // 2
    make_signature_sink(store, band_store=True, band_buckets=4)(
        df_of(rows[:cut]), 0)
    # batch 1 "in flight": sigs landed, band store NOT appended
    make_signature_sink(store, band_store=False)(df_of(rows[cut:]), 1)

    prev = (df_of(rows[:cut]).select("clip_id").distinct()
            .withColumn("component_id", F.col("clip_id")))
    out = cluster_store_incremental(spark, store, prev, since_batch=0,
                                    use_band_store=True)
    got = {r["clip_id"] for r in out.select("clip_id").collect()}
    assert {r["clip_id"] for r in rows[cut:]} <= got
