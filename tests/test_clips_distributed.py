"""generate_clips_df: the executor-side synthetic corpus (sources/clips.py).

Pins the properties the spark-submit deployment face depends on:
  - partition independence: every clip is a pure function of
    (seed, role, index), so the relation cannot depend on how spark.range
    was sliced;
  - structural parity with generate_clips (schema, counts, duplicate-group
    shape, SNR-bounded near-dup edit model) without byte parity (per-clip
    PCG64 streams vs the sequential driver stream — documented);
  - the pipeline's recall >= 0.99 gate holds on this corpus exactly as it
    does on the driver-side one (test_pipeline_recall.py's gate).
"""

from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators.components import dup_pairs_from_components
from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
from go_cdc_chunkers_spark.sources import clips as clips_src

from .test_pipeline_recall import truth_pairs


def _rows(df):
    return sorted(
        (r.clip_id, bytes(r.bytes), r.sr_hz, r.dur_ms, r.codec, r.transcript)
        for r in df.collect()
    )


def test_partition_independent_and_deterministic(spark):
    a, _ = clips_src.generate_clips_df(spark, n_base=24, num_partitions=1)
    b, _ = clips_src.generate_clips_df(spark, n_base=24, num_partitions=7)
    ra, rb = _rows(a), _rows(b)
    assert ra == rb
    assert len(ra) == 24 + 6 + 6 + 4  # base + dup + near + const


def test_structure_matches_generate_clips_shape(spark):
    kw = dict(n_base=24, dup_frac=0.25, near_frac=0.25, n_const=4, seed=42)
    clips, truth = clips_src.generate_clips_df(spark, **kw)
    rows = {r.clip_id: r for r in clips.collect()}
    groups = {r.clip_id: r.group_id for r in truth.collect()}
    assert set(rows) == set(groups)
    assert clips.schema.simpleString() == (
        "struct<clip_id:string,bytes:binary,sr_hz:int,dur_ms:int,"
        "codec:string,transcript:string>")
    # duplicate rows carry byte-identical PCM of their base
    n_dup = 6
    for k in range(n_dup):
        cid = f"clip-{24 + k:08d}"
        src = groups[cid]
        assert bytes(rows[cid].bytes) == bytes(rows[f"clip-{src:08d}"].bytes)
    # near rows: same base group, SNR-bounded edits -> similar length
    for k in range(6):
        cid = f"clip-{24 + 6 + k:08d}"
        src = groups[cid]
        base = rows[f"clip-{src:08d}"]
        assert len(rows[cid].bytes) == len(base.bytes) + 2 * 16  # 16 inserts
    # const clips form the two pathological groups
    const_groups = {groups[f"clip-{24 + 12 + k:08d}"] for k in range(4)}
    assert const_groups == {24, 25}


def test_mixed_codecs_reencode(spark):
    clips, _ = clips_src.generate_clips_df(spark, n_base=9, mixed_codecs=True)
    by_codec = {r["codec"]: r["cnt"] for r in
                clips.groupBy("codec").agg(F.count("*").alias("cnt")).collect()}
    assert set(by_codec) == {"pcm_s16le", "flac", "wav"}
    # a flac row decodes back to the exact samples of its pcm twin-by-index
    from go_cdc_chunkers_spark.operators.flac import flac_decode
    row = clips.filter(F.col("codec") == "flac").limit(1).collect()[0]
    pcm, sr, _bps = flac_decode(bytes(row.bytes))
    assert sr == row.sr_hz and pcm.shape[0] > 0


def test_pipeline_recall_on_distributed_corpus(spark, tmp_path):
    clips, truth_df = clips_src.generate_clips_df(
        spark, n_base=60, dup_frac=0.3, near_frac=0.3, n_const=4, seed=42)
    comps = Pipeline(spark, str(tmp_path / "wd"), PipelineConfig()).run(clips)
    predicted = {(r.a, r.b)
                 for r in dup_pairs_from_components(comps).collect()}
    truth = {r.clip_id: r.group_id for r in truth_df.collect()}
    want = truth_pairs(truth)
    found = len(want & predicted)
    recall = found / len(want)
    assert recall >= 0.99, f"recall {recall:.4f} ({found}/{len(want)})"
