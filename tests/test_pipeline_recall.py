"""Pipeline-level gates (SURVEY.md section 5.8 / north_rule):

  - dup-pair recall >= 0.99 against the brute-force ground truth of the
    synthetic table (all intra-group pairs, transitively closed -- exactly
    what connected components must recover);
  - precision sanity (clusters don't collapse the corpus);
  - resume-from-checkpoint idempotency: a second run over the same workdir
    recomputes nothing and yields identical assignments; deleting a
    late-stage output re-runs only that suffix with identical results;
  - per-row invariant: decoded PCM round-trips (allclose / SNR) and
    transcript equality between the table and the decode operator.
"""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators.components import dup_pairs_from_components
from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
from go_cdc_chunkers_spark.sources import clips as clips_src


@pytest.fixture(scope="module")
def synth(spark):
    kw = dict(n_base=60, dup_frac=0.3, near_frac=0.3, n_const=4, seed=42)
    rows, truth = clips_src.generate_clips(**kw)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in rows],
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    df.cache().count()
    return df, rows, truth


def truth_pairs(truth: dict) -> set:
    from collections import defaultdict

    groups = defaultdict(list)
    for cid, gid in truth.items():
        groups[gid].append(cid)
    pairs = set()
    for members in groups.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


@pytest.fixture(scope="module")
def pipeline_run(spark, synth, tmp_path_factory):
    df, rows, truth = synth
    wd = str(tmp_path_factory.mktemp("pipe"))
    pipe = Pipeline(spark, wd, PipelineConfig())
    comps = pipe.run(df)
    return pipe, wd, comps.collect()


def test_recall_gate(pipeline_run, synth, spark):
    _pipe, _wd, comp_rows = pipeline_run
    df, rows, truth = synth
    comps = spark.createDataFrame(comp_rows)
    predicted = {
        (r.a, r.b) for r in dup_pairs_from_components(comps).collect()
    }
    want = truth_pairs(truth)
    found = len(want & predicted)
    recall = found / len(want)
    assert recall >= 0.99, f"recall {recall:.4f} ({found}/{len(want)})"


def test_precision_sanity(pipeline_run, synth, spark):
    _pipe, _wd, comp_rows = pipeline_run
    df, rows, truth = synth
    comps = spark.createDataFrame(comp_rows)
    predicted = {
        (r.a, r.b) for r in dup_pairs_from_components(comps).collect()
    }
    want = truth_pairs(truth)
    # every predicted pair should be a true pair on this fixture (distinct
    # base clips are random-content, far apart in every channel)
    wrong = predicted - want
    precision = 1 - len(wrong) / max(len(predicted), 1)
    assert precision >= 0.95, f"precision {precision:.4f}, wrong={sorted(wrong)[:5]}"


def test_lineage_written(pipeline_run, spark):
    pipe, wd, _ = pipeline_run
    lin = pipe.lineage_table().collect()
    stages = {r.stage for r in lin}
    assert {"chunks_pcm", "sig_pcm", "sig_text", "simhash_text", "bands",
            "candidates", "verified", "containment", "components"} <= stages
    assert all(r.finished >= r.started for r in lin)
    # per-partition metrics (north_rule): every data stage records its
    # output partition balance; skew = max/mean rows >= 1 by construction
    # (metric-only rows like the cap audit carry no partition fields)
    data_rows = [r for r in lin if r.part_skew is not None]
    assert data_rows
    assert all(r.part_skew >= 1.0 and r.part_rows_max >= r.part_rows_min
               for r in data_rows)
    # star-cap audit row: this corpus's buckets stay under the default
    # pair_cap, so the run certifies itself label-identical to an
    # uncapped re-run
    audit = [r for r in lin if r.stage == "candidates_cap_audit"]
    assert len(audit) == 1
    assert audit[0].rows_out == 0 and audit[0].labels_match_uncapped_rerun


def test_cap_audit_fires_on_hot_buckets(spark, tmp_path):
    """Adversarial arm of the star-cap audit (VERDICT r4 item 5): constant
    clips collapse to one signature per fill group, every band maps the
    group to one hot bucket, and a small pair_cap forces the star
    fallback -- the lineage audit row must COUNT those buckets (the
    'labels identical unless a bucket was capped' caveat is now
    observable, not just documented), and a stage resume must not
    duplicate the row."""
    rows, _ = clips_src.generate_clips(
        n_base=12, dup_frac=0.0, near_frac=0.0, n_const=8, seed=7)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in rows],
        schema=("clip_id string, bytes binary, sr_hz int, dur_ms int, "
                "codec string, transcript string"))
    wd = str(tmp_path / "capwd")
    cfg = PipelineConfig(pair_cap=3)
    Pipeline(spark, wd, cfg).run(df).count()
    pipe = Pipeline(spark, wd, cfg)
    audit = [r for r in pipe.lineage_table().collect()
             if r.stage == "candidates_cap_audit"]
    assert len(audit) == 1
    assert audit[0].rows_out > 0
    assert not audit[0].labels_match_uncapped_rerun
    assert audit[0].pair_cap == 3
    # resume: candidates stage is cached -> no second audit row
    pipe.run(df).count()
    audit2 = [r for r in pipe.lineage_table().collect()
              if r.stage == "candidates_cap_audit"]
    assert len(audit2) == 1


def test_resume_idempotent(pipeline_run, synth, spark):
    pipe, wd, comp_rows = pipeline_run
    df, rows, truth = synth
    # Re-run over the same workdir: all stages resume, result identical.
    pipe2 = Pipeline(spark, wd, PipelineConfig())
    again = pipe2.run(df).collect()
    assert sorted((r.clip_id, r.component_id) for r in again) == sorted(
        (r.clip_id, r.component_id) for r in comp_rows
    )
    n_lineage_before = pipe2.lineage_table().count()
    # Kill a late stage; only that suffix recomputes and output matches.
    shutil.rmtree(f"{wd}/components")
    pipe3 = Pipeline(spark, wd, PipelineConfig())
    third = pipe3.run(df).collect()
    assert sorted((r.clip_id, r.component_id) for r in third) == sorted(
        (r.clip_id, r.component_id) for r in comp_rows
    )
    assert pipe3.lineage_table().count() == n_lineage_before + 1


def test_exact_first_identical_components(pipeline_run, synth, spark, tmp_path_factory):
    """Canonical-first clustering (PipelineConfig.exact_first): collapsing
    byte-identical clips before the expensive stages yields IDENTICAL
    (clip_id, component_id) assignments -- the canonical is the min id of
    its exact group, so even the labels match -- while chunking strictly
    fewer clips (the dup_frac fraction skipped)."""
    df, rows, truth = synth
    _pipe, _wd, comp_rows = pipeline_run
    wd = str(tmp_path_factory.mktemp("pipe_exact"))
    pipe = Pipeline(spark, wd, PipelineConfig(exact_first=True))
    got = pipe.run(df).collect()
    assert sorted((r.clip_id, r.component_id) for r in got) == sorted(
        (r.clip_id, r.component_id) for r in comp_rows
    )
    groups = spark.read.parquet(f"{wd}/exact_groups")
    n_clips = df.count()
    n_canon = groups.filter(F.col("clip_id") == F.col("canonical_id")).count()
    assert n_canon < n_clips  # the fixture's dup_frac was actually skipped
    # the chunking stage saw only canonicals
    chunked = spark.read.parquet(f"{wd}/chunks_pcm").select("clip_id").distinct().count()
    assert chunked <= n_canon


def test_per_row_invariant_decode_and_transcript(synth, spark):
    """BASELINE.json input_hint: decoded-PCM allclose (SNR >= 30 dB) +
    transcript equality, checked per row through the Spark path."""
    df, rows, truth = synth
    got = {r["clip_id"]: r for r in (row.asDict() for row in df.collect())}
    for r in rows:
        g = got[r["clip_id"]]
        ref = clips_src.decode_pcm(r["bytes"], r["codec"])
        spk = clips_src.decode_pcm(bytes(g["bytes"]), g["codec"])
        assert np.array_equal(ref, spk)  # exact: stronger than allclose
        sig = float(np.mean(ref.astype(np.float64) ** 2))
        noise = float(np.mean((ref.astype(np.float64) - spk.astype(np.float64)) ** 2))
        snr_ok = noise == 0 or 10 * np.log10(sig / noise) >= 30
        assert snr_ok
        assert g["transcript"] == r["transcript"]


def test_poly128_digest_kind_same_components(spark, tmp_path):
    """PipelineConfig.digest_kind='poly128' swaps the chunk identity hash
    only: cuts are identical, so MinHash signatures see the same chunk-set
    structure and the final components must be identical to the sha256
    run."""
    from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
    from go_cdc_chunkers_spark.sources import clips as clips_src

    rows, _truth = clips_src.generate_clips(
        n_base=20, dup_frac=0.25, near_frac=0.25, n_const=2, seed=17)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["transcript"]) for r in rows],
        schema="clip_id string, bytes binary, transcript string",
    )
    out = {}
    for kind in ("sha256", "poly128"):
        pipe = Pipeline(spark, str(tmp_path / kind),
                        PipelineConfig(digest_kind=kind))
        out[kind] = sorted(
            (r.clip_id, r.component_id) for r in pipe.run(df).collect())
    assert out["sha256"] == out["poly128"]
