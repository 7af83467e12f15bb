"""End-to-end proof of the spectral evidence channel inside the pipeline
(PipelineConfig.use_audio_fp): amplitude-jittered near-dups whose
transcripts were ALSO rewritten are invisible to both default channels
(every PCM byte differs -> no shared chunk digest; no shared shingles ->
no text-band collision), so the default pipeline cannot cluster them --
and the audio_fp channel recovers exactly those pairs."""

import numpy as np

from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
from go_cdc_chunkers_spark.sources import clips as clips_src


def _corpus():
    rows, truth, kinds = clips_src.generate_chord_clips(
        n_base=10, dup_frac=0.2, jitter_frac=0.3, insert_frac=0.2, seed=61)
    # rewrite jitter variants' transcripts with unrelated words: the text
    # channel must have nothing to offer
    rng = np.random.default_rng(99)
    for r in rows:
        if kinds.get(r["clip_id"]) == "jitter":
            r["transcript"] = " ".join(
                clips_src.WORDS[int(rng.integers(0, len(clips_src.WORDS)))]
                for _ in range(8))
    return rows, truth, kinds


def _run(spark, rows, workdir, use_audio_fp):
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in rows],
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, "
               "codec string, transcript string",
    )
    pipe = Pipeline(spark, workdir, PipelineConfig(use_audio_fp=use_audio_fp))
    return {r.clip_id: r.component_id for r in pipe.run(df).collect()}


def test_audio_channel_closes_the_jitter_gap(spark, tmp_path):
    rows, truth, kinds = _corpus()
    jitter = [c for c, k in kinds.items() if k == "jitter"]
    others = [c for c, k in kinds.items() if k != "jitter"]
    assert jitter and others

    base = lambda c: f"chord-{truth[c]:08d}"

    label_off = _run(spark, rows, str(tmp_path / "off"), use_audio_fp=False)
    # default channels cluster exact + insert variants...
    for c in others:
        assert label_off[c] == label_off[base(c)], (c, "default channels")
    # ...but NONE of the transcript-rewritten jitter variants
    caught = [c for c in jitter if label_off[c] == label_off[base(c)]]
    assert not caught, f"jitter unexpectedly visible to default channels: {caught}"

    label_on = _run(spark, rows, str(tmp_path / "on"), use_audio_fp=True)
    for c in jitter + others:
        assert label_on[c] == label_on[base(c)], (c, "audio_fp on")
    # precision: audio channel must not merge distinct bases
    for a in list(label_on):
        for b in list(label_on):
            if label_on[a] == label_on[b]:
                assert truth[a] == truth[b], (a, b)

    # the two extra stages resumed from checkpoint: rerun is idempotent
    again = _run(spark, rows, str(tmp_path / "on"), use_audio_fp=True)
    assert again == label_on
