"""Codec-normalized chunking (PipelineConfig.normalize_pcm).

North-star contract: chunking shingles each clip's DECODED PCM bytes, so
chunk identity belongs to the audio, not the storage container. Gates:

  - container invariance: the same samples stored as raw pcm_s16le, a
    RIFF/WAVE container, and a FLAC stream produce byte-identical chunk
    relations (offsets, lengths, hashes) through the decode-fused UDF;
  - the fusion is free: the plan still carries EXACTLY ONE
    ArrowEvalPython node (same guarantee the plain chunk stage pins);
  - end-to-end: a FLAC re-upload of an existing PCM clip lands in its
    base's cluster with normalize_pcm=True, while raw-byte chunking is
    provably blind to it (zero shared chunk hashes);
  - exact_first + normalize_pcm: the cross-codec twin collapses to its
    base BEFORE chunking (content identity = sha256(decoded PCM) +
    transcript hash), labels identical to the non-collapsed run;
  - lossy honesty: a G.711 mu-law re-encode does NOT collapse (decoded
    PCM differs) -- that recall channel is spectral fingerprinting's job;
  - normalize_pcm + max_cell_bytes raises (raw byte ranges are not
    decodable), never silently mis-chunks.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
from go_cdc_chunkers_spark.operators import chunking
from go_cdc_chunkers_spark.operators import codecs
from go_cdc_chunkers_spark.operators.flac import flac_encode
from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
from go_cdc_chunkers_spark.sources import clips as clips_src

CLIP_SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
               "codec string, transcript string")
OPTS = ChunkerOpts(min_size=256, normal_size=1024, max_size=4096)


def _wav_pcm(pcm: np.ndarray, sr: int) -> bytes:
    payload = pcm.tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE"
            + chunks)


@pytest.fixture(scope="module")
def mixed_corpus(spark):
    """Synthetic corpus with cross-codec twins: every clip keeps its
    pcm_s16le original; six base clips additionally appear as FLAC
    re-uploads (same samples, same transcript, new clip_id) and one as a
    lossy mu-law re-encode. Truth maps each twin to its base's group."""
    rows, truth = clips_src.generate_clips(
        n_base=40, dup_frac=0.25, near_frac=0.25, n_const=4, seed=11)
    base = [r for r in rows if r["clip_id"] in truth][:7]
    twins = []
    for i, r in enumerate(base[:6]):
        pcm = np.frombuffer(r["bytes"], dtype="<i2")
        twins.append(dict(
            r,
            clip_id=r["clip_id"] + "_flacdup",
            bytes=bytes(flac_encode(pcm.astype(np.int64), r["sr_hz"])),
            codec="flac",
        ))
        truth[r["clip_id"] + "_flacdup"] = truth[r["clip_id"]]
    lossy_base = base[6]
    lossy_pcm = np.frombuffer(lossy_base["bytes"], dtype="<i2")
    lossy = dict(
        lossy_base,
        clip_id=lossy_base["clip_id"] + "_mulaw",
        bytes=codecs.mulaw_encode(lossy_pcm),
        codec="pcm_mulaw",
    )
    all_rows = rows + twins + [lossy]
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"]), r["sr_hz"], r["dur_ms"],
          r["codec"], r["transcript"]) for r in all_rows],
        schema=CLIP_SCHEMA,
    )
    df.cache().count()
    return df, truth, [t["clip_id"] for t in twins], lossy["clip_id"]


def test_chunks_invariant_across_containers(spark):
    rng = np.random.default_rng(3)
    pcm = rng.integers(-8000, 8000, 60000).astype(np.int16)
    df = spark.createDataFrame(
        [("raw", bytearray(pcm.tobytes()), "pcm_s16le"),
         ("wav", bytearray(_wav_pcm(pcm, 16000)), "wav"),
         ("flc", bytearray(flac_encode(pcm.astype(np.int64), 16000)),
          "flac")],
        "clip_id string, bytes binary, codec string")
    ch = chunking.chunk_clips(df, "fastcdc-v1.0.0", OPTS,
                              codec_col="codec").toPandas()
    rel = {
        cid: [(int(o), int(ln), bytes(h)) for o, ln, h in sorted(
            zip(g["offset"], g["length"], g["chunk_hash"]))]
        for cid, g in ch.groupby("clip_id")
    }
    assert rel["raw"] == rel["wav"] == rel["flc"]
    assert len(rel["raw"]) > 10


def test_decode_fused_single_arrow_eval(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"\x00\x01" * 600), "pcm_s16le")],
        "clip_id string, bytes binary, codec string")
    plan = (chunking.chunk_clips(df, "fastcdc-v1.0.0", OPTS,
                                 codec_col="codec")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("ArrowEvalPython") == 1, plan


def test_raw_byte_chunking_blind_to_flac_twin(spark, mixed_corpus):
    """The motivating negative: without decode, a FLAC re-upload shares
    ZERO chunk hashes with its byte-identical-audio base."""
    df, _truth, twin_ids, _lossy = mixed_corpus
    twin = twin_ids[0]
    base = twin[: -len("_flacdup")]
    pair = df.filter(F.col("clip_id").isin([base, twin]))
    raw = chunking.chunk_clips(pair, "fastcdc-v1.0.0", OPTS).toPandas()
    by_clip = {cid: set(map(bytes, g["chunk_hash"]))
               for cid, g in raw.groupby("clip_id")}
    assert not (by_clip[base] & by_clip[twin])
    norm = chunking.chunk_clips(pair, "fastcdc-v1.0.0", OPTS,
                                codec_col="codec").toPandas()
    by_clip = {cid: sorted(map(bytes, g["chunk_hash"]))
               for cid, g in norm.groupby("clip_id")}
    assert by_clip[base] == by_clip[twin]


@pytest.fixture(scope="module")
def normalized_run(spark, mixed_corpus, tmp_path_factory):
    df, _truth, _twins, _lossy = mixed_corpus
    wd = str(tmp_path_factory.mktemp("norm_pipe"))
    pipe = Pipeline(spark, wd, PipelineConfig(normalize_pcm=True))
    comps = pipe.run(df)
    return {r["clip_id"]: r["component_id"] for r in comps.collect()}


def test_pipeline_clusters_cross_codec_twins(normalized_run, mixed_corpus):
    _df, truth, twin_ids, _lossy = mixed_corpus
    labels = normalized_run
    for twin in twin_ids:
        base = twin[: -len("_flacdup")]
        assert labels[twin] == labels[base], (twin, base)


def test_pipeline_recall_with_mixed_codecs(normalized_run, mixed_corpus):
    from collections import defaultdict

    _df, truth, _twins, lossy_id = mixed_corpus
    groups = defaultdict(list)
    for cid, gid in truth.items():
        groups[gid].append(cid)
    want = {
        (a, b)
        for members in groups.values()
        for i, a in enumerate(sorted(members))
        for b in sorted(members)[i + 1:]
    }
    by_label = defaultdict(list)
    for cid, lab in normalized_run.items():
        by_label[lab].append(cid)
    got = {
        (a, b)
        for members in by_label.values()
        for i, a in enumerate(sorted(members))
        for b in sorted(members)[i + 1:]
    }
    recall = len(want & got) / len(want)
    assert recall >= 0.99, recall


def test_exact_first_collapses_cross_codec_twins(spark, mixed_corpus,
                                                 normalized_run,
                                                 tmp_path_factory):
    df, _truth, twin_ids, lossy_id = mixed_corpus
    wd = str(tmp_path_factory.mktemp("norm_exact_pipe"))
    pipe = Pipeline(spark, wd,
                    PipelineConfig(normalize_pcm=True, exact_first=True))
    comps = pipe.run(df)
    labels = {r["clip_id"]: r["component_id"] for r in comps.collect()}
    assert labels == normalized_run
    groups = {r["clip_id"]: r["canonical_id"]
              for r in spark.read.parquet(f"{wd}/exact_groups").collect()}
    for twin in twin_ids:
        assert groups[twin] == groups[twin[: -len("_flacdup")]], twin
    # lossy honesty: mu-law decode != original PCM, no exact collapse
    assert groups[lossy_id] == lossy_id


def test_streaming_normalized_chunks_equal_batch(spark, tmp_path):
    """The streaming face of the same contract: stream_chunks(
    normalize_pcm=True) over a mixed-codec source produces exactly the
    batch decode-fused chunk relation, and a FLAC twin's chunk rows equal
    its PCM base's (modulo clip_id) inside the streamed output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_cdc_chunkers_spark.streaming.ingest import run_ingest_to_memory

    rng = np.random.default_rng(9)
    rows = []
    for i in range(6):
        pcm = rng.integers(-6000, 6000, 30000 + 700 * i).astype(np.int16)
        rows.append((f"p{i}", pcm.tobytes(), "pcm_s16le"))
        if i < 2:
            rows.append((f"p{i}_flac",
                         bytes(flac_encode(pcm.astype(np.int64), 16000)),
                         "flac"))
    src = str(tmp_path / "clips.parquet")
    pq.write_table(pa.table({
        "clip_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "sr_hz": pa.array([16000] * len(rows), pa.int32()),
        "dur_ms": pa.array([0] * len(rows), pa.int32()),
        "codec": pa.array([r[2] for r in rows], pa.string()),
        "transcript": pa.array([""] * len(rows), pa.string()),
    }), src)
    run_ingest_to_memory(spark, str(tmp_path), "norm_stream_out",
                         opts=OPTS, normalize_pcm=True)
    got = sorted(
        (r.clip_id, r.chunk_idx, r.offset, r.length, bytes(r.chunk_hash))
        for r in spark.sql("SELECT * FROM norm_stream_out").collect())
    batch = chunking.chunk_clips(spark.read.parquet(src), "fastcdc-v1.0.0",
                                 OPTS, codec_col="codec")
    want = sorted(
        (r.clip_id, r.chunk_idx, r.offset, r.length, bytes(r.chunk_hash))
        for r in batch.collect())
    assert got == want and len(got) > 0
    by_clip = {}
    for cid, idx, off, ln, h in got:
        by_clip.setdefault(cid, []).append((idx, off, ln, h))
    for i in range(2):
        assert by_clip[f"p{i}_flac"] == by_clip[f"p{i}"]


def test_normalize_pcm_rejects_max_cell_bytes(spark, mixed_corpus):
    df, *_ = mixed_corpus
    pipe = Pipeline(spark, "/tmp/unused_norm_guard",
                    PipelineConfig(normalize_pcm=True,
                                   max_cell_bytes=1 << 20))
    with pytest.raises(ValueError, match="normalize_pcm"):
        pipe.run(df)
