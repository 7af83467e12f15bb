"""Audio spectral fingerprinting: peak-landmark hashes + aligned matching.

The byte-level CDC channel (chunk MinHash) recovers insertion-edited
near-dups but is structurally blind to amplitude jitter: y = x*(1+e)
perturbs every PCM byte, so no chunk digest survives (sources/clips.py
documents this as the reason the pipeline pairs SimHash with chunk
MinHash). This module adds the audio-native channel: constellation
fingerprints in the style of the published landmark method (Wang 2003,
"An Industrial-Strength Audio Search Algorithm") / Haitsma-Kalker robust
hashing -- peaks of the magnitude spectrogram survive both amplitude
scaling (monotone transform of all magnitudes preserves top-k peak bins)
and small time shifts (a k-sample insertion, k << hop, leaves windowed
magnitude spectra of stationary content unchanged and frame offsets
intact), so landmark hashes match where chunk digests cannot.

Pipeline shape (designed for 10^12 clips):
  1. `spectral_fingerprints` -- mapInPandas (Arrow-batched numpy rFFT; the
     decode/feature stage is the one legitimate Python stage, same as
     multimodal.py) -> fingerprints(clip_id, hash, t). Narrow, no shuffle.
  2. `canonical_fingerprints` -- one row per (clip, hash), earliest frame:
     bounds the match join at one row pair per clip pair per hash.
  3. `prune_common_hashes` -- document-frequency stop-hash removal: a hash
     occurring in more than max_df clips is a boilerplate landmark (the
     audio analogue of a stopword; constant-PCM clips concentrate here) and
     is dropped BEFORE the join. This is the skew control: post-prune, a
     hash key joins at most max_df x max_df rows, so no quadratic bucket
     can form -- same role as candidates.py's pair_cap but exercised at the
     key-frequency level.
  4. `fingerprint_pairs` -- equi-join on hash (the bucket key; never a
     cartesian), count matches per (pair, time-offset), keep each pair's
     best-aligned offset (the Wang histogram-peak alignment step as a
     groupBy + max), score = aligned / min(|fp_a|, |fp_b|).

Everything after the UDF is JVM joins/aggregations, oracle-checkable
relationally (entry_queries.audio_fp_neardup).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FP_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("hash", T.LongType()),
    T.StructField("t", T.IntegerType()),
])


def clip_landmarks(
    pcm: np.ndarray,
    frame: int = 1024,
    hop: int = 512,
    n_peaks: int = 4,
    dt_max: int = 3,
    min_bin: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, anchor_frames) for one int16 PCM stream. Deterministic:
    peaks are the top-`n_peaks` magnitude bins per frame (bin index breaks
    ties), landmarks pair every anchor-frame peak with every peak of the
    next `dt_max` frames; hash packs (f1 << 16) | (f2 << 6) | dt (rFFT of a
    1024 frame has 513 bins -> 10 bits; dt_max < 64 -> 6 bits)."""
    x = pcm.astype(np.float64)
    if len(x) < frame + hop:
        # landmarks pair peaks across >= 2 frames; 0- and 1-frame clips
        # have none (and an empty dt loop must not reach np.concatenate)
        return np.empty(0, np.int64), np.empty(0, np.int32)
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * np.hanning(frame), axis=1))
    spec[:, :min_bin] = 0.0  # DC / near-DC never a landmark
    # top-k bins per frame; argpartition then in-bucket sort by (-mag, bin)
    part = np.argpartition(-spec, n_peaks - 1, axis=1)[:, :n_peaks]
    mags = np.take_along_axis(spec, part, axis=1)
    order = np.lexsort((part, -mags), axis=1)
    peaks = np.take_along_axis(part, order, axis=1).astype(np.int64)  # (F, P)

    hashes, ts = [], []
    for dt in range(1, min(dt_max, n_frames - 1) + 1):
        f1 = peaks[:-dt, :, None]                      # (F-dt, P, 1) anchors
        f2 = peaks[dt:, None, :]                       # (F-dt, 1, P) targets
        h = ((f1 << 16) | (f2 << 6) | dt).reshape(-1)
        t = np.repeat(np.arange(n_frames - dt, dtype=np.int32),
                      peaks.shape[1] * peaks.shape[1])
        hashes.append(h)
        ts.append(t)
    return np.concatenate(hashes), np.concatenate(ts)


def spectral_fingerprints(
    clips: DataFrame,
    frame: int = 1024,
    hop: int = 512,
    n_peaks: int = 4,
    dt_max: int = 3,
    data_col: str = "bytes",
    id_col: str = "clip_id",
) -> DataFrame:
    """clips -> fingerprints(clip_id, hash, t). Narrow mapInPandas stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_h, out_t = [], [], []
            for cid, raw in zip(pdf[id_col], pdf[data_col]):
                if raw is None:
                    continue
                n = len(raw) - (len(raw) % 2)
                pcm = np.frombuffer(raw[:n], dtype="<i2")
                h, t = clip_landmarks(pcm, frame, hop, n_peaks, dt_max)
                out_id.append(np.repeat(cid, len(h)))
                out_h.append(h)
                out_t.append(t)
            if out_id:
                yield pd.DataFrame({
                    "clip_id": np.concatenate(out_id),
                    "hash": np.concatenate(out_h),
                    "t": np.concatenate(out_t),
                })

    return clips.select(id_col, data_col).mapInPandas(gen, FP_SCHEMA)


def canonical_fingerprints(fps: DataFrame) -> DataFrame:
    """First occurrence per (clip_id, hash). Stationary content repeats a
    landmark hash on every frame; keeping one row per hash per clip bounds
    the match join at ONE row pair per clip pair per hash (multiplicity
    m_a x m_b would otherwise go quadratic in repeat count) and loses no
    alignment signal: repeats of a stationary hash carry the same offset
    its first occurrence does."""
    return fps.groupBy("clip_id", "hash").agg(F.min("t").alias("t"))


def prune_common_hashes(fps: DataFrame, max_df: int = 32) -> DataFrame:
    """Drop stop-hashes (landmarks present in > max_df clips). Bounds every
    join key's bucket at max_df clips -- the skew control (module doc)."""
    df_counts = fps.groupBy("hash").agg(
        F.count_distinct("clip_id").alias("_df")
    )
    keep = df_counts.filter(F.col("_df") <= max_df).select("hash")
    return fps.join(keep, "hash", "left_semi")


def scoped_fingerprints(
    pruned: DataFrame, scope_clip_ids: DataFrame
) -> DataFrame:
    """The delta-bounded match-join input: rows of a canonicalized+pruned
    fingerprint relation whose hash appears in at least one scope clip's
    fingerprints. Every landmark a scope clip shares with ANY clip is a
    landmark the scope clip itself carries, so restricting BOTH join sides
    to this subset preserves every match row of every pair that involves a
    scope clip -- per-offset counts for those pairs are exactly the full
    run's. Rows carrying hashes no scope clip has (the O(corpus) bulk of an
    incremental run's store) never enter the join."""
    delta_hashes = (
        pruned.join(scope_clip_ids.select("clip_id"), "clip_id", "left_semi")
        .select("hash")
        .distinct()
    )
    return pruned.join(delta_hashes, "hash", "left_semi")


def fingerprint_pairs(
    fps: DataFrame,
    min_frac: float = 0.25,
    min_matches: int = 8,
    max_df: int = 32,
    scope_clip_ids: DataFrame | None = None,
) -> DataFrame:
    """-> pairs(a, b, aligned_matches, match_frac). A match counts only at
    the pair's best-aligned time offset (insertions shift later frames by
    round(k/hop) = 0 for sample-scale edits, so true dups concentrate at
    one offset; chance collisions scatter across offsets).

    `fps` should be a MATERIALIZED relation (parquet stage output or
    .persist()): this plan references it several times (sizes + both join
    sides + the df-prune), and an unmaterialized lineage would re-run the
    FFT UDF once per reference. Same stage-boundary contract as every
    plans/pipeline.py stage; entry_queries.audio_fp_neardup materializes,
    and tests/test_plan_shapes.py pins zero Python stages downstream of
    the materialized scan.

    scope_clip_ids(clip_id): incremental mode. Returns exactly the full
    run's pairs that involve a scope clip, but the expensive hash equi-join
    runs only over scoped_fingerprints() -- rows whose hash a scope clip
    carries -- so join cost is bounded by the delta's hash set, not the
    corpus. The two full-relation passes that remain are count-only
    aggregates (per-clip n_fp for match_frac denominators, per-hash df for
    the stop-hash prune): both are map-side-combinable single aggregations
    with no pair blowup, the honest O(store-scan) floor any
    normalization-correct incremental matcher pays."""
    pruned = prune_common_hashes(canonical_fingerprints(fps), max_df=max_df)
    sizes = pruned.groupBy("clip_id").agg(F.count("*").cast("long").alias("n_fp"))
    joinable = (pruned if scope_clip_ids is None
                else scoped_fingerprints(pruned, scope_clip_ids))

    left = joinable.select(F.col("clip_id").alias("a"), "hash", F.col("t").alias("ta"))
    right = joinable.select(F.col("clip_id").alias("b"), "hash", F.col("t").alias("tb"))
    per_offset = (
        left.join(right, "hash")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", (F.col("ta") - F.col("tb")).alias("off"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    best = per_offset.groupBy("a", "b").agg(F.max("c").alias("aligned_matches"))
    if scope_clip_ids is not None:
        # old-old pairs that merely share a delta hash: drop them (the run
        # that saw both members already found them); keep delta-involving
        # pairs, whose counts above are exact (scoped_fingerprints doc).
        ids = scope_clip_ids.select("clip_id")
        best = (
            best.join(ids.select(F.col("clip_id").alias("a"),
                                 F.lit(True).alias("_na")), "a", "left")
            .join(ids.select(F.col("clip_id").alias("b"),
                             F.lit(True).alias("_nb")), "b", "left")
            .filter(F.coalesce("_na", F.lit(False))
                    | F.coalesce("_nb", F.lit(False)))
            .drop("_na", "_nb")
        )
    na = sizes.select(F.col("clip_id").alias("a"), F.col("n_fp").alias("_na"))
    nb = sizes.select(F.col("clip_id").alias("b"), F.col("n_fp").alias("_nb"))
    return (
        best.join(na, "a").join(nb, "b")
        .withColumn("match_frac",
                    F.col("aligned_matches") / F.least("_na", "_nb"))
        .filter((F.col("aligned_matches") >= min_matches)
                & (F.col("match_frac") >= min_frac))
        .select("a", "b", "aligned_matches", "match_frac")
    )
