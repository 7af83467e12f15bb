"""Bounded-memory chunking of files larger than one Arrow cell
(range-split reads + overlap stitching).

The reference chunks unbounded io.Reader streams in 2xMaxSize memory
(/root/reference/reader.go:35-107, chunkers.go:160-190); the engine's
binaryFile path (sources/files.py) instead loads each file whole, so a
multi-GB file OOMs a task. This module restores the bounded-memory
contract Spark-natively:

  1. plan_ranges(): split each file into ranges of `range_bytes` with
     `overlap` extra bytes read past each boundary (metadata only -- no
     bytes in the plan).
  2. chunk_ranges(): mapInPandas reads ONLY its range (seek+read) and
     cold-starts the cutpoint kernel at the range start. Peak task memory
     = range_bytes + overlap, independent of file size -- the Spark
     analogue of the reference's pooled 2xMaxSize buffer.
  3. stitch: a cold scan entered mid-stream emits garbage cutpoints until
     it *resynchronizes* with the true cut sequence -- the
     boundary-independence property the reference's own buffer-equivalence
     tests pin (/root/reference/tests/buffer_test.go:59-114: chunking is a
     function of content, not of read-buffer placement). The first
     cutpoint shared by range i (true, by induction from a true entry) and
     the cold scan of range i+1 inside the overlap window is therefore a
     true cutpoint, and everything range i+1 emits after it is true.

Scale design: seam agreement is *pairwise-local* -- it depends only on the
two adjacent ranges' cutpoints inside the overlap window, never on the
whole file -- because the previous seam always lands before the next range
start (enforced: overlap <= range_bytes). Stitching is therefore one
equi-join on (file, seam, cutpoint) over cut *metadata*, fully
distributed; no per-file sequential pass, no driver loop, no applyInPandas
group that grows with file size. A 1 TB file is ~32k independent range
tasks + a metadata join.

Resync can fail only on pathological content (e.g. constant bytes forcing
back-to-back MaxSize cuts, where a misaligned cold scan never agrees).
Failed files are detected relationally (a seam with no agreed cutpoint)
and re-chunked whole by default (on_stitch_failure="fallback") -- correct
for any content, bounded-memory only for files that fit a task.

Correctness gates: tests/test_bigfile.py (stitched == whole-buffer kernel,
byte-exact, across algorithms / range sizes / pathological content) and
the driver row cdc_bigfile_chunks (stitched chunk relation hash-matches a
whole-buffer chunk relation computed independently).
"""

from __future__ import annotations

import hashlib
import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cdc import kernels
from ..cdc.opts import ChunkerOpts, ResolvedOpts, resolve

# chunk_ranges output: candidate chunks with absolute offsets, plus the
# range bookkeeping the stitch join needs.
_CAND_SCHEMA = (
    "clip_id string, range_idx int, start long, read_len long, size long, "
    "n_ranges int, offset long, length int, chunk_hash binary"
)


def list_local_files(spark: SparkSession, root: str, glob: str | None = None) -> DataFrame:
    """(clip_id=path, size) for a local/shared-FS tree. Driver-side walk --
    listing is metadata, cheap at any file size; swap for an object-store
    lister (or an Iceberg files table) off-box."""
    import fnmatch

    rows = []
    for dirpath, _dirs, names in os.walk(root):
        for name in sorted(names):
            if glob and not fnmatch.fnmatch(name, glob):
                continue
            p = os.path.join(dirpath, name)
            rows.append((p, os.path.getsize(p)))
    return spark.createDataFrame(rows, "clip_id string, size long")


def plan_ranges(files: DataFrame, range_bytes: int, overlap: int) -> DataFrame:
    """files(clip_id, size) -> one row per byte range, JVM-side (sequence +
    explode, no UDF): (clip_id, size, n_ranges, range_idx, start, read_len).

    n_ranges = 1 when the whole file fits one read (size <= R + O), else
    ceil(size / R); each range reads [i*R, min(i*R + R + O, size))."""
    R, O = int(range_bytes), int(overlap)
    n = F.when(F.col("size") <= R + O, F.lit(1)).otherwise(
        F.ceil(F.col("size") / F.lit(R)).cast("int")
    )
    return (
        files.select("clip_id", "size", n.alias("n_ranges"))
        .select(
            "clip_id", "size", "n_ranges",
            F.explode(F.sequence(F.lit(0), F.col("n_ranges") - 1)).alias("range_idx"),
        )
        .select(
            "clip_id", "size", "n_ranges", "range_idx",
            (F.col("range_idx").cast("long") * R).alias("start"),
            F.least(
                F.lit(R + O).cast("long"),
                F.col("size") - F.col("range_idx").cast("long") * R,
            ).alias("read_len"),
        )
    )


def chunk_ranges(ranges: DataFrame, r: ResolvedOpts,
                 digest: bool | str = True) -> DataFrame:
    """Cold-start the kernel on each range read. Bytes are read inside the
    UDF (seek+read of exactly read_len) and never enter the plan; output is
    candidate-chunk metadata with ABSOLUTE offsets. Ranges are shuffled by
    (clip_id, range_idx) first so one huge file spreads over the cluster.
    digest follows kernels.split_chunks: True/"sha256", "poly128", False."""
    if digest not in (True, False, "sha256", "poly128"):
        raise ValueError(f"unknown digest kind {digest!r}")

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "clip_id", "range_idx", "start", "read_len", "size",
                "n_ranges", "offset", "length", "chunk_hash",
            )}
            for cid, ridx, start, rlen, size, nrg in zip(
                pdf["clip_id"], pdf["range_idx"], pdf["start"],
                pdf["read_len"], pdf["size"], pdf["n_ranges"],
            ):
                path = cid[5:] if cid.startswith("file:") else cid
                with open(path, "rb") as f:
                    f.seek(int(start))
                    data = f.read(int(rlen))
                lengths = kernels.split_lengths(r, data)
                if digest == "poly128":
                    import numpy as _np

                    packed = _np.ascontiguousarray(
                        kernels.digest_poly128(data, lengths), dtype="<u8"
                    ).tobytes()
                pos = 0
                for i, ln in enumerate(lengths):
                    if digest == "poly128":
                        h = packed[16 * i:16 * i + 16]
                    elif digest:
                        h = hashlib.sha256(data[pos:pos + ln]).digest()
                    else:
                        h = b""
                    out["clip_id"].append(cid)
                    out["range_idx"].append(int(ridx))
                    out["start"].append(int(start))
                    out["read_len"].append(int(rlen))
                    out["size"].append(int(size))
                    out["n_ranges"].append(int(nrg))
                    out["offset"].append(int(start) + pos)
                    out["length"].append(ln)
                    out["chunk_hash"].append(h)
                    pos += ln
            yield pd.DataFrame(out)

    return ranges.repartition("clip_id", "range_idx").mapInPandas(
        gen, schema=_CAND_SCHEMA
    )


def _agreed_seams(cand: DataFrame, max_size: int, range_bytes: int) -> DataFrame:
    """(clip_id, seam_id, agreed): seam s sits between ranges s-1 and s;
    `agreed` is the smallest cutpoint emitted by BOTH sides inside the
    overlap, restricted to each side's trustworthy region.

    A cut at absolute position p is trustworthy for a range iff the scan
    that produced it never ran out of lookahead: p <= range_end - MaxSize,
    or the range reads to EOF (end-of-stream semantics are then the true
    stream's own). Cuts of range s-1 past the next range's start are the
    left candidates; every cut of range s is a right candidate (all its
    cuts are > its start by construction)."""
    cuts = cand.select(
        "clip_id", "range_idx", "start", "n_ranges",
        (F.col("offset") + F.col("length")).alias("cut"),
        F.when(
            F.col("start") + F.col("read_len") >= F.col("size"),
            F.col("size"),
        ).otherwise(F.col("start") + F.col("read_len") - F.lit(max_size)).alias("_trust"),
    ).filter(F.col("cut") <= F.col("_trust"))

    left = cuts.filter(
        (F.col("range_idx") < F.col("n_ranges") - 1)
        & (F.col("cut") > F.col("start") + F.lit(range_bytes))
    ).select("clip_id", (F.col("range_idx") + 1).alias("seam_id"), "cut")
    right = cuts.filter(F.col("range_idx") > 0).select(
        "clip_id", F.col("range_idx").alias("seam_id"), "cut"
    )
    return (
        left.join(right, ["clip_id", "seam_id", "cut"])
        .groupBy("clip_id", "seam_id")
        .agg(F.min("cut").alias("agreed"))
    )


def spill_clips_to_files(
    clips: DataFrame,
    out_dir: str,
    data_col: str = "bytes",
    id_col: str = "clip_id",
) -> DataFrame:
    """clips -> manifest(clip_id, path, size): each clip's payload written
    to `out_dir/<sha256(clip_id)>.bin` so the ranged chunker can seek-read
    it. Sandbox adapter for plans/pipeline.py's max_cell_bytes routing: on
    a real deployment the oversized tail's bytes already live in object
    storage (the clips relation carries a pointer, not the payload) and
    this stage is a projection. `out_dir` shares the pipeline workdir's
    shared-filesystem assumption (every stage parquet already does): the
    range tasks that later seek-read these files run on other executors.
    Deterministic names -> idempotent rewrite on stage resume; one file
    write per oversized clip, distributed. Writes go to a per-attempt
    temp name and os.rename into place (atomic on POSIX): a task retry
    or a speculative duplicate racing a straggler can never leave a
    torn/interleaved payload for a later chunk_ranges task to seek-read
    -- readers only ever observe complete files (ADVICE r4)."""
    os.makedirs(out_dir, exist_ok=True)

    def gen(batches):
        for pdf in batches:
            ids, paths, sizes = [], [], []
            for cid, raw in zip(pdf[id_col], pdf[data_col]):
                if raw is None:
                    continue
                p = os.path.join(
                    out_dir, hashlib.sha256(str(cid).encode()).hexdigest() + ".bin")
                tmp = f"{p}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
                with open(tmp, "wb") as f:
                    f.write(bytes(raw))
                os.replace(tmp, p)
                ids.append(cid)
                paths.append(p)
                sizes.append(len(raw))
            yield pd.DataFrame({"clip_id": ids, "path": paths, "size": sizes})

    return clips.select(id_col, data_col).mapInPandas(
        gen, "clip_id string, path string, size long")


def stitch_candidates(
    cand: DataFrame,
    files: DataFrame,
    r: ResolvedOpts,
    range_bytes: int,
    on_stitch_failure: str = "fallback",
    digest: bool | str = True,
) -> tuple[DataFrame, DataFrame]:
    """(chunks, failed_files): the seam-agreement stitch over a candidate
    relation (chunk_ranges output, ideally MATERIALIZED -- the plan
    references it for seams, keep-windows, and failure detection; a parquet
    stage boundary avoids re-running the range UDF per reference).
    `failed_files` is the telemetry relation -- one (clip_id) row per file
    whose cold scans never resynchronized (in "fallback" mode those files'
    chunks in `chunks` come from a whole-buffer re-read; in "keep_markers"
    mode they surface as chunk_idx=-1 marker rows instead)."""
    if on_stitch_failure not in ("fallback", "keep_markers"):
        raise ValueError(f"unknown on_stitch_failure {on_stitch_failure!r}")
    seams = _agreed_seams(cand, r.max_size, range_bytes)

    # Per-range keep-window: [lo, hi) over chunk *start* offsets, where lo =
    # the seam agreed with the previous range (0 for the first) and hi = the
    # seam agreed with the next (EOF for the last). A missing seam leaves a
    # null bound -> the file failed to resync there.
    lo = seams.select(
        "clip_id", F.col("seam_id").alias("range_idx"), F.col("agreed").alias("_lo")
    )
    hi = seams.select(
        "clip_id", (F.col("seam_id") - 1).alias("range_idx"), F.col("agreed").alias("_hi")
    )
    bounded = (
        cand.join(lo, ["clip_id", "range_idx"], "left")
        .join(hi, ["clip_id", "range_idx"], "left")
        .withColumn("_lo", F.when(F.col("range_idx") == 0, F.lit(0)).otherwise(F.col("_lo")))
        .withColumn(
            "_hi",
            F.when(F.col("range_idx") == F.col("n_ranges") - 1, F.col("size") + 1)
            .otherwise(F.col("_hi")),
        )
    )
    failed = (
        bounded.filter(F.col("_lo").isNull() | F.col("_hi").isNull())
        .select("clip_id")
        .distinct()
    )
    kept = (
        bounded.join(failed, "clip_id", "left_anti")
        .filter((F.col("offset") >= F.col("_lo")) & (F.col("offset") < F.col("_hi")))
    )
    w = Window.partitionBy("clip_id").orderBy("offset")
    stitched = kept.select(
        "clip_id",
        F.lit(r.algorithm).alias("algo"),
        (F.row_number().over(w) - 1).cast("int").alias("chunk_idx"),
        "offset", "length", "chunk_hash",
    )

    if on_stitch_failure == "keep_markers":
        markers = failed.select(
            "clip_id",
            F.lit(r.algorithm).alias("algo"),
            F.lit(-1).cast("int").alias("chunk_idx"),
            F.lit(-1).cast("long").alias("offset"),
            F.lit(0).cast("int").alias("length"),
            F.lit(b"").alias("chunk_hash"),
        )
        return stitched.unionByName(markers), failed

    # Whole-file fallback: a single range covering the file is a cold scan
    # from the TRUE stream start, i.e. exact whole-buffer chunking (memory
    # bound = file size; resync failure is rare and content-pathological).
    whole = (
        files.join(failed, "clip_id", "left_semi")
        .select(
            "clip_id", "size", F.lit(1).alias("n_ranges"),
            F.lit(0).alias("range_idx"), F.lit(0).cast("long").alias("start"),
            F.col("size").alias("read_len"),
        )
    )
    rescued = chunk_ranges(whole, r, digest=digest).select(
        "clip_id",
        F.lit(r.algorithm).alias("algo"),
        F.col("range_idx").cast("int").alias("chunk_idx"),  # placeholder
        "offset", "length", "chunk_hash",
    ).withColumn("chunk_idx", (F.row_number().over(w) - 1).cast("int"))
    return stitched.unionByName(rescued), failed


def chunk_files_ranged(
    spark: SparkSession,
    files: DataFrame,
    algorithm: str,
    opts: ChunkerOpts | None = None,
    range_bytes: int = 32 << 20,
    overlap: int | None = None,
    on_stitch_failure: str = "fallback",
    digest: bool | str = True,
) -> DataFrame:
    """files(clip_id=path, size) -> the standard chunks relation
    (clip_id, algo, chunk_idx, offset, length, chunk_hash), byte-identical
    to whole-buffer chunking, with per-task memory bounded by
    range_bytes + overlap.

    overlap defaults to 8x MaxSize: the agreement window is
    overlap - MaxSize wide (~7 chunk lengths of resync slack; cold Gear
    scans resynchronize within 1-2 chunks on non-degenerate content).
    on_stitch_failure: "fallback" re-chunks non-resyncing files whole;
    "keep_markers" emits a (chunk_idx=-1) marker row per failed file for
    the caller to route. Callers that also want the failed-file telemetry
    relation (or that materialize the candidate stage, as
    plans/pipeline.py does) compose plan_ranges -> chunk_ranges ->
    stitch_candidates directly."""
    r = resolve(algorithm, opts)
    O = int(overlap) if overlap is not None else 8 * r.max_size
    R = int(range_bytes)
    if O < 2 * r.max_size:
        raise ValueError(f"overlap {O} must be >= 2*MaxSize ({2 * r.max_size})")
    if O > R:
        raise ValueError(f"overlap {O} must be <= range_bytes {R} (seam locality)")

    cand = chunk_ranges(plan_ranges(files, R, O), r, digest=digest)
    chunks, _failed = stitch_candidates(
        cand, files, r, R, on_stitch_failure=on_stitch_failure, digest=digest)
    return chunks
