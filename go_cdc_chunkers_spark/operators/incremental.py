"""Incremental dedup against an accumulated chunk store (bucketed layout).

The reference is single-run: every invocation re-chunks its inputs and the
digest index lives in process memory (cmd/cdc keeps per-run maps; nothing
persists between runs). A cluster engine ingesting forever can't do that --
at 10^12 clips the accumulated store is ~10^14 chunk rows, and re-shuffling
it for every daily batch join would cost more than the ingest itself.

This module keeps the store in Spark's bucketed-parquet layout instead:

  - `write_chunk_store` persists chunks bucketed by `chunk_hash`
    (`bucketBy` + `sortBy`). Bucketing IS a persisted shuffle: the
    hash-partitioning is done once, at write time, and recorded in the
    catalog.
  - every later batch-vs-store join then reads the store shuffle-free --
    the store-side FileScan reports `Bucketed: true` with NO Exchange above
    it, and only the new batch is shuffled into the matching bucketing.
    Probe SHUFFLE cost is therefore O(batch); the store contributes a
    shuffle-free scan. The scan itself remains O(store) -- that is the
    floor for exact dedup against full history, and it is the cheap part: a
    single-column columnar read with no network, no sort spill, no shuffle
    write amplification. Pinned by tests/test_incremental_store.py;
    measured bucketed-vs-plain in `python bench.py --store`.
  - for batches small enough to broadcast (`probe_store(...,
    broadcast_batch=True)`), the probe inverts: the batch's distinct hashes
    broadcast to the store scan, and the surviving store hashes -- bounded
    by the batch size -- broadcast back. The store is never shuffled or
    sorted at all; the only shuffles are two batch-sized distincts. The
    default SMJ path is the general one (a day's ingest at 10^12-clip
    scale is ~10^9 chunk rows, too big to broadcast).
  - `register_chunk_store` re-attaches an existing store directory to a
    fresh session's catalog (`CREATE TABLE ... CLUSTERED BY ... LOCATION`),
    so jobs restart without rewriting anything.

Skew: `chunk_hash` is a cryptographic digest, so bucket load is uniform by
construction (the one hot key class -- boilerplate chunks repeated across
many clips, e.g. silence -- inflates a bucket's row count but never a single
join key's match multiplicity, because probes are semi/anti joins on
presence, not inner joins producing pairs). The near-dup band store DOES
produce pairs, so it persists a band document-frequency relation alongside
and drops stop-bands before the join -- same control as
audio_fp.prune_common_hashes.

Oracle: driver query `incremental_store_dedup` (entry_queries.py) checks the
per-clip dup/novel accounting against DuckDB over the same materialized
chunk relation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64  # sandbox-sized; ~4-8 MB target bucket files. At the
# 10^14-row scale SCALE.md sizes, this is O(10^5) buckets (store_TB / 0.5 GB).

_META_FILE = "_store_meta.json"
_BAND_DF_DIR = "_band_df"  # compaction-maintained band document frequencies


def _canon_cols(df: DataFrame) -> list[list[str]]:
    """Order- and nullability-insensitive column contract: parquet resolves
    columns by name across files, and nullability drifts through aggregates
    (e.g. first_occurrence loses a literal's NOT NULL) without affecting
    the data."""
    return sorted([f.name.lower(), f.dataType.simpleString()]
                  for f in df.schema.fields)


def _store_meta_of(df: DataFrame, bucket_cols: list[str], n_buckets: int) -> dict:
    return {
        "bucket_cols": bucket_cols,
        "n_buckets": int(n_buckets),
        "schema_ddl": df._jdf.schema().toDDL(),
        "columns": _canon_cols(df),
    }


def _bucketed_write(df: DataFrame, table: str, path: str,
                    bucket_cols: list[str], n_buckets: int, mode: str) -> None:
    """Bucketed external-table write with a self-describing contract: the
    bucketing (cols, count, schema) is persisted in _store_meta.json beside
    the data, so re-attachment can never declare a different bucketing than
    the files were written with (Spark trusts the DDL -- a mismatch would
    silently mis-bucket every join), and appends with a drifted
    bucketing/schema fail fast instead of corrupting the layout."""
    meta = _store_meta_of(df, bucket_cols, n_buckets)
    mp = os.path.join(path, _META_FILE)
    appending = mode == "append"
    if appending and not os.path.exists(mp):
        # proceeding would skip drift validation AND stamp the directory
        # with a meta describing only this batch's layout
        raise FileNotFoundError(
            f"append to {path}: no {_META_FILE} -- not a store written by "
            "this module (or its metadata was lost); re-init with "
            "mode='overwrite' after verifying the directory")
    if appending:
        old = json.load(open(mp))
        drift = {k: (old.get(k), meta[k])
                 for k in ("bucket_cols", "n_buckets", "columns")
                 if old.get(k) != meta[k]}
        if drift:
            raise ValueError(
                f"append bucketing/schema mismatch at {path}: {drift}")
    (
        df.write.bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .mode(mode)
        .format("parquet")
        .option("path", path)
        .saveAsTable(table)
    )
    if not appending:  # keep the original write's DDL; overwrite clears path
        with open(mp, "w") as f:
            json.dump(meta, f)
    elif os.path.isdir(os.path.join(path, _BAND_DF_DIR)):
        # an append changes the store's band frequencies: a stale df
        # sidecar would under-count (and under-prune) until the next
        # compaction regenerates it -- drop it rather than serve it wrong
        import shutil as _shutil

        _shutil.rmtree(os.path.join(path, _BAND_DF_DIR))


def read_store_meta(path: str) -> dict:
    mp = os.path.join(path, _META_FILE)
    if not os.path.exists(mp):
        raise FileNotFoundError(
            f"no {_META_FILE} at {path}: not a store written by "
            "write_chunk_store/write_band_store")
    return json.load(open(mp))


def write_chunk_store(
    chunks: DataFrame,
    table: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Persist a chunks relation (clip_id, chunk_hash, length, ...) as a
    bucketed external table at `path`. `mode="append"` adds a batch to an
    existing store (bucket files accumulate; compaction is a rewrite with
    the same bucketing). The bucketing contract lands in _store_meta.json
    beside the data (appends with a different bucketing/schema fail)."""
    _bucketed_write(chunks, table, path, ["chunk_hash"], n_buckets, mode)


def register_chunk_store(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Attach an existing bucketed store directory to this session's catalog
    (fresh sessions have an empty in-memory/derby catalog; the data and its
    bucket-file naming survive on disk). The bucketing and schema come from
    the store's own _store_meta.json -- the attachment can never declare a
    layout the files weren't written with. Explicit `schema_ddl`/`n_buckets`
    are validated against the metadata (a mismatch raises rather than
    silently mis-bucketing every join)."""
    meta = read_store_meta(path)
    if n_buckets is not None and int(n_buckets) != meta["n_buckets"]:
        raise ValueError(
            f"n_buckets {n_buckets} != store's {meta['n_buckets']} at {path}")
    if schema_ddl is not None:
        # parse, don't string-split: types containing commas (DECIMAL(10,2),
        # STRUCT/ARRAY) would produce spurious mismatches under a naive
        # ','-split. Compared in the same order/nullability-insensitive
        # canonical form the store metadata records (_canon_cols).
        from pyspark.sql.types import StructType

        want = sorted([f.name.lower(), f.dataType.simpleString()]
                      for f in StructType.fromDDL(schema_ddl).fields)
        if want != meta["columns"]:
            raise ValueError(
                f"schema_ddl columns {want} != store's {meta['columns']} "
                f"at {path}")
    if spark.catalog.tableExists(table):
        # IF NOT EXISTS would silently keep the old registration -- a table
        # name reused for a different store would then serve the WRONG
        # store's data to every probe
        loc = next(
            (r.data_type for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
             if r.col_name == "Location"), "")
        want = "file:" + os.path.abspath(path)
        if loc.rstrip("/") not in (want.rstrip("/"), os.path.abspath(path)):
            raise ValueError(
                f"table {table!r} is already registered at {loc!r}, not "
                f"{path!r}; use a distinct table name per store")
        return spark.table(table)
    cols = ", ".join(meta["bucket_cols"])
    spark.sql(
        f"CREATE TABLE {table} ({meta['schema_ddl']}) "
        f"USING PARQUET CLUSTERED BY ({cols}) SORTED BY ({cols}) "
        f"INTO {meta['n_buckets']} BUCKETS LOCATION '{path}'"
    )
    return spark.table(table)


def probe_store(
    new_chunks: DataFrame, store: DataFrame, broadcast_batch: bool = False
) -> DataFrame:
    """new-batch chunk rows whose hash already exists in the store
    (left_semi: presence only -- store-side duplicate hashes never multiply
    probe rows, so a boilerplate chunk repeated 10^9 times in the store
    costs its bucket a scan, not a join blowup).

    broadcast_batch=True is the small-batch fast path (module doc): the
    batch's distinct hashes ride broadcast into the store scan and the
    matching store hashes (<= batch size by construction) ride broadcast
    back. The store is never shuffled OR sorted; the only shuffles are the
    two batch-sized distincts."""
    if broadcast_batch:
        probe = new_chunks.select("chunk_hash").distinct()
        hits = (
            store.join(F.broadcast(probe), "chunk_hash", "left_semi")
            .select("chunk_hash")
            .distinct()
        )
        return new_chunks.join(F.broadcast(hits), "chunk_hash", "left_semi")
    return new_chunks.join(
        store.select("chunk_hash"), "chunk_hash", "left_semi"
    )


def novel_chunks(new_chunks: DataFrame, store: DataFrame) -> DataFrame:
    """Chunk rows not yet in the store (left_anti mirror of probe_store):
    the write-elimination set -- at 10^12-clip scale the whole point of the
    store is that only these bytes are fetched/stored downstream."""
    return new_chunks.join(
        store.select("chunk_hash"), "chunk_hash", "left_anti"
    )


def exact_dedup_vs_store(
    new_chunks: DataFrame, store: DataFrame, broadcast_batch: bool = False
) -> DataFrame:
    """Per-new-clip dedup accounting against the store:
    (clip_id, n_chunks, total_bytes, dup_chunks, dup_bytes, fully_dup).
    All integer/boolean -- bit-stable across engines. Every shuffle in this
    plan is keyed on the NEW batch (chunk_hash probe, clip_id aggregates);
    the store contributes only its bucketed scan. broadcast_batch selects
    probe_store's inverted small-batch plan."""
    dup = (
        probe_store(new_chunks, store, broadcast_batch=broadcast_batch)
        .groupBy("clip_id")
        .agg(
            F.count("*").cast("long").alias("_dup_chunks"),
            F.sum("length").cast("long").alias("_dup_bytes"),
        )
    )
    tot = new_chunks.groupBy("clip_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("length").cast("long").alias("total_bytes"),
    )
    return tot.join(dup, "clip_id", "left").select(
        "clip_id",
        "n_chunks",
        "total_bytes",
        F.coalesce("_dup_chunks", F.lit(0)).cast("long").alias("dup_chunks"),
        F.coalesce("_dup_bytes", F.lit(0)).cast("long").alias("dup_bytes"),
        (F.coalesce("_dup_chunks", F.lit(0)) == F.col("n_chunks")).alias("fully_dup"),
    )


def first_occurrence(chunks: DataFrame) -> DataFrame:
    """One deterministic row per distinct hash: min_by (clip_id, chunk_idx).
    The store-growth canonicalization (same rows on every re-run)."""
    picked = chunks.groupBy("chunk_hash").agg(
        F.min_by(
            F.struct(*[c for c in chunks.columns if c != "chunk_hash"]),
            F.struct("clip_id", "chunk_idx"),
        ).alias("_r")
    )
    return picked.select("chunk_hash", "_r.*").select(*chunks.columns)


def append_novel(
    spark: SparkSession,
    new_chunks: DataFrame,
    table: str,
    path: str,
    n_buckets: int | None = None,
) -> None:
    """Grow the store by this batch's novel content: one first_occurrence
    row per previously-unseen hash. Replay-idempotent at the hash level: a
    committed batch's hashes are all present, so its replay's anti-join is
    empty; a batch that failed before commit left nothing visible and
    replays whole. n_buckets defaults to the store's own metadata."""
    if n_buckets is None:
        n_buckets = read_store_meta(path)["n_buckets"]
    store = spark.table(table)
    first = first_occurrence(novel_chunks(new_chunks, store))
    write_chunk_store(first, table, path, n_buckets=n_buckets, mode="append")
    # sketch sidecar maintenance is idempotent (register MAX / set-union
    # merges), so a replayed batch cannot skew the estimates; stores
    # without a sidecar (legacy / band) are left untouched
    merge_store_sketch(spark, new_chunks, path)


def compact_store(
    spark: SparkSession,
    table: str,
    path: str,
    n_buckets: int | None = None,
    dedupe: bool = True,
) -> dict:
    """Rewrite the store's accumulated bucket files (every append adds one
    file per bucket it touches; probe-side merge cost grows with file
    count) into a fresh single-pass layout, optionally re-bucketing
    (n_buckets) and canonicalizing duplicate hashes (dedupe -> one
    first_occurrence row per hash; only the initial batch can carry
    within-clip hash repeats, appends are pre-deduped).

    Locally the swap is write-to-sibling + directory rename with a brief
    window where the table is re-registered; on a real cluster this is an
    Iceberg rewrite-data-files action -- same rewrite, atomic pointer
    swap. Returns {"rows", "files_before", "files_after"}."""
    import shutil

    meta = read_store_meta(path)
    nb = int(n_buckets) if n_buckets is not None else meta["n_buckets"]

    def _nfiles(p: str) -> int:
        return sum(1 for f in os.listdir(p) if f.endswith(".parquet"))

    files_before = _nfiles(path)
    df = spark.table(table)
    if dedupe:
        # first_occurrence is chunk-store-shaped (keys on chunk_hash); a
        # band store deduplicates to distinct rows instead
        if meta["bucket_cols"] == ["chunk_hash"]:
            df = first_occurrence(df)
        else:
            df = df.distinct()
    tmp = path.rstrip("/") + ".compacting"
    tmp_table = table + "_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    _bucketed_write(df, tmp_table, tmp, meta["bucket_cols"], nb, "overwrite")
    rows = spark.table(tmp_table).count()  # materialized BEFORE the swap
    if meta["bucket_cols"] == ["band_hash"]:
        # band-store df maintenance: persist the (band_id, band_hash) ->
        # distinct-clip frequency relation beside the compacted data, so
        # probes prune stop-bands from a tiny scan instead of re-running
        # the store-wide aggregate per probe (near_dup_candidates_vs_store
        # store_df arg / read_band_df). Written inside the tmp dir -> swaps
        # atomically with the data it describes. The groupBy is keyed on
        # the bucketing column, so it reuses the fresh write's partitioning.
        (
            spark.table(tmp_table)
            .groupBy("band_id", "band_hash")
            .agg(F.count_distinct("clip_id").cast("long").alias("df"))
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, _BAND_DF_DIR))
        )

    if (meta["bucket_cols"] == ["chunk_hash"]
            and os.path.isdir(os.path.join(path, _SKETCH_DIR))):
        # exact sketch rebuild from the compacted relation, written inside
        # the tmp dir so it swaps atomically with the data it describes
        # (the sidecar-preserve loop below copies files only -- a stale
        # _sketch DIRECTORY would otherwise be lost with the old tree).
        # A _sketch dir whose meta.json is gone (partial copy, manual
        # surgery) is unreadable anyway: rebuild at the default k rather
        # than crashing mid-compaction on None["k"].
        sk_meta = read_store_sketch_meta(path)
        k = int(sk_meta["k"]) if sk_meta else DEFAULT_SKETCH_K
        _write_sketch_dirs(spark.table(tmp_table),
                           os.path.join(tmp, _SKETCH_DIR), k)

    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    # preserve sidecar files other layers keep beside the store (e.g. the
    # CLI's _chunking.json) -- the rewrite owns only parquet + its own
    # meta. Dotfiles are Hadoop bookkeeping for the OLD files (stale
    # .part-*.parquet.crc checksums would shadow nothing but confuse
    # audits), never an intentional sidecar: skipped.
    for fn in os.listdir(old):
        src, dst = os.path.join(old, fn), os.path.join(path, fn)
        if (os.path.isfile(src) and not fn.startswith(".")
                and not fn.endswith(".parquet") and not os.path.exists(dst)):
            shutil.copy2(src, dst)
    shutil.rmtree(old)
    register_chunk_store(spark, table, path)
    return {"rows": int(rows), "files_before": files_before,
            "files_after": _nfiles(path)}


# ---------------------------------------------------------------------------
# Sketch sidecar: HLL registers + bottom-k of the store's chunk-hash set,
# maintained mergeably so "how big is this store / how much would this
# batch dedup" is answerable WITHOUT scanning the store (operators/
# sketches.py documents the estimators). init/compact build it exactly;
# append folds each batch in (MAX / set-union merges -- idempotent under
# replay); estimate_vs_store reads sidecar + batch only.
# ---------------------------------------------------------------------------

_SKETCH_DIR = "_sketch"
# bottom-k size. The batch-in-store containment estimate effectively
# samples ~ k * |batch| / |store| points (the union bottom-k is
# dominated by the bigger side), so k must absorb the store/batch
# asymmetry: at k=65536 a 400k-unique batch probing a 64M-unique store
# still gets ~400 sample points (sigma ~ 2.5%). Sidecar cost is ~2 MB
# of parquet -- nothing next to the store it describes.
DEFAULT_SKETCH_K = 65536


def _write_sketch_dirs(chunks: DataFrame, sketch_dir: str, k: int) -> None:
    """Write registers/ + bottomk/ + meta.json under sketch_dir (callers
    own atomicity: build into a tmp dir, then _swap_sketch)."""
    from .sketches import bottom_k, hll_registers

    hll_registers(chunks, "chunk_hash").write.mode("overwrite").parquet(
        os.path.join(sketch_dir, "registers"))
    bottom_k(chunks, "chunk_hash", k, hash_mode="xxhash64").write.mode(
        "overwrite").parquet(os.path.join(sketch_dir, "bottomk"))
    tmp = os.path.join(sketch_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"k": int(k), "hash_mode": "xxhash64"}, f)
    os.rename(tmp, os.path.join(sketch_dir, "meta.json"))


def _swap_sketch(path: str, new_dir: str) -> None:
    import shutil

    final = os.path.join(path, _SKETCH_DIR)
    old = final + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(final):
        os.rename(final, old)
    os.rename(new_dir, final)
    shutil.rmtree(old, ignore_errors=True)


def read_store_sketch_meta(path: str) -> dict | None:
    p = os.path.join(path, _SKETCH_DIR, "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_store_sketch(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, int] | None:
    """(registers, bottomk, k) from the sidecar, or None if absent."""
    meta = read_store_sketch_meta(path)
    if meta is None:
        return None
    d = os.path.join(path, _SKETCH_DIR)
    return (spark.read.parquet(os.path.join(d, "registers")),
            spark.read.parquet(os.path.join(d, "bottomk")), meta["k"])


def write_store_sketch(spark: SparkSession, chunks: DataFrame, path: str,
                       k: int = DEFAULT_SKETCH_K) -> None:
    """Build the sidecar exactly from a chunk relation (init, compaction,
    or a one-time backfill on a legacy store). Atomic dir swap."""
    import shutil

    tmp = os.path.join(path, _SKETCH_DIR + ".building")
    shutil.rmtree(tmp, ignore_errors=True)
    _write_sketch_dirs(chunks, tmp, k)
    _swap_sketch(path, tmp)


def merge_store_sketch(spark: SparkSession, batch_chunks: DataFrame,
                       path: str) -> bool:
    """Fold a batch's sketch into the sidecar (append path). Both merges
    are idempotent -- registers by elementwise MAX, bottom-k by
    set-union + re-limit -- so replayed batches leave the sidecar
    unchanged. Returns False (no-op) when the store has no sidecar."""
    import shutil

    from .sketches import bottom_k, hll_merge, hll_registers

    cur = read_store_sketch(spark, path)
    if cur is None:
        return False
    reg, bk, k = cur
    merged_reg = hll_merge(reg, hll_registers(batch_chunks, "chunk_hash"))
    merged_bk = (bk.unionByName(
        bottom_k(batch_chunks, "chunk_hash", k, hash_mode="xxhash64"))
        .distinct().orderBy("h").limit(k))
    tmp = os.path.join(path, _SKETCH_DIR + ".merging")
    shutil.rmtree(tmp, ignore_errors=True)
    # materialize BEFORE the swap -- both inputs read the current sidecar
    merged_reg.write.mode("overwrite").parquet(
        os.path.join(tmp, "registers"))
    merged_bk.write.mode("overwrite").parquet(os.path.join(tmp, "bottomk"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"k": int(k), "hash_mode": "xxhash64"}, f)
    _swap_sketch(path, tmp)
    return True


def estimate_vs_store(spark: SparkSession, batch_chunks: DataFrame,
                      path: str) -> dict:
    """Dedup-planning estimates from the sidecar + the batch ONLY (the
    store's bucketed data is never read): the store's unique-chunk count
    (HLL), the batch's exact uniques (batch-sized, cheap), the estimated
    fraction of the batch's uniques already in the store (bottom-k
    containment, with its sample size and a sigma-derived error bar),
    and the novel uniques an append would add -- batch_exact * (1 -
    containment), whose error scales with the BATCH, not with the store
    (the HLL union-minus-store difference is also reported, but
    subtracting two store-sized estimates drowns a small batch in the
    registers' ~1.6% noise). Raises if the sidecar is absent -- callers
    decide whether a one-time write_store_sketch backfill is
    acceptable."""
    from .sketches import (bottom_k, hll_estimate, hll_merge,
                           hll_registers, overlap_estimate)

    cur = read_store_sketch(spark, path)
    if cur is None:
        raise FileNotFoundError(
            f"no sketch sidecar under {path}; build one with "
            "write_store_sketch (one store scan) first")
    reg, bk, k = cur
    batch_reg = hll_registers(batch_chunks, "chunk_hash")
    store_est = hll_estimate(reg).first()
    union_est = hll_estimate(hll_merge(reg, batch_reg)).first()
    n_batch = batch_chunks.select("chunk_hash").distinct().count()
    ov = overlap_estimate(
        bk, bottom_k(batch_chunks, "chunk_hash", k, hash_mode="xxhash64"),
        k).first()
    # novel uniques from the BATCH side: the batch's exact unique count
    # times (1 - containment). The HLL difference (union - store) is
    # reported too but is the wrong estimator when batch << store: it
    # subtracts two large estimates whose ~1.6% sigma swamps a small
    # batch. The containment route's error scales with the batch itself.
    m = int(ov["n_b"])  # containment sample size (batch points in the
    #                     union bottom-k); sigma ~ sqrt(c(1-c)/m)
    if m > 0:
        c = float(ov["containment_b_in_a"])
        sigma_c = (c * (1.0 - c) / m) ** 0.5
        novel = round(n_batch * (1.0 - c), 2)
    else:
        # batch << store at this k: no batch hash entered the union
        # bottom-k, so the containment ratio is NULL (0/0). Fall back to
        # the HLL-difference estimator (clamped to the batch size) with
        # an uninformative error bar instead of crashing on float(None).
        c = None
        sigma_c = 1.0
        novel = round(min(float(n_batch), max(
            0.0, union_est["estimate"] - store_est["estimate"])), 2)
    return {
        "sketch_k": int(k),
        "store_unique_est": store_est["estimate"],
        "batch_unique_exact": int(n_batch),
        "union_unique_est": union_est["estimate"],
        "novel_unique_est": novel,
        "novel_unique_est_hll": max(0.0, round(
            union_est["estimate"] - store_est["estimate"], 2)),
        "novel_unique_sigma": round(n_batch * sigma_c, 2),
        "containment_batch_in_store_est": c,
        "containment_sample_size": m,
        "jaccard_est": ov["jaccard_est"],
    }


# ---------------------------------------------------------------------------
# Near-dup band store: LSH bands persisted bucketed on the band key, plus a
# document-frequency side relation for stop-band pruning (the skew control).
# ---------------------------------------------------------------------------

def write_band_store(
    bands: DataFrame,
    table: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Persist lsh_bands() output (clip_id, band_id, band_hash) bucketed by
    band_hash. The df side-relation is MAINTAINED BY COMPACTION:
    compact_store writes it to the _band_df sidecar (read_band_df), appends
    invalidate it, and probes pass it as near_dup_candidates_vs_store's
    store_df so no store-wide aggregate runs per probe. An uncompacted
    store falls back to recomputing frequencies from its (bucketed,
    exchange-free) scan."""
    _bucketed_write(bands, table, path, ["band_hash"], n_buckets, mode)


def read_band_df(spark: SparkSession, path: str) -> DataFrame | None:
    """The compaction-persisted band document-frequency relation
    (band_id, band_hash, df) of a band store, or None if the store has not
    been compacted since its last append (compact_store writes it;
    appends invalidate it). Pass it to near_dup_candidates_vs_store's
    store_df so probes never re-aggregate the store."""
    p = os.path.join(path, _BAND_DF_DIR)
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        return None
    return spark.read.parquet(p)


def near_dup_candidates_vs_store(
    new_bands: DataFrame,
    store_bands: DataFrame,
    max_df: int = 64,
    store_df: DataFrame | None = None,
) -> DataFrame:
    """(new_clip, store_clip) candidate pairs: equi-join on (band_id,
    band_hash) after dropping stop-bands (bands matching > max_df store
    clips -- boilerplate: silence, constant tones). The stop-band relation
    is tiny (only over-threshold keys) and broadcast into an anti-join, so
    neither side shuffles for the prune.

    store_df: the persisted frequency relation (read_band_df) -- the
    production path: stop-bands come from a tiny sidecar scan maintained
    by compact_store, with NO store-wide aggregate in the probe plan.
    Without it the probe recomputes frequencies from the store scan -- a
    map-side-combinable groupBy keyed on the bucketing column (no
    Exchange), acceptable per-probe only while the store is small."""
    key = ["band_id", "band_hash"]
    freq_src = (
        store_df.select(*key, F.col("df").alias("_df"))
        if store_df is not None
        else store_bands.groupBy(*key).agg(
            F.count_distinct("clip_id").alias("_df"))
    )
    hot = freq_src.filter(F.col("_df") > max_df).select(*key)
    s = store_bands.join(F.broadcast(hot), key, "left_anti").select(
        *key, F.col("clip_id").alias("store_clip")
    )
    n = new_bands.join(F.broadcast(hot), key, "left_anti").select(
        *key, F.col("clip_id").alias("new_clip")
    )
    return (
        n.join(s, key)
        .filter(F.col("new_clip") != F.col("store_clip"))
        .select("new_clip", "store_clip")
        .distinct()
    )
