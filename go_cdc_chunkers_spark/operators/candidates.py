"""P7-P9: LSH candidate generation (skew-handled), pair verification,
suffix-array containment.

Skew strategy (P7). An LSH bucket of size m yields m(m-1)/2 pairs; a
pathological bucket (constant-PCM clips -- the audio analogue of UltraCDC's
low-entropy LEST path) makes that quadratic. Handling, in order:
  1. explicit repartition on (band_id, band_hash) ahead of the self-join, so
     bucket work is spread and AQE's skew-join splitting has clean keys;
  2. buckets with size <= pair_cap join pairwise (the normal path);
  3. buckets larger than pair_cap take one of two hot-bucket modes:
     - skew_mode="star" (default): every member is connected to the
       bucket's minimum clip_id. Linear in bucket size and preserves
       exactly the same connected components downstream (any clustering
       over candidate edges only needs connectivity, not the full clique).
       Verification of star edges is identical -- members of a giant
       identical-signature bucket are mutual near-dups by construction.
     - skew_mode="salted": the EXACT pair set, with the quadratic work
       salted across tasks. Each hot-bucket member gets a deterministic
       salt group g = xxhash64(clip_id) % G where G = ceil(m /
       salt_target); the left side keeps its own group, the right side is
       replicated to every group, and the join runs on (band key, group).
       An unordered pair {x, y} survives exactly once: when left = the
       lower-group member (or, within one group, the smaller clip_id). A
       single m-member bucket becomes G join keys of ~salt_target left
       rows each, so per-task pair output is bounded by ~salt_target * m
       (linear in m) instead of m^2 on one task; the price is the G * m
       replicated right rows (~m^2 / salt_target narrow shuffle rows).
       Use it when downstream needs every pair (per-pair scoring /
       reporting), not just connectivity.

Dedup of (a,b) across bands/sources happens once here (a < b normalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def candidate_pairs(
    bands: DataFrame,
    pair_cap: int = 64,
    shuffle_partitions: int | None = None,
    skew_mode: str = "star",
    salt_target: int | None = None,
) -> DataFrame:
    """bands(band_id, band_hash, clip_id, src) -> candidates(a, b, srcs).

    a < b; deduped across bands. Buckets larger than pair_cap produce star
    edges (skew_mode="star", the connectivity-preserving linear default) or
    the exact pair set salted across salt groups of ~salt_target members
    (skew_mode="salted"; default salt_target = pair_cap). See the module
    docstring for the trade."""
    if skew_mode not in ("star", "salted"):
        raise ValueError(f"skew_mode must be 'star' or 'salted', got {skew_mode!r}")
    key = ["band_id", "band_hash"]
    b = bands
    if shuffle_partitions:
        b = b.repartition(shuffle_partitions, *key)
    # One window pass computes everything the bucket routing needs: size,
    # hub (min clip_id) and hub src. All three share the same partition
    # spec, so Catalyst plans a single WindowExec over one Exchange -- the
    # previous shape re-derived the hub with a groupBy + join back, paying
    # an extra shuffle and join for values the window already had in hand.
    w = Window.partitionBy(*key)
    sized = b.select(
        *key, "clip_id", "src",
        F.count("*").over(w).alias("_bucket_n"),
        F.min("clip_id").over(w).alias("_hub"),
        F.min("src").over(w).alias("_hub_src"),
    )
    small = sized.filter(F.col("_bucket_n") <= pair_cap)

    left = small.select(*key, F.col("clip_id").alias("a"), "src")
    right = small.select(*key, F.col("clip_id").alias("b"))
    pairs_small = (
        left.join(right, key)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "src")
    )

    big = sized.filter(F.col("_bucket_n") > pair_cap)
    if skew_mode == "star":
        # Star edges for hot buckets: linear, same connectivity. The hub is
        # min clip_id / min src over the bucket (min, not first: first() is
        # nondeterministic under shuffle and would break the byte-identical
        # resume contract on mixed-src hot buckets) -- already computed by
        # the shared window above, so this branch is a pure projection.
        pairs_big = (
            big.filter(F.col("clip_id") != F.col("_hub"))
            .select(F.col("_hub").alias("a"), F.col("clip_id").alias("b"),
                    F.col("_hub_src").alias("src"))
        )
    else:
        # Salted exact pairs: G = ceil(m / salt_target) groups per bucket;
        # both sides derive G from their own window count, so they agree.
        st = salt_target or pair_cap
        grouped = big.withColumn(
            "_ng",
            F.greatest(F.lit(1), F.ceil(F.col("_bucket_n") / st)).cast("int"),
        ).withColumn(
            "_g", F.pmod(F.xxhash64("clip_id"), F.col("_ng")).cast("int")
        )
        salt_left = grouped.select(
            *key, F.col("_g").alias("_sg"), F.col("clip_id").alias("a"), "src"
        )
        salt_right = grouped.select(
            *key,
            # replicate b only to groups <= its own: the survivor filter
            # requires _gb >= _sg, so copies sent above _gb would be
            # shuffled and then dropped -- this halves the replicated
            # shuffle volume (~m^2/(2*st) rows) with the identical pair
            # set (each cross-group pair still meets exactly once, in the
            # lower group)
            F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("_sg"),
            F.col("_g").alias("_gb"),
            F.col("clip_id").alias("b"),
        )
        pairs_big = (
            salt_left.join(salt_right, key + ["_sg"])
            .filter(
                (F.col("_gb") > F.col("_sg"))
                | ((F.col("_gb") == F.col("_sg")) & (F.col("b") > F.col("a")))
            )
            # cross-group emission picks the pair's lower-GROUP member as
            # the left side, so normalize to the a < b contract here
            .select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
                "src",
            )
        )

    return (
        pairs_small.unionByName(pairs_big)
        .groupBy("a", "b")
        .agg(F.array_sort(F.collect_set("src")).alias("srcs"))
    )


def verify_pairs(
    cands: DataFrame,
    signatures: DataFrame,
    simhashes: DataFrame | None = None,
    k: int = 128,
    jaccard_threshold: float = 0.5,
    hamming_threshold: int = 8,
) -> DataFrame:
    """P8: verified(a, b, jaccard_est, simhash_ham, is_dup).

    jaccard_est = fraction of equal MinHash positions (columnar zip_with,
    the estimator of the MinHash paper); simhash_ham = bit_count(xor).
    A pair passes if either evidence channel passes its threshold."""
    sa = signatures.select(
        F.col("clip_id").alias("a"), F.col("minhash").alias("_sig_a")
    )
    sb = signatures.select(
        F.col("clip_id").alias("b"), F.col("minhash").alias("_sig_b")
    )
    out = (
        cands.join(sa, "a", "left")
        .join(sb, "b", "left")
        .withColumn(
            "jaccard_est",
            F.when(
                F.col("_sig_a").isNotNull() & F.col("_sig_b").isNotNull(),
                F.size(
                    F.filter(
                        F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y),
                        lambda v: v,
                    )
                )
                / F.lit(k),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_sig_a", "_sig_b")
    )
    if simhashes is not None:
        ha = simhashes.select(F.col("clip_id").alias("a"), F.col("simhash").alias("_ha"))
        hb = simhashes.select(F.col("clip_id").alias("b"), F.col("simhash").alias("_hb"))
        out = (
            out.join(ha, "a", "left")
            .join(hb, "b", "left")
            .withColumn(
                "simhash_ham",
                F.when(
                    F.col("_ha").isNotNull() & F.col("_hb").isNotNull(),
                    F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))),
                ).otherwise(F.lit(64)),
            )
            .drop("_ha", "_hb")
        )
    else:
        out = out.withColumn("simhash_ham", F.lit(64))
    return out.withColumn(
        "is_dup",
        (F.col("jaccard_est") >= jaccard_threshold)
        | (F.col("simhash_ham") <= hamming_threshold),
    )


def _pair_jaccard(cands: DataFrame, signatures: DataFrame, k: int, out_col: str) -> DataFrame:
    sa = signatures.select(F.col("clip_id").alias("a"), F.col("minhash").alias("_sa"))
    sb = signatures.select(F.col("clip_id").alias("b"), F.col("minhash").alias("_sb"))
    return (
        cands.join(sa, "a", "left")
        .join(sb, "b", "left")
        .withColumn(
            out_col,
            F.when(
                F.col("_sa").isNotNull() & F.col("_sb").isNotNull(),
                F.size(
                    F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v)
                )
                / F.lit(k),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_sa", "_sb")
    )


def verify_pairs_dual(
    cands: DataFrame,
    sig_pcm: DataFrame,
    sig_text: DataFrame,
    simhashes: DataFrame,
    k: int = 128,
    jaccard_threshold: float = 0.35,
    hamming_threshold: int = 16,
) -> DataFrame:
    """P8 with both evidence channels scored independently:
    verified(a, b, srcs, jaccard_pcm, jaccard_text, simhash_ham, is_dup).

    jaccard_pcm estimates byte-level (CDC chunk set) similarity -- the
    resync/dedup identity channel; jaccard_text + simhash_ham cover
    transcript fuzziness. A pair is a duplicate if any channel passes."""
    out = _pair_jaccard(cands, sig_pcm, k, "jaccard_pcm")
    out = _pair_jaccard(out, sig_text, k, "jaccard_text")
    ha = simhashes.select(F.col("clip_id").alias("a"), F.col("simhash").alias("_ha"))
    hb = simhashes.select(F.col("clip_id").alias("b"), F.col("simhash").alias("_hb"))
    out = (
        out.join(ha, "a", "left")
        .join(hb, "b", "left")
        .withColumn(
            "simhash_ham",
            F.when(
                F.col("_ha").isNotNull() & F.col("_hb").isNotNull(),
                F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))),
            )
            .otherwise(F.lit(64))
            .cast("int"),
        )
        .drop("_ha", "_hb")
    )
    return out.withColumn(
        "is_dup",
        (F.col("jaccard_pcm") >= jaccard_threshold)
        | (F.col("jaccard_text") >= jaccard_threshold)
        | (F.col("simhash_ham") <= hamming_threshold),
    )


# ---------------------------------------------------------------------------
# P9: suffix-array containment (the only Python stage; runs on the small
# verified-candidate set only)
# ---------------------------------------------------------------------------

def _suffix_array(s: str):
    """O(n log^2 n) doubling suffix array (numpy ranks + argsort)."""
    import numpy as np

    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.array([ord(c) for c in s], dtype=np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        key2 = np.where(np.arange(n) + k < n, np.roll(rank, -k), -1)
        order = np.lexsort((key2, rank))
        neq = (rank[order[1:]] != rank[order[:-1]]) | (
            key2[order[1:]] != key2[order[:-1]]
        )
        tmp = np.empty(n, dtype=np.int64)
        tmp[order] = np.concatenate([[0], np.cumsum(neq)])
        rank = tmp
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def _sa_contains(haystack: str, needle: str, sa=None) -> bool:
    """Substring search by binary search over the suffix array.

    Each probe compares a length-bounded slice (sa[mid] .. sa[mid]+|needle|),
    never the full suffix, so one probe costs O(|needle|) and a lookup is
    O(|needle| log |haystack|). Pass a precomputed `sa` to amortize
    construction across the pairs that share a document."""
    if not needle:
        return True
    if sa is None:
        sa = _suffix_array(haystack)
    m = len(needle)
    lo, hi = 0, len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        p = sa[mid]
        if haystack[p : p + m] < needle:
            lo = mid + 1
        else:
            hi = mid
    if lo >= len(sa):
        return False
    p = sa[lo]
    return haystack[p : p + m] == needle


def containment_pass(
    verified: DataFrame,
    clips: DataFrame,
    text_col: str = "transcript",
    n_pairs: int | None = None,
) -> DataFrame:
    """P9: exact transcript containment for verified pairs, via a suffix
    array built per pair inside a grouped pandas UDF (mapInPandas). Only the
    already-verified candidate set flows through Python -- by then the data
    is tiny relative to the corpus.

    `n_pairs`: exact row count of `verified` when the caller already knows
    it (the pipeline reads it from the verified stage's parquet footers --
    no extra job). Sizes the explicit repartition to the actual work
    instead of a fixed shuffle.partitions width: a small verified set stops
    paying shuffle.partitions near-empty Python tasks of pure scheduler
    latency, while large sets keep the full width."""
    import pandas as pd

    t = clips.select(F.col("clip_id"), F.col(text_col).alias("_t"))
    joined = (
        verified.join(t.withColumnRenamed("clip_id", "a").withColumnRenamed("_t", "_ta"), "a")
        .join(t.withColumnRenamed("clip_id", "b").withColumnRenamed("_t", "_tb"), "b")
    )
    # Pin this stage's parallelism: AQE's post-shuffle coalescing merges
    # partitions by BYTES, but the per-row cost here is Python suffix-array
    # work, so byte-balanced partitions are CPU-imbalanced. Measured at
    # local[2]/18k clips: AQE coalesced the 233k pairs to 2 partitions
    # split 175k/58k -- one core idled while the stage ran 6x slower than
    # local[8]. Explicit (n, keys) hash repartitioning is exempt from AQE
    # coalescing; hashing on the distinct pair key balances rows.
    n_parts = int(joined.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if n_pairs is not None:
        # Scale-adaptive width (still explicit, still AQE-exempt): target
        # ~512 pairs per task -- small enough that one task of the
        # worst-case long-document SA work stays subsecond-scale, large
        # enough that a tiny verified set (hundreds of pairs) runs as ONE
        # task instead of shuffle.partitions empty ones. Clamped to the
        # configured width so big corpora keep exactly today's behavior
        # (233k pairs -> ceil/512 = 456 -> clamped back to n_parts).
        n_parts = max(1, min(n_parts, -(-int(n_pairs) // 512)))
    joined = joined.repartition(n_parts, "a", "b")

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in verified.schema.fields
    ) + ", containment boolean"

    cols = [f.name for f in verified.schema.fields]

    def _contains(hay: str, needle: str, sa_cache: dict) -> bool:
        # Hybrid: below the cutover, CPython's C substring scan beats
        # building a Python/numpy suffix array outright (transcripts are
        # tens of chars; measured ~4x on the containment stage). The SA
        # pays for itself on LONG documents, where O(n log^2 n) build +
        # O(m log n) probes amortized across a hub's many pairs wins over
        # repeated O(n m) scans; its correctness stays pinned by
        # test_sa_contains_matches_in either way.
        if len(hay) < 4096:
            return needle in hay
        got = sa_cache.get(hay)
        if got is None:
            got = sa_cache[hay] = _suffix_array(hay)
        return _sa_contains(hay, needle, got)

    def _check(batches):
        for pdf in batches:
            # One suffix array per distinct long document per Arrow batch:
            # docs recur across pairs (a hub transcript appears in many
            # verified pairs), so cache by the string object.
            sa_cache: dict[str, object] = {}
            cont = [
                _contains(ta, tb, sa_cache) or _contains(tb, ta, sa_cache)
                for ta, tb in zip(pdf["_ta"], pdf["_tb"])
            ]
            out = pdf[cols].copy()
            out["containment"] = pd.Series(cont, index=pdf.index)
            yield out

    return joined.mapInPandas(_check, schema=schema)
