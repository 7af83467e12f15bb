"""Training-data dedup suite over a documents table.

Five dedup families, each a DataFrame -> DataFrame function:
  - exact_dedup: hash-groupBy on content (md5) -- one shuffle, map-side
    partial agg; the canonical web-scale first pass.
  - ngram_jaccard_pairs: exact n-gram-shingle Jaccard for all colliding
    pairs -- the small-scale oracle; quadratic within shingle buckets.
  - minhash_lsh_pairs: MinHash (min over a seeded md5 family, so the exact
    same signature is expressible in ANSI SQL for the oracle) + banded LSH
    candidate join + signature-estimate verification: the 100 TB path.
    The production variant uses xxhash64 (operators/signatures.py); this
    md5 flavor exists so the *method* is oracle-checkable end to end.
  - simhash_pairs: 64-bit SimHash hamming candidates over word tokens.
  - embedding near-dup: see operators/similarity.py (cosine).

Scale notes are on each function; the LSH/banding math mirrors
SURVEY.md P4/P5/P7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text", distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) word n-grams; whitespace tokenization. distinct=True
    (default) gives set semantics -- required by consumers that COUNT
    shingles (ngram_jaccard_pairs, decontaminate). Min-aggregating
    consumers (MinHash) pass distinct=False: min over the multiset equals
    min over its support set, and skipping the dedup drops a full shuffle
    of the shingle relation."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r" +").alias("_w"),
    )
    out = (
        words.select(
            "doc_id",
            F.when(
                F.size("_w") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - n),
                    lambda j: F.concat_ws(" ", F.slice("_w", j + 1, n)),
                ),
            )
            .otherwise(F.array(F.concat_ws(" ", "_w")))
            .alias("_sh"),
        )
        .select("doc_id", F.explode("_sh").alias("shingle"))
    )
    return out.distinct() if distinct else out


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min(id_col).cast("long").alias("canonical_id"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact shingle-set Jaccard for every pair sharing >= 1 shingle.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), integer counts -> the final
    double division is bit-deterministic. Quadratic in shingle-bucket size:
    correct as the small-scale oracle; at 100 TB use minhash_lsh_pairs."""
    sh = doc_shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            "n_inter",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def md5_minhash_signatures(docs: DataFrame, k: int = 16, n: int = 3) -> DataFrame:
    """MinHash with the hash family h_i(s) = md5(i || '|' || s), min taken
    lexicographically over the hex digest -- a valid permutation family that
    DuckDB reproduces verbatim (the oracle hook). Shingles come through as
    a multiset (distinct=False): the min-aggregate is invariant to
    duplicates, so the shingle dedup shuffle would buy nothing."""
    sh = doc_shingles(docs, n, distinct=False)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def md5_lsh_bands(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, band_id, band_hash) from an md5_minhash_signatures relation:
    band_hash = md5 over the band's r = k/bands signature columns. Pure
    projection + explode (no shuffle)."""
    r = k // bands
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.md5(F.concat_ws("|", *[F.col(f"mh{bi * r + j}") for j in range(r)])).alias(
                    "band_hash"
                ),
            )
            for bi in range(bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_arr).alias("_b")).select(
        "doc_id", F.col("_b.band_id").alias("band_id"), F.col("_b.band_hash").alias("band_hash")
    )


def md5_lsh_pairs(
    docs: DataFrame, k: int = 16, bands: int = 4, n: int = 3,
    est_threshold: float = 0.5,
) -> DataFrame:
    """Banded LSH over the md5 MinHash (rows_per_band = k/bands), candidate
    pairs on any band collision, verified by the signature-agreement
    estimate. One explode + one self-join keyed (band_id, band_hash)."""
    sig = md5_minhash_signatures(docs, k, n)
    bands_df = md5_lsh_bands(sig, k, bands)
    la = bands_df.select("band_id", "band_hash", F.col("doc_id").alias("a"))
    lb = bands_df.select("band_id", "band_hash", F.col("doc_id").alias("b"))
    cand = (
        la.join(lb, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    siga = sig.select(F.col("doc_id").alias("a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    sigb = sig.select(F.col("doc_id").alias("b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])
    eq_terms = [
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    ]
    total = eq_terms[0]
    for t in eq_terms[1:]:
        total = total + t
    return (
        cand.join(siga, "a")
        .join(sigb, "b")
        .withColumn("n_equal", total.cast("long"))
        .withColumn("jaccard_est", F.round(F.col("n_equal") / F.lit(k), 6))
        .filter(F.col("jaccard_est") >= est_threshold)
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            "n_equal",
            "jaccard_est",
        )
    )


def simhash_pieces(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(clip_id, simhash, piece_id, piece): the 4x16-bit banded SimHash
    bucket keys. Pigeonhole: 4 pieces GUARANTEE a shared piece for
    hamming <= 3; above that, detection requires the flipped bits to leave
    some piece untouched (high-probability for small hamming, recall < 1 by
    design -- the standard Manku-style table/recall trade; add pieces or
    rotations for a harder guarantee)."""
    from .signatures import simhash64

    sim = simhash64(docs, text_col=text_col, id_col=id_col)
    return sim.select(
        "clip_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("piece_id"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("piece"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("_p"),
    ).select("clip_id", "simhash",
             F.col("_p.piece_id").alias("piece_id"), F.col("_p.piece").alias("piece"))


def simhash_pairs_from_pieces(pieces: DataFrame, max_hamming: int = 12,
                              pair_cap: int = 256, n_hubs: int = 4) -> DataFrame:
    """(a, b, hamming) pairs sharing >= 1 simhash piece, hot buckets capped.

    Buckets of size <= pair_cap join pairwise (exact). Larger buckets emit a
    *multi-hub star* instead -- the n_hubs minimum-id members each connect to
    every member (plus pairwise among the hubs) -- linear in bucket size, not
    quadratic. At corpus scale a 16-bit piece holds ~N/65536 docs plus
    pathological boilerplate skew; the star preserves component connectivity
    for the dominant hot case (identical/near-identical simhashes). A single
    min-id hub could be a hamming outlier whose edges all fail the <=
    max_hamming filter, silently disconnecting the bucket; n_hubs > 1 makes
    that require *every* hub to be an outlier. Pairwise edges between
    non-hub members that pass the filter only via a *different* piece are
    still found through that piece's bucket. Capping is a documented
    recall trade -- use count_star_capped_buckets() to monitor how often it
    fires, and simhash_pairs_guaranteed() when recall must be 1.0."""
    sized = pieces.withColumn(
        "_n", F.count("*").over(Window.partitionBy("piece_id", "piece"))
    )
    small = sized.filter(F.col("_n") <= pair_cap).drop("_n")
    big = sized.filter(F.col("_n") > pair_cap).drop("_n")

    la = small.select("piece_id", "piece", F.col("clip_id").alias("a"),
                      F.col("simhash").alias("sa"))
    lb = small.select("piece_id", "piece", F.col("clip_id").alias("b"),
                      F.col("simhash").alias("sb"))
    pairs_small = (
        la.join(lb, ["piece_id", "piece"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
    )

    # n_hubs smallest ids per hot bucket via a row_number window over the
    # `big` subset only. The window sorts (spillable, bounded task memory);
    # a collect_list aggregation here would materialize the WHOLE hot bucket
    # in one aggregation buffer -- O(m) memory in exactly the pathological
    # case the cap exists for (a boilerplate 16-bit piece at 10^12 docs can
    # hold 10^8+ members). The surviving relation is <= n_hubs rows per hot
    # bucket: tiny, broadcast back onto the bucket members.
    wb = Window.partitionBy("piece_id", "piece").orderBy("clip_id")
    hubs = (
        big.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= n_hubs)
        .select("piece_id", "piece",
                F.col("clip_id").alias("_hid"), F.col("simhash").alias("_hsim"))
    )
    pairs_big = (
        big.join(F.broadcast(hubs), ["piece_id", "piece"])
        .filter(F.col("clip_id") != F.col("_hid"))
        .select(
            F.least("clip_id", "_hid").alias("a"),
            F.greatest("clip_id", "_hid").alias("b"),
            F.when(F.col("_hid") < F.col("clip_id"), F.col("_hsim"))
            .otherwise(F.col("simhash")).alias("sa"),
            F.when(F.col("_hid") < F.col("clip_id"), F.col("simhash"))
            .otherwise(F.col("_hsim")).alias("sb"),
        )
    )

    return (
        pairs_small.unionByName(pairs_big)
        .select("a", "b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def count_star_capped_buckets(pieces: DataFrame, pair_cap: int = 256) -> DataFrame:
    """Monitoring relation for the star-cap recall trade: one row per
    (piece_id, piece) bucket that exceeds pair_cap, with its size. Pipelines
    should materialize this next to the pairs (plans/pipeline.py stages do)
    so capping is observable, never silent."""
    return (
        pieces.groupBy("piece_id", "piece")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > pair_cap)
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 12,
                  text_col: str = "text", id_col: str = "doc_id",
                  pair_cap: int = 256) -> DataFrame:
    """SimHash near-dup candidates: pairs within max_hamming bits, banded
    into 4x16-bit pieces (the scale plan), hot piece-buckets star-capped."""
    return simhash_pairs_from_pieces(
        simhash_pieces(docs, text_col=text_col, id_col=id_col),
        max_hamming=max_hamming, pair_cap=pair_cap,
    )


# ---------------------------------------------------------------------------
# Guaranteed-recall SimHash (Manku/Jain/Sarma WWW'07 block-combination
# scheme, relational formulation)
# ---------------------------------------------------------------------------

def _simhash_block_tables(max_hamming: int, blocks_per_key: int | None = None):
    """(n_blocks, k, [(table_id, (block_idx,...)), ...], [block widths]).

    Split the 64-bit fingerprint into B contiguous blocks and build one
    bucket table per k-combination of blocks, keyed on those blocks'
    concatenated values. A pair at hamming h <= d touches at most d blocks,
    leaving >= B - d >= k blocks intact, so SOME table's key is shared:
    recall is exactly 1.0 for hamming <= d (pigeonhole over combinations --
    the multi-table construction of Manku et al., chosen relationally
    instead of via sorted-prefix probes).

    k trades table count against key width: k=1 is the plain (d+1)-piece
    pigeonhole (few tables, narrow keys -> big buckets); k=2 gives
    C(d+2, 2) tables with ~2x wider keys. Defaults: k=1 while pieces stay
    >= 8 bits (d <= 7), else k=2."""
    from itertools import combinations

    d = int(max_hamming)
    if d < 0 or d > 30:
        raise ValueError(f"max_hamming must be in [0, 30], got {d}")
    k = blocks_per_key if blocks_per_key is not None else (1 if d <= 7 else 2)
    n_blocks = d + k
    if n_blocks > 64:
        raise ValueError("d + blocks_per_key must be <= 64")
    base, extra = divmod(64, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    tables = list(enumerate(combinations(range(n_blocks), k)))
    return n_blocks, k, tables, widths


def simhash_keys_guaranteed(sigs: DataFrame, max_hamming: int = 12,
                            blocks_per_key: int | None = None) -> DataFrame:
    """sigs(clip_id, simhash) -> (clip_id, simhash, table_id, key): one row
    per (doc, table) with the table's block-combination key. C(B, k) rows
    per doc -- 13 for d=12/k=1, 91 for d=12/k=2."""
    _, _, tables, widths = _simhash_block_tables(max_hamming, blocks_per_key)
    offsets = [sum(widths[:i]) for i in range(len(widths))]

    def block(i):
        shifted = F.shiftrightunsigned(F.col("simhash"), offsets[i])
        if widths[i] >= 64:  # d=0, k=1: the single block IS the fingerprint
            return shifted
        return shifted.bitwiseAND(F.lit((1 << widths[i]) - 1))

    def key(combo):
        acc = F.lit(0).cast("long")
        for i in combo:
            acc = F.shiftleft(acc, widths[i]).bitwiseOR(block(i))
        return acc

    return sigs.select(
        "clip_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(tid).alias("table_id"), key(combo).alias("key"))
            for tid, combo in tables
        ])).alias("_t"),
    ).select("clip_id", "simhash",
             F.col("_t.table_id").alias("table_id"), F.col("_t.key").alias("key"))


def simhash_pairs_guaranteed(docs: DataFrame, max_hamming: int = 12,
                             text_col: str = "text", id_col: str = "doc_id",
                             blocks_per_key: int | None = None) -> DataFrame:
    """(a, b, hamming) with GUARANTEED recall 1.0 for hamming <= max_hamming
    (vs the default simhash_pairs' high-probability 4-piece banding, honest
    about its recall trade above hamming 3).

    Cost model at scale: C(B,k) explode per doc, then one bucket self-join
    per table; expected bucket size N * C(B,k) / 2^keybits per table. The
    guarantee forbids capping (a capped bucket could hide exactly the pair
    the caller was promised), so boilerplate-heavy corpora with huge
    identical-key buckets pay the quadratic corner -- that is inherent to
    any exact scheme; run the default banded path first and reserve this
    for bounded candidate sets or audits."""
    from .signatures import simhash64

    sigs = simhash64(docs, text_col=text_col, id_col=id_col)
    return simhash_pairs_guaranteed_from_sigs(
        sigs, max_hamming=max_hamming, blocks_per_key=blocks_per_key
    )


def simhash_pairs_guaranteed_from_sigs(sigs: DataFrame, max_hamming: int = 12,
                                       blocks_per_key: int | None = None) -> DataFrame:
    """Guaranteed-recall pairs from a precomputed sigs(clip_id, simhash)."""
    keyed = simhash_keys_guaranteed(sigs, max_hamming, blocks_per_key)
    la = keyed.select("table_id", "key", F.col("clip_id").alias("a"),
                      F.col("simhash").alias("sa"))
    lb = keyed.select("table_id", "key", F.col("clip_id").alias("b"),
                      F.col("simhash").alias("sb"))
    return (
        la.join(lb, ["table_id", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b",
                F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def decontaminate(train: DataFrame, eval_docs: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  hash_flavor: str = "xxhash64",
                  broadcast_eval: bool = True) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= 1 exact
    word n-gram with any eval/benchmark doc (the GPT-3 appendix-C /
    PaLM-style train-test leak filter; n=13 is the published default).

    Returns one row per CONTAMINATED train doc:
      (doc_id, n_hit_ngrams, n_eval_docs, n_grams, hit_frac)
    where n_hit_ngrams counts the doc's distinct n-grams that appear in
    the eval set, n_eval_docs the distinct eval docs reachable through
    them, n_grams the doc's total distinct n-grams, and
    hit_frac = n_hit_ngrams / n_grams (round 6). Docs shorter than n
    tokens contribute their whole text as one gram (doc_shingles
    semantics), so short exact copies are still caught.

    Scale shape: the eval side is a benchmark suite -- thousands of docs,
    millions of n-grams -- while train is the 100 TB corpus, so the join
    MUST stream the train side. With broadcast_eval=True (default) the
    distinct eval grams are broadcast and the train side never shuffles:
    one map-side hash-join pass over the corpus plus one partial-agg
    groupBy on doc_id (map-side combinable; per-doc counts only). With
    hash_flavor="xxhash64" the broadcast carries 8-byte gram hashes
    instead of raw strings (~10x smaller for n=13 grams); exact-match
    semantics are preserved up to 64-bit hash collisions (~1e-10 for a
    1e4-gram benchmark). hash_flavor="raw" joins on the gram text itself
    -- collision-free, DuckDB-replayable: the oracle flavor.
    """
    if hash_flavor not in ("xxhash64", "raw"):
        raise ValueError(f"hash_flavor must be xxhash64|raw, got {hash_flavor}")
    tr = doc_shingles(train, n, id_col=id_col, text_col=text_col)
    ev = doc_shingles(eval_docs, n, id_col=id_col, text_col=text_col)
    if hash_flavor == "xxhash64":
        key = lambda df: df.withColumn("_k", F.xxhash64("shingle")).drop("shingle")
        tr, ev = key(tr), key(ev)
        join_key = "_k"
    else:
        join_key = "shingle"
    ev_grams = ev.select(
        F.col(join_key),
        F.col("doc_id").alias("_eval_id"),
    ).distinct()
    if broadcast_eval:
        ev_grams = F.broadcast(ev_grams)
    # ONE corpus pass: left-outer broadcast join (a hit gram duplicates per
    # eval doc carrying it; misses keep _eval_id null), then a single
    # groupBy(doc_id) with distinct aggregates -- no second tokenization
    # scan and no doc_id-keyed join for the sizes.
    return (
        tr.join(ev_grams, join_key, "left")
        .groupBy("doc_id")
        .agg(
            F.countDistinct(
                F.when(F.col("_eval_id").isNotNull(), F.col(join_key))
            ).cast("long").alias("n_hit_ngrams"),
            F.countDistinct("_eval_id").cast("long").alias("n_eval_docs"),
            F.countDistinct(join_key).cast("long").alias("n_grams"),
        )
        .filter(F.col("n_hit_ngrams") > 0)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_hit_ngrams",
            "n_eval_docs",
            "n_grams",
            F.round(F.col("n_hit_ngrams") / F.col("n_grams"), 6).alias("hit_frac"),
        )
    )
