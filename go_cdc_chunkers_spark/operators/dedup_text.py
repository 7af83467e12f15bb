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
                 text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct word n-grams; whitespace tokenization."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r" +").alias("_w"),
    )
    return (
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
        .distinct()
    )


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
    DuckDB reproduces verbatim (the oracle hook)."""
    sh = doc_shingles(docs, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def md5_lsh_pairs(
    docs: DataFrame, k: int = 16, bands: int = 4, n: int = 3,
    est_threshold: float = 0.5,
) -> DataFrame:
    """Banded LSH over the md5 MinHash (rows_per_band = k/bands), candidate
    pairs on any band collision, verified by the signature-agreement
    estimate. One explode + one self-join keyed (band_id, band_hash)."""
    sig = md5_minhash_signatures(docs, k, n)
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
    bands_df = sig.select("doc_id", F.explode(band_arr).alias("_b")).select(
        "doc_id", F.col("_b.band_id").alias("band_id"), F.col("_b.band_hash").alias("band_hash")
    )
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
                              pair_cap: int = 256) -> DataFrame:
    """(a, b, hamming) pairs sharing >= 1 simhash piece, hot buckets capped.

    Buckets of size <= pair_cap join pairwise (exact). Larger buckets emit a
    *star* around the minimum member instead -- linear, not quadratic. At
    corpus scale a 16-bit piece holds ~N/65536 docs plus pathological
    boilerplate skew; the star preserves connectivity for the dominant hot
    case (identical/near-identical simhashes, where every hub edge passes
    the hamming filter) while bounding work. Pairwise edges between
    non-hub members of a hot bucket that pass the filter only via a
    *different* piece are still found through that piece's bucket."""
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

    hub = big.groupBy("piece_id", "piece").agg(
        F.min("clip_id").alias("a"), F.min_by("simhash", "clip_id").alias("sa")
    )
    pairs_big = (
        big.join(hub, ["piece_id", "piece"])
        .filter(F.col("clip_id") != F.col("a"))
        .select("a", F.col("clip_id").alias("b"), "sa", F.col("simhash").alias("sb"))
    )

    return (
        pairs_small.unionByName(pairs_big)
        .select("a", "b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
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
