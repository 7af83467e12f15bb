"""Similarity search over an embedding column (array<float>).

Two paths:
  - brute_force_topk: exact cosine top-k of every query vector against the
    corpus. The dot products are computed in *scaled integer space*
    (round(x*y*1e12) summed as bigint) so the result is bit-deterministic
    and reproducible by the ANSI-SQL oracle -- float summation order can
    never flip a result. Correct baseline; O(|Q| x |N|).
  - lsh_bucketed_topk: the scale path -- a random-hyperplane (SimHash-style)
    sketch of each vector buckets the corpus; queries only score vectors
    sharing a bucket (multi-probe over bands). Sub-linear candidates at
    1000-executor scale, with the same integer-exact scorer on the
    candidate set. Recall is tested against the brute-force oracle.

All column-level math is JVM-side (zip_with / aggregate / transform);
no Python in either path.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves the dots-UDF type hints)
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1e12


def _dot_scaled(a, b):
    """sum(round(a_i*b_i*1e12)) as bigint: order-free, bit-deterministic."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.round(x.cast("double") * y.cast("double") * F.lit(_SCALE)).cast(
                "long"
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _norm2_scaled(a):
    return _dot_scaled(a, a)


def cosine_expr(a, b):
    """Cosine similarity from integer-scaled dots: deterministic double."""
    return F.round(
        _dot_scaled(a, b)
        / F.sqrt(_norm2_scaled(a).cast("double") * _norm2_scaled(b).cast("double")),
        6,
    )


def _cosine_dots_udf():
    """Arrow-vectorized twin of the three _dot_scaled aggregates: one
    pandas UDF returning struct<dot,na,nb> (the integer-scaled dot and both
    norms), computed with numpy over whole batches. The interpreted
    higher-order aggregate(zip_with(...)) costs ~microseconds PER ELEMENT
    (Catalyst does not codegen lambda functions); on a pair-heavy scorer
    that is the whole stage. Values are bit-identical: float32 -> float64
    promotion, (x*y)*1e12 evaluation order, and HALF_UP tie-rounding
    (floor(t+0.5) / ceil(t-0.5), exact for |t| < 2^51 -- these dots are
    <= dims * 1e12) all match the JVM expression; the int64 sum is exact
    either way. The division + round(.,6) stay JVM-side so the published
    double is produced by the same engine expression as before."""
    from pyspark.sql import types as T

    dots_type = T.StructType([
        T.StructField("dot", T.LongType(), False),
        T.StructField("na", T.LongType(), False),
        T.StructField("nb", T.LongType(), False),
    ])

    @F.pandas_udf(dots_type)
    def _dots(va: pd.Series, vb: pd.Series) -> pd.DataFrame:
        import numpy as np

        def half_up(t):
            return np.where(
                t >= 0, np.floor(t + 0.5), np.ceil(t - 0.5)).astype(np.int64)

        try:
            A = np.array(va.tolist(), dtype=np.float64)
            B = np.array(vb.tolist(), dtype=np.float64)
            if A.ndim != 2 or B.ndim != 2:
                raise ValueError("ragged batch")
            dot = half_up(A * B * _SCALE).sum(axis=1)
            na = half_up(A * A * _SCALE).sum(axis=1)
            nb = half_up(B * B * _SCALE).sum(axis=1)
        except ValueError:
            # ragged batch (mixed dims): per-row numpy, same arithmetic
            dot, na, nb = [], [], []
            for x, y in zip(va, vb):
                x = np.asarray(x, dtype=np.float64)
                y = np.asarray(y, dtype=np.float64)
                dot.append(half_up(x * y * _SCALE).sum())
                na.append(half_up(x * x * _SCALE).sum())
                nb.append(half_up(y * y * _SCALE).sum())
        return pd.DataFrame({"dot": dot, "na": na, "nb": nb})

    return _dots


def score_pairs_cosine(df: DataFrame, a_col: str, b_col: str, out_col: str,
                       drop_vecs: bool = True) -> DataFrame:
    """df + out_col = cosine_expr(a_col, b_col), with the per-element work
    Arrow-vectorized (see _cosine_dots_udf). Every multi-row scorer uses
    this -- pair scans (candidate verification, intra-cluster, brute-force
    oracles) AND the centroid/codebook cross joins, whose row multiplier
    (x n_centroids / x codewords) makes the interpreted lambda cost
    dominate just the same. cosine_expr remains the single-expression
    JVM form for tests and future scalar call sites."""
    dots = _cosine_dots_udf()
    out = df.withColumn("_dots", dots(F.col(a_col), F.col(b_col))).withColumn(
        out_col,
        F.round(
            F.col("_dots.dot")
            / F.sqrt(F.col("_dots.na").cast("double")
                     * F.col("_dots.nb").cast("double")),
            6,
        ),
    ).drop("_dots")
    if drop_vecs:
        out = out.drop(a_col, b_col)
    return out


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """queries x corpus exact cosine top-k (excluding self)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = score_pairs_cosine(
        q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id")),
        "_qv", "_cv", "cosine",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            "cosine",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# --- exact Python port of Spark's XXH64 primitives (catalyst
# expressions/XXH64): needed so executors can derive the +-1 hyperplane
# matrix without evaluating 64 interpreted lambda aggregates per row.
# Pinned bit-exact against F.xxhash64 in tests/test_operators_unit.py. ---
_XXH_M = (1 << 64) - 1
_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5


def _xxh_rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _XXH_M


def _xxh_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXH_P2) & _XXH_M
    h ^= h >> 29
    h = (h * _XXH_P3) & _XXH_M
    h ^= h >> 32
    return h


def xxhash64_int(value: int, seed: int) -> int:
    """XXH64.hashInt -- how Spark's xxhash64 folds an IntegerType column."""
    h = (seed + _XXH_P5 + 4) & _XXH_M
    h ^= ((value & 0xFFFFFFFF) * _XXH_P1) & _XXH_M
    h = (_xxh_rotl(h, 23) * _XXH_P2 + _XXH_P3) & _XXH_M
    return _xxh_fmix(h)


_SIGN_CACHE: dict = {}


def _hyperplane_signs(seed: int, n_bits: int, dim: int):
    """(n_bits, dim) float64 matrix of +-1 from the parity of
    xxhash64(seed, i, d) -- the exact values the old per-bit lambda
    aggregate derived element-wise in the JVM. Cached per worker process
    (worker reuse keeps it across tasks)."""
    import numpy as np

    key = (seed, n_bits, dim)
    got = _SIGN_CACHE.get(key)
    if got is None:
        rows = []
        for i in range(n_bits):
            h1 = xxhash64_int(i, xxhash64_int(seed, 42))
            rows.append([1.0 if xxhash64_int(d, h1) & 1 else -1.0
                         for d in range(dim)])
        got = _SIGN_CACHE[key] = np.array(rows, dtype=np.float64)
    return got


def hyperplane_sketch(
    embeddings: DataFrame,
    n_bits: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane LSH: bit_i = sign(<v, r_i>) with pseudo-random
    hyperplanes derived from xxhash64(seed, i, dim) -- reproducible without
    shipping a matrix. Returns (vec_id, sketch long).

    Default widened to 64 bits (8x8-bit bands downstream): the old 16-bit /
    4-band geometry gave only 16 buckets per band -> ~N^2/16 candidates at
    corpus scale. Bits are OR-ed via shiftleft so bit 63 (the sign bit of
    the long) is well-defined.

    Computed in one Arrow-vectorized UDF: the expression form
    (_hyperplane_sketch_expr, kept for the identity test) evaluates
    n_bits interpreted lambda aggregates of dim elements PER ROW --
    n_bits x dim x ~0.5us of expression-interpreter overhead dwarfs the
    actual multiply-adds. The UDF accumulates each bit's dot
    SEQUENTIALLY over dims (acc += v[d] * sign), the same left fold as
    the aggregate(), so every IEEE addition happens in the same order
    and the sign bits are identical; the +-1 matrix comes from the
    bit-exact xxhash64 port above."""
    n_bits_c, seed_c = int(n_bits), int(seed)

    @F.pandas_udf("long")
    def _sketch(v: pd.Series) -> pd.Series:
        import numpy as np

        def row_sketch(x) -> int:
            if x is None or len(x) == 0:
                return 0  # matches when(null/0-dot > 0, ...).otherwise(0)
            xv = np.asarray(x, dtype=np.float64)
            signs = _hyperplane_signs(seed_c, n_bits_c, len(xv))
            out = 0
            for i in range(n_bits_c):
                acc = 0.0
                s = signs[i]
                for d in range(len(xv)):
                    acc += xv[d] * s[d]
                if acc > 0:
                    out |= 1 << i
            return out

        arrs = v.tolist()
        try:
            V = np.array(arrs, dtype=np.float64)
            if V.ndim != 2:
                raise ValueError("ragged batch")
        except (ValueError, TypeError):
            return pd.Series([row_sketch(x) for x in arrs],
                             dtype="int64")
        n, dim = V.shape
        signs = _hyperplane_signs(seed_c, n_bits_c, dim)
        out = np.zeros(n, dtype=np.uint64)
        for i in range(n_bits_c):
            acc = np.zeros(n, dtype=np.float64)
            s = signs[i]
            for d in range(dim):
                # sequential over dims = the aggregate()'s left fold;
                # vectorized over rows only, so per-row IEEE order matches
                acc += V[:, d] * s[d]
            out |= (acc > 0).astype(np.uint64) << np.uint64(i)
        return pd.Series(out.astype(np.int64))

    return embeddings.select(
        F.col(id_col).alias("vec_id"), _sketch(F.col(vec_col)).alias("sketch"))


def _hyperplane_sketch_expr(
    embeddings: DataFrame,
    n_bits: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """The original pure-expression form of hyperplane_sketch; kept as the
    identity oracle for the vectorized path (tests assert sketch-for-sketch
    equality)."""
    dims = F.size(F.col(vec_col))
    # r_i[d] in {-1, +1} from the parity of xxhash64(seed, i, d)
    def bit(i: int):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), dims - 1),
                lambda x, d: x.cast("double")
                * F.when(
                    F.xxhash64(F.lit(seed), F.lit(i), d).bitwiseAND(F.lit(1)) == 1, 1.0
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(
            dot > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))

    sk = bit(0)
    for i in range(1, n_bits):
        sk = sk.bitwiseOR(bit(i))
    return embeddings.select(F.col(id_col).alias("vec_id"), sk.alias("sketch"))


def sketch_pieces(
    embeddings: DataFrame,
    n_bits: int = 64,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """(vec_id, band_id, piece): the banded LSH bucket keys. 8-bit pieces by
    default -> 256 buckets per band; candidates stay sub-quadratic."""
    r = n_bits // bands
    sk = hyperplane_sketch(embeddings, n_bits, id_col, vec_col, seed)
    return sk.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("sketch"), b * r)
                        .bitwiseAND(F.lit((1 << r) - 1))
                        .alias("piece"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_p"),
    ).select(
        "vec_id", F.col("_p.band_id").alias("band_id"), F.col("_p.piece").alias("piece")
    )


def candidates_from_pieces(
    pieces: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """(query_id, neighbor_id) distinct pairs sharing >= 1 (band, piece)
    bucket. Corpus-side buckets larger than bucket_cap are truncated to a
    deterministic pseudo-random cap (ordered by xxhash64 of the member id)
    so a boilerplate-heavy bucket can never go quadratic; the query side is
    never truncated."""
    cb = pieces.select("band_id", "piece", F.col("vec_id").alias("neighbor_id"))
    if bucket_cap is not None:
        w = Window.partitionBy("band_id", "piece").orderBy(
            F.xxhash64(F.col("neighbor_id"), F.lit(11)), F.col("neighbor_id")
        )
        cb = (
            cb.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= bucket_cap)
            .drop("_rn")
        )
    qb = pieces.join(
        queries.select(F.col(id_col).alias("vec_id")), "vec_id"
    ).select("band_id", "piece", F.col("vec_id").alias("query_id"))
    return (
        qb.join(cb, ["band_id", "piece"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def topk_from_candidates(
    embeddings: DataFrame,
    cand: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer-exact cosine scoring + per-query top-k over a candidate set."""
    qv = embeddings.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = score_pairs_cosine(
        cand.join(qv, "query_id").join(cv, "neighbor_id"),
        "_qv", "_cv", "cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            "cosine",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> cluster assignment -> probe
# the n_probe nearest clusters per query. The second scale path next to the
# LSH buckets; everything integer-exact and deterministic (centroid means
# are computed from scaled-integer sums, so no float fold-order sensitivity).
# ---------------------------------------------------------------------------

_MEAN_SCALE = 1e6


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, centroid_id): nearest centroid by integer-exact cosine,
    ties broken by centroid_id. Centroids are broadcast (k is small)."""
    from pyspark.sql.functions import broadcast

    scored = score_pairs_cosine(
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
        ).crossJoin(broadcast(centroids)),
        "_v", "centroid", "_sim",
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "centroid_id")
    )


def train_sample(
    embeddings: DataFrame,
    train_fraction: float | None,
    id_col: str = "vec_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministic hash-sample of training rows: keep ids whose
    xxhash64(id, seed) lands in the lowest `train_fraction` of the modulus
    space. Reproducible across runs and engines (no Sample node, no
    partition-order dependence), uniform for any id distribution because
    the hash output is. None / >= 1.0 = full corpus."""
    if train_fraction is None or train_fraction >= 1.0:
        return embeddings
    if not 0.0 < train_fraction:
        raise ValueError(f"train_fraction must be in (0, 1], got {train_fraction}")
    bound = int(round(train_fraction * 1_000_000))
    return embeddings.filter(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(int(seed) + 7919)),
               F.lit(1_000_000)) < bound
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    train_fraction: float | None = None,
) -> DataFrame:
    """(centroid_id, centroid array<double>) coarse quantizer. Seeds are a
    deterministic pseudo-random sample: the n_centroids globally-smallest
    rows by (xxhash64(id, seed), id), selected with orderBy().limit(), which
    Catalyst plans as TakeOrderedAndProject -- a per-partition top-k followed
    by a tiny driver-side merge of n_centroids rows per partition. No
    single-partition sort of the full table (the round-2 scale-killer; plan
    shape pinned in tests/test_plan_shapes.py). `iters` Lloyd steps refine
    the seeds with cluster means computed from scaled-integer sums
    (order-free, bit-deterministic).

    train_fraction: train (seed + Lloyd) on a deterministic hash-sample
    (train_sample) instead of the corpus -- the scale shape: k-means
    quality needs ~O(100x n_centroids) rows, not 10^12; searches still
    assign/score the FULL corpus against the returned centroids."""
    embeddings = train_sample(embeddings, train_fraction, id_col, seed)
    seeds = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_ord"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
        .orderBy("_ord", "_id")
        .limit(n_centroids)
    )
    # row_number here windows over the n_centroids surviving rows only (a
    # constant-size relation), not the corpus.
    w = Window.orderBy("_ord", "_id")
    cents = seeds.withColumn("_rn", F.row_number().over(w)).select(
        F.col("_rn").alias("centroid_id"), "centroid"
    )
    for _ in range(iters):
        assign = ivf_assign(embeddings, cents, id_col, vec_col)
        dims = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        sums = (
            dims.join(assign, "vec_id")
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum(
                    F.round(F.col("val").cast("double") * F.lit(_MEAN_SCALE)).cast("long")
                ).alias("_s"),
                F.count("*").alias("_n"),
            )
            .withColumn("val", F.col("_s") / F.col("_n") / F.lit(_MEAN_SCALE))
        )
        cents = sums.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda x: x["val"],
            ).alias("centroid")
        )
    return cents


def ivf_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id) IVF candidate pairs: per query, all members
    of its n_probe nearest clusters. The composable half of ivf_topk --
    feed it to topk_from_candidates (exact scoring) or pq_topk's
    `candidates` arg (the IVF-PQ layout: IVF bounds candidate COUNT, PQ
    bounds bytes per candidate)."""
    from pyspark.sql.functions import broadcast

    assign = ivf_assign(embeddings, centroids, id_col, vec_col)
    qv = embeddings.join(queries.select(id_col).distinct(), id_col, "left_semi")
    qscored = score_pairs_cosine(
        qv.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_v"))
        .crossJoin(broadcast(centroids)),
        "_v", "centroid", "_sim",
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("centroid_id"))
    probes = (
        qscored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    return (
        probes.join(assign, "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: per query, probe the n_probe nearest clusters, score only
    their members (integer-exact), take top-k. Candidates ~ n_probe/k_cent
    of the corpus -- the coarse-quantizer analogue of the LSH bucket path."""
    cand = ivf_candidates(embeddings, queries, centroids, n_probe,
                          id_col, vec_col)
    return topk_from_candidates(embeddings, cand, k, id_col, vec_col)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 64,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """Scale path: score only candidates sharing >= 1 sketch band with the
    query (banded multi-probe), hot buckets capped. Same integer-exact
    scorer as brute force."""
    pieces = sketch_pieces(embeddings, n_bits, bands, id_col, vec_col)
    cand = candidates_from_pieces(pieces, queries, id_col, bucket_cap)
    return topk_from_candidates(embeddings, cand, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-compression ANN path. A d-dim vector
# becomes m small codes (one per d/m-dim subspace, each quantized by its own
# ks-centroid codebook), so scoring scans N x m bytes of codes instead of
# N x d floats -- at 10^12 vectors the difference between a table that fits
# the cluster's memory and one that doesn't. ADC (asymmetric distance
# computation) scores a query against ALL compressed vectors via a per-query
# lookup table: approx_dot(q, x) = sum_s dot(q_s, codebook[s][code_s(x)]).
# Complexity is still O(|Q| x N x m) row-ops (PQ compresses memory, not
# candidate count); compose with the IVF/LSH candidate pruning above for
# both (pq_topk takes an optional candidates relation). Inner-product PQ:
# scores are unnormalized scaled-integer dots, bit-deterministic, fully
# relational (the DuckDB oracle ann_pq_topk replays encode + LUT + ADC).
# ---------------------------------------------------------------------------

def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    ks: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    train_fraction: float | None = None,
) -> DataFrame:
    """(sub_id, code, centroid array<double>): one deterministic k-means
    (the ivf_centroids machinery, seeded per subspace) over each subspace's
    sliced subvectors. train_fraction bounds the m training reads to a
    deterministic hash-sample (train_sample; one sample shared by all m
    subspaces, so every codebook sees the same training rows) -- sampling
    only affects the codebooks, never the correctness of encode/score,
    which always run over the full corpus."""
    if dim is None:
        dim = embeddings.select(F.size(vec_col)).first()[0]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    embeddings = train_sample(embeddings, train_fraction, id_col, seed=11)
    out = None
    for s in range(m):
        sub = embeddings.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col),
        )
        cb = ivf_centroids(sub, n_centroids=ks, iters=iters,
                           id_col=id_col, vec_col=vec_col, seed=11 + s)
        cb = cb.select(F.lit(s).alias("sub_id"),
                       F.col("centroid_id").alias("code"), "centroid")
        out = cb if out is None else out.unionByName(cb)
    return out


def _subvectors(df: DataFrame, m: int, dsub: int, id_col: str, vec_col: str,
                out_id: str) -> DataFrame:
    """(out_id, sub_id, subvec): every vector exploded into its m slices."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(F.array(
            *[F.slice(F.col(vec_col), s * dsub + 1, dsub) for s in range(m)]
        )).alias("sub_id", "subvec"),
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int,
    dsub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sub_id, code): nearest codebook entry per subspace by
    integer-exact cosine (ties by code; null sims last -- a zero subvector
    deterministically takes the lowest code). Codebooks broadcast (m x ks
    rows); encoding is one narrow explode + broadcast join + per-key top-1."""
    from pyspark.sql.functions import broadcast

    subs = _subvectors(embeddings, m, dsub, id_col, vec_col, "vec_id")
    scored = score_pairs_cosine(
        subs.join(broadcast(codebooks), "sub_id"),
        "subvec", "centroid", "_sim",
    )
    w = Window.partitionBy("vec_id", "sub_id").orderBy(
        F.col("_sim").desc_nulls_last(), F.col("code"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "sub_id", "code")
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    m: int,
    dsub: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    candidates: DataFrame | None = None,
    refine: int = 0,
) -> DataFrame:
    """ADC top-k. Output shape depends on refine: the bare ADC path returns
    (query_id, neighbor_id, approx_dot, rk) where approx_dot is the
    scaled-integer PQ inner product; with refine=R the exact re-rank
    returns topk_from_candidates' (query_id, neighbor_id, cosine, rk) --
    the true cosine, since that is what the refined ranking is computed
    from. approx_dot is exact given the codes, deterministic.
    `codes` accepts a precomputed/persisted encoding (the production shape:
    encode once, store N x m tiny rows); `candidates`(query_id, neighbor_id)
    restricts scoring (IVF-PQ composition) instead of full-corpus ADC.

    refine=R > 0 adds the standard exact re-rank: ADC selects top-R
    compressed candidates, then true integer-exact cosine ranks the final
    k (fetching R full vectors per query instead of N). Without it,
    within-cluster neighbors that share codes tie on approx_dot and rank
    by id -- measured recall@3 on the clustered fixture: 0.27 bare, 0.87
    at refine=4k, 1.0 at refine=8k. Use refine for quality; bare ADC only
    when full vectors are too expensive to fetch at all."""
    from pyspark.sql.functions import broadcast

    if codes is None:
        codes = pq_encode(embeddings, codebooks, m, dsub, id_col, vec_col)
    qv = embeddings.join(queries.select(F.col(id_col)).distinct(),
                         id_col, "left_semi")
    lut = (
        _subvectors(qv, m, dsub, id_col, vec_col, "query_id")
        .join(broadcast(codebooks), "sub_id")
        .select("query_id", "sub_id", "code",
                _dot_scaled(F.col("subvec"), F.col("centroid")).alias("_pd"))
    )
    scores = (
        codes.join(broadcast(lut), ["sub_id", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("_pd").cast("long").alias("approx_dot"),
             F.count("*").alias("_parts"))
        .filter(F.col("_parts") == m)  # every subspace contributed
        .drop("_parts")
    )
    if candidates is not None:
        scores = scores.join(candidates, ["query_id", "neighbor_id"], "left_semi")
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("neighbor_id"))
    ranked = scores.withColumn("rk", F.row_number().over(w))
    if refine:
        cand = ranked.filter(F.col("rk") <= refine).select(
            "query_id", "neighbor_id")
        return topk_from_candidates(embeddings, cand, k, id_col, vec_col)
    return (
        ranked.filter(F.col("rk") <= k)
        .select(F.col("query_id").cast("long").alias("query_id"),
                F.col("neighbor_id").cast("long").alias("neighbor_id"),
                "approx_dot", F.col("rk").cast("int").alias("rk"))
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering then intra-cluster cosine. A vector is a
    semantic duplicate iff some LOWER-id vector in its k-means cluster
    has cosine >= threshold; the survivor recorded in dup_of is the
    smallest such id (the paper's keep-one-per-group rule made
    deterministic and relational: greedy by id, no iterative graph
    pass). Returns (vec_id, centroid_id, keep, dup_of -1-if-kept).

    Scale shape: centroid assignment broadcasts the (small) centroid
    relation; the pairwise stage self-joins WITHIN clusters only --
    shuffle keyed on centroid_id, never all-pairs. Cluster sizes are
    corpus/k in expectation; a pathologically hot cluster is the same
    skew problem as a hot LSH bucket (cap/salt with
    operators/candidates.py if a corpus needs it). Cosine is the
    module's integer-scaled expression, bit-deterministic across
    engines."""
    assign = ivf_assign(embeddings, centroids, id_col, vec_col)
    v = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("_v")).join(assign, "vec_id")
    lo = v.select(F.col("vec_id").alias("_lo"), F.col("_v").alias("_vlo"),
                  "centroid_id")
    hi = v.select(F.col("vec_id").alias("_hi"), F.col("_v").alias("_vhi"),
                  "centroid_id")
    dups = (
        score_pairs_cosine(
            lo.join(hi, "centroid_id").filter(F.col("_lo") < F.col("_hi")),
            "_vlo", "_vhi", "_sim",
        )
        .filter(F.col("_sim") >= threshold)
        .groupBy(F.col("_hi").alias("vec_id"))
        .agg(F.min("_lo").alias("dup_of"))
    )
    return (
        v.join(dups, "vec_id", "left")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("centroid_id").cast("int").alias("centroid_id"),
            F.col("dup_of").isNull().alias("keep"),
            F.coalesce(F.col("dup_of").cast("long"), F.lit(-1).cast("long"))
            .alias("dup_of"),
        )
    )
