"""Mergeable cardinality / overlap sketches for dedup planning at scale.

The reference's quality tooling reports exact dedup ratios by grouping
every chunk hash (``/root/reference/cmd/cdc/stats.go`` measure path) --
fine at test scale, a full-corpus shuffle at 100 TB. These operators
answer the two PLANNING questions a petabyte dedup run starts with
without shuffling the corpus:

  1. "How many unique chunks does this corpus have?" -- HyperLogLog
     (Flajolet et al. 2007): per-partition register maxima, ONE partial-
     aggregatable shuffle of at most 2^p tiny rows, ~1.04/sqrt(2^p)
     relative error. Registers are a mergeable state: corpus deltas OR
     per-file sketches combine by elementwise MAX, so an incremental
     store can keep yesterday's registers and fold in today's.
  2. "How much would corpus B dedup against corpus A?" -- bottom-k
     sketches (Cohen & Kaplan 2007): the k smallest hash values of each
     side, merged and intersected to estimate Jaccard/containment. Each
     sketch is a per-partition top-k + merge (TakeOrdered -- no full
     shuffle), k rows total, and mergeable across corpora/deltas the
     same way.

Two hash flavors, mirroring signatures.py's split:
  - ``hash_mode="xxhash64"`` -- the production path: one JVM xxhash64
    call, bit ops on the long. Fast, whole-stage-codegen friendly.
  - ``hash_mode="md5"`` -- the oracle path: bucket and rank are derived
    from the md5 hex STRING with engine-portable string ops (DuckDB has
    no xxhash64), so the driver oracle replays the sketch bit-for-bit
    relationally. Same algorithm, same estimates, different hash.

Float parity (CLAUDE.md): the register sum is kept EXACT -- each
register contributes pow(2, 53 - M) which is an integer-valued double
(M >= 1, so exponent <= 52), summed as DECIMAL(38,0); empty registers
contribute 2^53 exactly. The final estimate is then ONE double
division of constants by that exact decimal, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_P = 12                      # register-index bits
_M = 1 << _P                 # 4096 registers
_ALPHA_NUM = 0.7213          # alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128
_TWO53 = float(1 << 53)

# rho over the md5 hex tail: 4 bits per leading '0' hex char, plus the
# leading zero bits INSIDE the first nonzero nibble (4 - bit_length(d)),
# plus 1. Engine-portable: regexp_extract + a 16-way CASE, identical
# text in Spark SQL and DuckDB.
_HEX_EXTRA_CASE = (
    "CASE substring({rest}, length(regexp_extract({rest}, '^(0*)', 1)) + 1, 1) "
    "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
    "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
    "ELSE 0 END"
)


def _md5_rho_sql(rest: str) -> str:
    """SQL expression for rho(52-bit value spelled as 13 hex chars)."""
    zeros = f"length(regexp_extract({rest}, '^(0*)', 1))"
    extra = _HEX_EXTRA_CASE.format(rest=rest)
    return (f"CASE WHEN {zeros} = 13 THEN 53 "
            f"ELSE 4 * {zeros} + {extra} + 1 END")


def _md5_col(df: DataFrame, col: str):
    """md5 input canonicalization shared with the oracles: binary
    columns hash their lowercase-hex spelling (Spark's cast(binary as
    string) would interpret raw digest bytes as UTF-8 -- lossy and not
    replayable in SQL); everything else hashes its string cast."""
    if dict(df.dtypes).get(col) == "binary":
        return F.md5(F.lower(F.hex(F.col(col))))
    return F.md5(F.col(col).cast("string"))


def hll_registers(df: DataFrame, col: str,
                  hash_mode: str = "xxhash64") -> DataFrame:
    """(bucket, m_rho) register relation -- MAX-mergeable HLL state.

    One aggregation with map-side partial MAX: the shuffle carries at
    most 2^p rows per map task regardless of corpus size."""
    if hash_mode == "xxhash64":
        h = F.xxhash64(F.col(col))
        bucket = h.bitwiseAND(F.lit(_M - 1)).cast("int")
        w = F.shiftrightunsigned(h, _P)  # 52 meaningful bits
        # F.bin drops leading zeros, so rho = 53 - length(bin(w)); w == 0
        # (all 52 bits zero) gets the saturated rank 53.
        rho = F.when(w == 0, F.lit(53)).otherwise(
            F.lit(53) - F.length(F.bin(w)))
        reg = df.select(bucket.alias("bucket"), rho.alias("rho"))
    elif hash_mode == "md5":
        m = _md5_col(df, col)
        bucket = F.substring(m, 1, 3)  # 12 bits as the hex prefix string
        rest = F.substring(m, 4, 13)   # 52 bits as 13 hex chars
        reg = df.select(
            bucket.alias("bucket"), rest.alias("_rest")
        ).select("bucket", F.expr(_md5_rho_sql("_rest")).alias("rho"))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return reg.groupBy("bucket").agg(F.max("rho").cast("int").alias("m_rho"))


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Union register states and re-MAX: the sketch of the union of the
    underlying sets (incremental corpora fold in for free)."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("bucket").agg(F.max("m_rho").cast("int").alias("m_rho"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row estimate from a register relation. Exact-decimal register
    sum, then a single double division (see module docstring); the
    standard small-range linear-counting correction when E <= 2.5m and
    empty registers exist."""
    alpha = _ALPHA_NUM / (1.0 + 1.079 / _M)
    agg = registers.agg(
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("m_rho"))
                  .cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)")).alias("s_hi"),
        F.count("*").cast("long").alias("n_reg"),
    )
    v = F.lit(_M) - F.col("n_reg")
    s = F.col("s_hi") + v.cast("decimal(38,0)") * F.lit(1 << 53).cast(
        "decimal(38,0)")
    e_raw = F.lit(alpha * _M * _M * _TWO53) / s.cast("double")
    est = F.when((e_raw <= 2.5 * _M) & (v > 0),
                 F.lit(float(_M)) * F.log(F.lit(float(_M)) / v.cast("double"))
                 ).otherwise(e_raw)
    return agg.select(
        F.col("n_reg").cast("long").alias("n_registers"),
        v.cast("long").alias("v_zero"),
        F.round(est, 2).alias("estimate"),
    )


def hll_distinct(df: DataFrame, col: str,
                 hash_mode: str = "xxhash64") -> DataFrame:
    """Convenience: registers + estimate in one call."""
    return hll_estimate(hll_registers(df, col, hash_mode=hash_mode))


# ---------------------------------------------------------------------------
# Bottom-k overlap
# ---------------------------------------------------------------------------

def bottom_k(df: DataFrame, col: str, k: int,
             hash_mode: str = "md5") -> DataFrame:
    """The k smallest hash values of the column's DISTINCT set -- a
    uniform sample of the set that is mergeable (bottom-k of a union =
    bottom-k of the union of sketches). orderBy().limit() compiles to
    TakeOrderedAndProject: per-partition top-k, no full sort shuffle."""
    if hash_mode == "md5":
        h = _md5_col(df, col)
    elif hash_mode == "xxhash64":
        # order on the unsigned value spelled as fixed-width hex so string
        # order == numeric order (bigint order would differ on sign)
        h = F.lpad(F.hex(F.xxhash64(F.col(col))), 16, "0")
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return (df.select(h.alias("h")).distinct().orderBy("h").limit(k))


def overlap_estimate(sketch_a: DataFrame, sketch_b: DataFrame,
                     k: int) -> DataFrame:
    """Jaccard + containment estimates from two bottom-k sketches
    (Cohen & Kaplan 2007): take the k smallest of the union of sketches
    (a bottom-k sketch of A union B), count how many of those are in
    both / in each side. All counting, no floats until the final ratios."""
    union_k = (sketch_a.unionByName(sketch_b).distinct()
               .orderBy("h").limit(k).withColumnRenamed("h", "u"))
    a = sketch_a.withColumnRenamed("h", "ha")
    b = sketch_b.withColumnRenamed("h", "hb")
    marked = (union_k
              .join(a, F.col("u") == F.col("ha"), "left")
              .join(b, F.col("u") == F.col("hb"), "left"))
    return marked.agg(
        F.count("*").cast("long").alias("k_union"),
        F.sum((F.col("ha").isNotNull() & F.col("hb").isNotNull())
              .cast("long")).alias("n_both"),
        F.sum(F.col("ha").isNotNull().cast("long")).alias("n_a"),
        F.sum(F.col("hb").isNotNull().cast("long")).alias("n_b"),
    ).select(
        "k_union", "n_both",
        # try_divide: a zero sample size (empty side, or B so much
        # smaller than A that no B hash enters the union bottom-k) is a
        # legitimate "no information" outcome -- NULL, not an ANSI
        # DIVIDE_BY_ZERO crash; callers surface it as an honest unknown
        F.round(F.try_divide(F.col("n_both"), F.col("k_union")), 6)
        .alias("jaccard_est"),
        F.round(F.try_divide(F.col("n_both"), F.col("n_b")), 6)
        .alias("containment_b_in_a"),
        # sample sizes: the containment estimate rides on n_b points, so
        # its sigma ~ sqrt(c(1-c)/n_b) -- callers (estimate_vs_store)
        # surface that as an honest error bar. For very asymmetric
        # |A| >> |B| the union sample holds few B elements; size k to
        # the asymmetry you need to resolve.
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    )
