"""Deterministic dataset splitting and sampling for training pipelines.

Two operators, both pure column expressions (no UDF, no shuffle, no RNG):

  - hash_split: assign each row to one of K named splits (train/val/test)
    by hashing (salt, id). The assignment is a property of the ROW, not of
    the dataset: stable under repartition, append, re-runs and engine
    changes -- the property randomSplit() does NOT have (it samples per
    partition, so adding rows or changing parallelism reshuffles everyone's
    split, silently leaking yesterday's train docs into today's test set).

  - stratified_sample: keep each row with a per-stratum probability
    (e.g. language-balanced subsampling) using the same hash machinery --
    deterministic, join-free (the rate table rides in a CASE expression).

Hash flavors mirror signatures.py / dedup_text.py:
  - "md5": u = first 16 hex chars of md5(salt|id), compared
    LEXICOGRAPHICALLY against precomputed hex thresholds (lowercase
    fixed-width hex order == numeric order) -- replayable verbatim in
    ANSI SQL / DuckDB: the oracle flavor.
  - "xxhash64": u = xxhash64(salt|id) as signed 64-bit, thresholds mapped
    into [-2^63, 2^63) -- one cheap JVM hash, the 100 TB flavor.

Both flavors give uniform assignment; they differ per row (different hash
functions), so pick one per dataset and keep it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO64 = 1 << 64


def _hex_threshold(frac: float) -> str:
    """Lowercase 16-digit hex of floor(frac * 2^64); '' > any hex when
    frac >= 1 is handled by callers clamping."""
    v = min(int(frac * _TWO64), _TWO64 - 1)
    return f"{v:016x}"


def _i64_threshold(frac: float) -> int:
    """Signed-64 threshold: frac of [-2^63, 2^63)."""
    v = min(int(frac * _TWO64), _TWO64 - 1)
    return v - (1 << 63)


def _hash_col(id_col: str, salt: str, flavor: str) -> Column:
    key = F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
    if flavor == "md5":
        return F.substring(F.md5(key), 1, 16)
    if flavor == "xxhash64":
        return F.xxhash64(key)
    raise ValueError(f"hash_flavor must be md5|xxhash64, got {flavor}")


def split_assignment(id_col: str, weights: dict[str, float], salt: str = "split",
                     hash_flavor: str = "xxhash64") -> Column:
    """The `split` Column: CASE over cumulative hash thresholds."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    total = float(sum(weights.values()))
    names = list(weights)
    h = _hash_col(id_col, salt, hash_flavor)
    thr = _hex_threshold if hash_flavor == "md5" else _i64_threshold
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h < F.lit(thr(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return (last if expr is None else expr.otherwise(last)).alias("split")


def hash_split(df: DataFrame, weights: dict[str, float], id_col: str = "doc_id",
               salt: str = "split", hash_flavor: str = "xxhash64") -> DataFrame:
    """df + a `split` column; weights normalized to fractions. Every row
    gets exactly one split (disjoint + exhaustive by construction)."""
    return df.withColumn(
        "split", split_assignment(id_col, weights, salt, hash_flavor)
    )


def stratified_sample(df: DataFrame, rates: dict[str, float], stratum_col: str,
                      default_rate: float = 0.0, id_col: str = "doc_id",
                      salt: str = "sample", hash_flavor: str = "xxhash64") -> DataFrame:
    """Keep each row with probability rates[stratum] (default_rate for
    strata not listed), deterministically by hash(salt, id). Rates ride in
    a CASE expression keyed on stratum_col -- no join, no shuffle; the
    filter is pushable right down onto the scan."""
    for k, r in {**rates, "__default__": default_rate}.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0,1], got {r}")
    h = _hash_col(id_col, salt, hash_flavor)
    thr = _hex_threshold if hash_flavor == "md5" else _i64_threshold
    expr = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == name
        expr = F.when(cond, F.lit(thr(r))) if expr is None else expr.when(cond, F.lit(thr(r)))
    cutoff = F.lit(thr(default_rate)) if expr is None else expr.otherwise(F.lit(thr(default_rate)))
    keep = h < cutoff
    # rate 1.0 must keep everything (threshold is capped at 2^64 - 1, which
    # excludes the single max hash value; OR the exact-1.0 case back in)
    full = None
    for name, r in rates.items():
        if r >= 1.0:
            c = F.col(stratum_col) == name
            full = c if full is None else full | c
    if default_rate >= 1.0:
        c = expr.isNull() if expr is not None else F.lit(True)
        full = c if full is None else full | c
    if full is not None:
        keep = keep | full
    return df.filter(keep)
