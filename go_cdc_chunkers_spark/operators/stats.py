"""Q1-Q9: quality / statistics operators over the chunks relation.

Each mirrors one measurement of the reference's cdc tool:
  - measure / analyze (cmd/cdc/stats.go:122-155, analyze.go:24-56):
    totals + cross-corpus unique-chunk aggregate -> one metrics row.
  - dedupRatio (stats.go:74-79): uniqueBytes/totalBytes, lower better.
  - distribution (stats.go:91-116): min/p50/avg/p95/max/stddev of chunk
    lengths with the reference's exact index-based percentiles
    (sorted[n*50/100], sorted[n*95/100]), population stddev, truncated avg.
  - compare (cmd/cdc/compare.go:24-59): A/B deltas + regression gate
    (candidate dedup ratio worse than baseline by > tol fails).
  - resync (cmd/cdc/resync.go:82-102): fraction of the edited corpus's bytes
    carried by chunks whose digest already exists in the original corpus.
  - dedup-sweep (cmd/cdcplot/main.go:313-339): dedupRatio at avg sizes,
    min=avg/4 max=avg*8.
  - histogram / CDF (cmd/cdcplot/main.go:262-285,341-365).

Scale notes: the exact distribution uses a global sort (row_number over an
un-partitioned window) to match the reference/oracle bit-for-bit -- correct
at test scale, a bottleneck at 100 TB. distribution_approx() is the scale
path (percentile_approx sketch, one pass, mergeable). Same pattern as the
reference replacing the full sort with a sketch would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def measure(chunks: DataFrame) -> DataFrame:
    """One metrics row per algo: chunk/byte totals + unique-by-digest totals
    (the reference's map[[32]byte]struct{} hash aggregate, stats.go:130-148,
    here a distinct-aggregate Catalyst plans as two-phase hash agg)."""
    totals = chunks.groupBy("algo").agg(
        F.count("*").alias("n_chunks"),
        F.sum("length").alias("total_bytes"),
    )
    uniq = (
        chunks.select("algo", "chunk_hash", "length")
        .dropDuplicates(["algo", "chunk_hash"])
        .groupBy("algo")
        .agg(
            F.count("*").alias("unique_chunks"),
            F.sum("length").alias("unique_bytes"),
        )
    )
    return (
        totals.join(uniq, "algo")
        .withColumn(
            "dedup_ratio",
            F.when(F.col("total_bytes") == 0, F.lit(0.0)).otherwise(
                F.col("unique_bytes") / F.col("total_bytes")
            ),
        )
    )


def distribution(chunks: DataFrame) -> DataFrame:
    """Exact reference distribution per algo (stats.go:91-116)."""
    w = Window.partitionBy("algo").orderBy("length")
    ranked = chunks.select("algo", "length").withColumn(
        "rn", F.row_number().over(w)
    )
    counted = ranked.withColumn(
        "n", F.count("*").over(Window.partitionBy("algo"))
    )
    # Go indexes sorted[n*50/100] with integer division, 0-based -> 1-based rn.
    i50 = F.floor((F.col("n") * 50) / 100) + 1
    i95 = F.floor((F.col("n") * 95) / 100) + 1
    p50 = counted.filter(F.col("rn") == i50).groupBy("algo").agg(
        F.min("length").alias("p50")
    )
    p95 = counted.filter(F.col("rn") == i95).groupBy("algo").agg(
        F.min("length").alias("p95")
    )
    base = chunks.groupBy("algo").agg(
        F.min("length").alias("min_len"),
        F.max("length").alias("max_len"),
        F.floor(F.avg("length")).cast("long").alias("avg_len"),
        F.coalesce(F.stddev_pop("length"), F.lit(0.0)).alias("stddev_len"),
        F.count("*").alias("n_chunks"),
    )
    return base.join(p50, "algo", "left").join(p95, "algo", "left")


def distribution_approx(chunks: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Scale path: sketch percentiles, single pass, no global sort."""
    return chunks.groupBy("algo").agg(
        F.min("length").alias("min_len"),
        F.percentile_approx("length", 0.5, accuracy).alias("p50"),
        F.floor(F.avg("length")).cast("long").alias("avg_len"),
        F.percentile_approx("length", 0.95, accuracy).alias("p95"),
        F.max("length").alias("max_len"),
        F.coalesce(F.stddev_pop("length"), F.lit(0.0)).alias("stddev_len"),
        F.count("*").alias("n_chunks"),
    )


def compare(baseline: DataFrame, candidate: DataFrame, tolerance: float = 0.02) -> DataFrame:
    """A/B comparison + regression gate (compare.go:24-59): fails (regressed
    = true) when the candidate's dedup ratio is worse than baseline by more
    than `tolerance` (absolute, like the reference's 2%)."""
    b = baseline.select(
        F.col("algo").alias("baseline_algo"),
        F.col("dedup_ratio").alias("baseline_ratio"),
        F.col("n_chunks").alias("baseline_chunks"),
    )
    c = candidate.select(
        F.col("algo").alias("candidate_algo"),
        F.col("dedup_ratio").alias("candidate_ratio"),
        F.col("n_chunks").alias("candidate_chunks"),
    )
    return b.crossJoin(c).withColumn(
        "ratio_delta", F.col("candidate_ratio") - F.col("baseline_ratio")
    ).withColumn("regressed", F.col("ratio_delta") > F.lit(tolerance))


def resync_shared(orig_chunks: DataFrame, edited_chunks: DataFrame) -> DataFrame:
    """resync.go:82-102: edited-corpus bytes covered by original digests.
    left_semi join on chunk_hash (broadcastable when the original chunk-hash
    set is small; Catalyst/AQE picks the strategy)."""
    covered = (
        edited_chunks.join(
            orig_chunks.select("chunk_hash").distinct(), "chunk_hash", "left_semi"
        )
        .agg(F.coalesce(F.sum("length"), F.lit(0)).alias("shared_bytes"))
    )
    total = edited_chunks.agg(F.sum("length").alias("total_bytes"))
    return covered.crossJoin(total).withColumn(
        "shared_pct",
        F.when(F.col("total_bytes") == 0, F.lit(0.0)).otherwise(
            F.col("shared_bytes") / F.col("total_bytes")
        ),
    )


def dedup_sweep(df: DataFrame, algorithm: str, avg_sizes: list[int], chunker) -> DataFrame:
    """cdcplot dedup-sweep (main.go:313-339): dedupRatio at avg sizes with
    min=avg/4, max=avg*8. `chunker` is operators.chunking.chunk_clips; one
    union of per-size measure() rows tagged by avg_size."""
    from ..cdc.opts import ChunkerOpts

    out = None
    for avg in avg_sizes:
        opts = ChunkerOpts(min_size=avg // 4, normal_size=avg, max_size=avg * 8)
        m = measure(chunker(df, algorithm, opts)).withColumn(
            "avg_size", F.lit(avg)
        )
        out = m if out is None else out.unionByName(m)
    return out


def length_histogram(chunks: DataFrame, n_bins: int = 60) -> DataFrame:
    """cdcplot histogram (main.go:341-365): fixed-width bins over [min, max]."""
    bounds = chunks.groupBy("algo").agg(
        F.min("length").alias("lo"), F.max("length").alias("hi")
    )
    binned = (
        chunks.join(F.broadcast(bounds), "algo")
        .withColumn(
            "bin_width",
            F.greatest((F.col("hi") - F.col("lo")) / n_bins, F.lit(1.0)),
        )
        .withColumn(
            "bin",
            F.least(
                F.floor((F.col("length") - F.col("lo")) / F.col("bin_width")),
                F.lit(n_bins - 1),
            ).cast("int"),
        )
    )
    return binned.groupBy("algo", "bin").agg(F.count("*").alias("n")).orderBy("algo", "bin")


def length_cdf(chunks: DataFrame) -> DataFrame:
    """cdcplot CDF (main.go:262-285): cumulative fraction at each distinct
    length (cume_dist window)."""
    w = Window.partitionBy("algo").orderBy("length")
    return (
        chunks.select("algo", "length")
        .withColumn("cdf", F.cume_dist().over(w))
        .groupBy("algo", "length")
        .agg(F.max("cdf").alias("cdf"))
        .orderBy("algo", "length")
    )
