"""Sketch operators (operators/sketches.py): HLL cardinality and
bottom-k overlap.

Certifies (1) estimate accuracy against the theoretical error bound on
sets of known cardinality, (2) the mergeability contracts that make the
sketches incremental-store state (register MAX-merge == sketch of the
union; bottom-k union-merge == bottom-k of the union), (3) the
degenerate-exact regime (k >= |union| must reproduce exact overlap),
and (4) the plans: one partial-aggregated shuffle for registers, no
corpus sort for bottom-k (TakeOrderedAndProject).
"""
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators import sketches as S


def _vals(spark, lo, hi, name="v"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("val-"), F.col("id")).alias(name))


@pytest.mark.parametrize("mode", ["xxhash64", "md5"])
@pytest.mark.parametrize("n", [1000, 50_000, 300_000])
def test_hll_accuracy(spark, mode, n):
    """1.04/sqrt(4096) ~ 1.6% standard error; assert within 3 sigma
    (5%), covering both the linear-counting and raw-estimate regimes."""
    row = S.hll_distinct(_vals(spark, 0, n), "v", hash_mode=mode).first()
    assert abs(row["estimate"] - n) / n < 0.05, (mode, n, row)
    assert row["n_registers"] + row["v_zero"] == 4096


def test_hll_merge_equals_union(spark):
    a, b = _vals(spark, 0, 20_000), _vals(spark, 10_000, 30_000)
    merged = S.hll_merge(S.hll_registers(a, "v"), S.hll_registers(b, "v"))
    union = S.hll_registers(a.unionByName(b), "v")
    assert merged.exceptAll(union).count() == 0
    assert union.exceptAll(merged).count() == 0
    # and the estimate of the merge is the estimate of the union
    em = S.hll_estimate(merged).first()["estimate"]
    eu = S.hll_estimate(union).first()["estimate"]
    assert em == eu


def test_hll_binary_column_matches_hex_spelling(spark):
    """Binary columns are canonicalized to lowercase hex before md5
    (the oracle contract): registers must equal those of the hex
    strings."""
    raw = spark.range(500).select(F.sha2(F.col("id").cast("string"), 256)
                                  .alias("hx"))
    as_bin = raw.select(F.unhex("hx").alias("v"))
    as_hex = raw.select(F.lower(F.col("hx")).alias("v"))
    rb = S.hll_registers(as_bin, "v", hash_mode="md5")
    rh = S.hll_registers(as_hex, "v", hash_mode="md5")
    assert rb.exceptAll(rh).count() == 0 and rh.exceptAll(rb).count() == 0


def test_hll_empty_input(spark):
    empty = _vals(spark, 0, 0)
    row = S.hll_distinct(empty, "v").first()
    assert row["n_registers"] == 0 and row["v_zero"] == 4096
    # linear counting of V == m gives ln(1) = 0
    assert row["estimate"] == 0.0


@pytest.mark.parametrize("mode", ["xxhash64", "md5"])
def test_bottomk_overlap_estimate(spark, mode):
    """A = [0, 20k), B = [10k, 30k): true J = 1/3, containment = 1/2.
    k = 512 gives sigma ~ sqrt(J(1-J)/k) ~ 0.021; assert 4 sigma."""
    a, b = _vals(spark, 0, 20_000), _vals(spark, 10_000, 30_000)
    r = S.overlap_estimate(S.bottom_k(a, "v", 512, mode),
                           S.bottom_k(b, "v", 512, mode), 512).first()
    assert r["k_union"] == 512
    assert abs(r["jaccard_est"] - 1 / 3) < 0.09, r
    assert abs(r["containment_b_in_a"] - 0.5) < 0.12, r


def test_bottomk_merge_is_bottomk_of_union(spark):
    a, b = _vals(spark, 0, 5_000), _vals(spark, 2_500, 7_500)
    ka, kb = S.bottom_k(a, "v", 64), S.bottom_k(b, "v", 64)
    merged = (ka.unionByName(kb).distinct().orderBy("h").limit(64))
    direct = S.bottom_k(a.unionByName(b), "v", 64)
    assert [r["h"] for r in merged.collect()] == \
        [r["h"] for r in direct.collect()]


def test_bottomk_exact_when_k_covers_union(spark):
    """k >= |A union B| degenerates to exact Jaccard/containment."""
    a, b = _vals(spark, 0, 120), _vals(spark, 60, 180)
    r = S.overlap_estimate(S.bottom_k(a, "v", 256),
                           S.bottom_k(b, "v", 256), 256).first()
    assert r["k_union"] == 180
    assert r["n_both"] == 60
    assert r["jaccard_est"] == round(60 / 180, 6)
    assert r["containment_b_in_a"] == 0.5


def test_register_plan_single_partial_agg_shuffle(spark):
    """The register build must be ONE shuffle with map-side partial MAX
    (the <= 4096-rows-per-task scale contract) and stay whole-stage
    codegen (no Python in the hot path)."""
    plan = S.hll_registers(_vals(spark, 0, 1000), "v")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "partial_max" in plan or "partial" in plan.lower(), plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bottomk_plan_no_global_sort(spark):
    """bottom_k must compile to TakeOrderedAndProject (per-partition
    top-k + merge), never a full Sort of the corpus."""
    plan = S.bottom_k(_vals(spark, 0, 1000), "v", 32)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_unknown_hash_mode_raises(spark):
    df = _vals(spark, 0, 10)
    with pytest.raises(ValueError):
        S.hll_registers(df, "v", hash_mode="sha1")
    with pytest.raises(ValueError):
        S.bottom_k(df, "v", 8, hash_mode="sha1")
