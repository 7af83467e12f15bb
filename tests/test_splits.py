"""hash_split / stratified_sample (operators/splits.py).

The load-bearing property is row-level determinism: a row's split (and
sample fate) is a function of (salt, id) alone, so appends, repartitions
and re-runs never migrate rows between splits -- the failure mode of
randomSplit(). Proportions are checked statistically (3-sigma bands),
stability exactly.
"""

import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators.splits import hash_split, stratified_sample

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module", params=["md5", "xxhash64"])
def flavor(request):
    return request.param


def _ids(spark, n, start=0):
    return spark.range(start, start + n).withColumnRenamed("id", "doc_id")


def test_split_disjoint_exhaustive_and_proportions(spark, flavor):
    n = 20_000
    out = hash_split(_ids(spark, n), WEIGHTS, hash_flavor=flavor)
    counts = dict(out.groupBy("split").count().collect())
    assert sum(counts.values()) == n and set(counts) == set(WEIGHTS)
    for name, w in WEIGHTS.items():
        # 3-sigma binomial band
        sigma = (w * (1 - w) / n) ** 0.5
        assert abs(counts[name] / n - w) < 3.5 * sigma, (name, counts)


def test_split_stable_under_append_and_repartition(spark, flavor):
    base = hash_split(_ids(spark, 1000), WEIGHTS, hash_flavor=flavor)
    grown = hash_split(_ids(spark, 3000).repartition(7), WEIGHTS, hash_flavor=flavor)
    joined = base.alias("a").join(
        grown.alias("b"), F.col("a.doc_id") == F.col("b.doc_id")
    )
    assert joined.filter(F.col("a.split") != F.col("b.split")).count() == 0


def test_split_salt_changes_assignment(spark, flavor):
    a = hash_split(_ids(spark, 5000), WEIGHTS, salt="s1", hash_flavor=flavor)
    b = hash_split(_ids(spark, 5000), WEIGHTS, salt="s2", hash_flavor=flavor)
    moved = (
        a.alias("a").join(b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"))
        .filter(F.col("a.split") != F.col("b.split")).count()
    )
    assert moved > 1000  # ~32% expected to move between independent hashes


def test_split_single_weight_and_validation(spark, flavor):
    out = hash_split(_ids(spark, 10), {"all": 1.0}, hash_flavor=flavor)
    assert out.filter(F.col("split") != "all").count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(_ids(spark, 1), {})
    with pytest.raises(ValueError, match="positive"):
        hash_split(_ids(spark, 1), {"a": 0.0, "b": 1.0})
    with pytest.raises(ValueError, match="hash_flavor"):
        hash_split(_ids(spark, 1), WEIGHTS, hash_flavor="sha1")


def test_stratified_rates_and_determinism(spark, flavor):
    n = 30_000
    df = _ids(spark, n).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    rates = {"en": 0.25, "de": 0.75}
    kept = stratified_sample(df, rates, "lang", hash_flavor=flavor)
    counts = dict(kept.groupBy("lang").count().collect())
    totals = dict(df.groupBy("lang").count().collect())
    for lang, r in rates.items():
        m = totals[lang]
        sigma = (r * (1 - r) / m) ** 0.5
        assert abs(counts[lang] / m - r) < 3.5 * sigma, (lang, counts, totals)
    again = stratified_sample(df, rates, "lang", hash_flavor=flavor)
    assert kept.exceptAll(again).count() == 0 and again.exceptAll(kept).count() == 0


def test_stratified_edge_rates(spark, flavor):
    df = _ids(spark, 500).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "keep").otherwise("drop")
    )
    kept = stratified_sample(df, {"keep": 1.0}, "lang", default_rate=0.0,
                             hash_flavor=flavor)
    assert kept.count() == 250
    assert kept.filter(F.col("lang") == "drop").count() == 0
    everything = stratified_sample(df, {}, "lang", default_rate=1.0,
                                   hash_flavor=flavor)
    assert everything.count() == 500
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(df, {"keep": 1.5}, "lang")


def test_split_plan_is_pure_projection(spark, flavor):
    plan = (
        hash_split(_ids(spark, 10), WEIGHTS, hash_flavor=flavor)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for op in ("Exchange", "Join", "ArrowEvalPython", "BatchEvalPython"):
        assert op not in plan, plan
