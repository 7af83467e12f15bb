"""SemDeDup semantics on known geometry + cluster-scoped-join plan pin."""

import numpy as np

from go_cdc_chunkers_spark.operators import similarity


def _emb_df(spark):
    """Two tight clusters + one outlier. Within-cluster cosine ~1 (same
    direction, different magnitude), cross-cluster ~0 (orthogonal)."""
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, [v * 1.0 for v in e1]),
        (1, [v * 2.0 for v in e1]),   # dup of 0
        (2, [v * 0.5 for v in e1]),   # dup of 0
        (10, [v * 1.0 for v in e2]),
        (11, [v * 3.0 for v in e2]),  # dup of 10
        (20, [0.5, 0.5, 0.5, 0.5]),   # cos 0.5 to both axes: kept at 0.9
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_greedy_by_id(spark):
    emb = _emb_df(spark)
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id int, centroid array<double>")
    out = {r["vec_id"]: r for r in
           similarity.semantic_dedup(emb, cents, threshold=0.9).collect()}
    assert len(out) == 6
    assert out[0]["keep"] and out[0]["dup_of"] == -1
    assert not out[1]["keep"] and out[1]["dup_of"] == 0
    assert not out[2]["keep"] and out[2]["dup_of"] == 0
    assert out[10]["keep"] and not out[11]["keep"]
    assert out[11]["dup_of"] == 10
    # the outlier assigns to SOME cluster but matches nothing at 0.9
    assert out[20]["keep"]


def test_semantic_dedup_cross_cluster_blindness(spark):
    """The method's documented approximation: duplicates split across
    cluster boundaries are NOT found (that is what makes it linear in
    cluster size, not corpus size). Pin it so the contract is explicit."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.05, 0.0, 0.0]), (1, [1.0, -0.05, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(1, [1.0, 0.1, 0.0, 0.0]), (2, [1.0, -0.1, 0.0, 0.0])],
        "centroid_id int, centroid array<double>")
    out = {r["vec_id"]: r for r in
           similarity.semantic_dedup(emb, cents, threshold=0.9).collect()}
    # near-identical vectors, but assigned to different centroids
    assert out[0]["centroid_id"] != out[1]["centroid_id"]
    assert out[0]["keep"] and out[1]["keep"]


def test_semantic_dedup_plan_cluster_scoped(spark):
    """The pair scan must be an equi-join keyed on centroid_id (cluster
    scoped), never a CartesianProduct; centroid assignment broadcasts."""
    emb = _emb_df(spark)
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id int, centroid array<double>")
    df = similarity.semantic_dedup(emb, cents)
    p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in p
    # the pair scan is the equi-join keyed on the cluster ids
    # (cluster-scoped enumeration) with the _lo < _hi ordering riding the
    # join condition; since the cosine moved into the vectorized Arrow
    # scorer (r06), the similarity threshold can no longer sit IN the join
    # condition -- it must instead be a Filter applied directly to the
    # scored struct (pruning pairs right after the ArrowEvalPython, before
    # any aggregate or further join)
    import re

    blocks = re.split(r"\n\(\d+\) ", p)
    pair = [b for b in blocks if b.startswith(("SortMergeJoin",
                                               "ShuffledHashJoin"))
            and re.search(r"Left keys \[\d+\]: \[centroid_id", b)
            and re.search(r"Join condition: \(_lo#\d+L? < _hi#\d+L?\)", b)]
    assert pair, "cluster-scoped pair-scan join not found"
    thresh = [b for b in blocks if b.startswith("Filter")
              and "0.35" in b and "pythonUDF" in b]
    assert thresh, "threshold filter not applied to the scored pairs"
