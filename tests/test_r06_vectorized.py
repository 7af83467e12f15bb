"""r06 optimization round: the Arrow-vectorized scorers must be
BIT-IDENTICAL to the pure-expression forms they replaced.

Three pins:
  - the Python XXH64 port (similarity.xxhash64_int) against Spark's own
    F.xxhash64 for IntegerType chains;
  - hyperplane_sketch (vectorized) against _hyperplane_sketch_expr (the
    original interpreted-lambda form), including odd dims and nulls;
  - score_pairs_cosine against cosine_expr on random and adversarial
    (exact-tie) inputs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from go_cdc_chunkers_spark.session import get_spark

    s = get_spark(app="test-r06-vec", cpus=4, shuffle_partitions=4)
    yield s


def test_xxhash64_int_port_matches_spark(spark):
    rows = spark.range(64).select(
        F.col("id").cast("int").alias("i"),
        F.xxhash64(F.lit(7), F.col("id").cast("int")).alias("h2"),
        F.xxhash64(F.lit(3), F.lit(9), F.col("id").cast("int")).alias("h3"),
    ).collect()
    M = (1 << 64) - 1
    for r in rows:
        h0 = similarity.xxhash64_int(7, 42)
        assert similarity.xxhash64_int(r.i, h0) == r.h2 & M
        h1 = similarity.xxhash64_int(9, similarity.xxhash64_int(3, 42))
        assert similarity.xxhash64_int(r.i, h1) == r.h3 & M


@pytest.mark.parametrize("dim", [8, 64, 65])
def test_hyperplane_sketch_matches_expression_form(spark, dim):
    rng = np.random.default_rng(dim)
    vecs = rng.standard_normal((40, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.sketch
           for r in similarity.hyperplane_sketch(df, seed=7).collect()}
    want = {r.vec_id: r.sketch
            for r in similarity._hyperplane_sketch_expr(df, seed=7).collect()}
    assert got == want


def test_hyperplane_sketch_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -2.0]), (1, None), (2, [])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.sketch
           for r in similarity.hyperplane_sketch(df).collect()}
    want = {r.vec_id: r.sketch
            for r in similarity._hyperplane_sketch_expr(df).collect()}
    assert got == want
    assert got[1] == 0 and got[2] == 0


def test_score_pairs_cosine_matches_expression(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    # (A zero/near-zero vector raises DIVIDE_BY_ZERO under ANSI in BOTH
    # forms -- the division expression is shared -- so it is not a
    # divergence case; exact-tie rounding is pinned separately below.)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    a = df.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    fast = similarity.score_pairs_cosine(pairs, "va", "vb", "c")
    slow = pairs.withColumn(
        "c", similarity.cosine_expr(F.col("va"), F.col("vb"))
    ).drop("va", "vb")
    got = {(r.ia, r.ib): r.c for r in fast.collect()}
    want = {(r.ia, r.ib): r.c for r in slow.collect()}
    assert got == want  # None == None included


def test_half_up_rounding_matches_spark_round(spark):
    """The dots UDF rounds each scaled term with floor(t+0.5)/ceil(t-0.5);
    Spark's round() is BigDecimal HALF_UP. Pin equality on exact ties and
    near-ties (numpy's default rint is HALF_EVEN and would fail this)."""
    import numpy as np

    vals = [2.5, 3.5, -2.5, -3.5, 0.5, -0.5, 2.4999999999999996,
            4503599627370494.5, 1e12 + 0.5, -(1e12 + 0.5)]
    df = spark.createDataFrame([(v,) for v in vals], "t double")
    want = {r.t: r.r for r in df.select(
        "t", F.round(F.col("t")).cast("long").alias("r")).collect()}

    def half_up(t):
        t = np.asarray(t, dtype=np.float64)
        return np.where(t >= 0, np.floor(t + 0.5),
                        np.ceil(t - 0.5)).astype(np.int64)

    for v in vals:
        assert int(half_up([v])[0]) == want[v], v
