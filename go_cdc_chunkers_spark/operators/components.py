"""P10: connected components via hash-min label propagation on DataFrames.

Iterative: labels start as each vertex's own id; every round each vertex
takes the min label over itself and its neighbours; stop when no label
changed. Converges in O(diameter) rounds -- near-dup clusters are shallow
(star edges from the skew path make hot clusters diameter <= 2), so a few
rounds suffice; `max_iter` bounds the pathological chain.

Each round is: edges JOIN labels (shuffle on src) -> groupBy dst min
(shuffle on dst) -> outer-merge with labels. localCheckpoint() after each
round cuts the lineage so Catalyst does not re-plan an ever-growing DAG --
the classic iterative-DataFrame requirement (SURVEY.md section 4).

At 100 TB scale this is the standard large-star/small-star regime: both
shuffles are keyed by clip_id; pre-partitioning edges and labels on the same
key keeps rounds co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "clip_id",
    max_iter: int = 20,
) -> DataFrame:
    """vertices(id), edges(a, b) -> components(clip_id, component_id).

    component_id is the lexicographic min clip_id of the component."""
    labels = vertices.select(
        F.col(id_col).alias("clip_id"), F.col(id_col).alias("component_id")
    ).localCheckpoint()

    und = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )

    for _i in range(max_iter):
        neigh = (
            und.join(labels, und.src == labels.clip_id)
            .groupBy(F.col("dst").alias("clip_id"))
            .agg(F.min("component_id").alias("_n"))
        )
        merged = (
            labels.join(neigh, "clip_id", "left")
            .select(
                "clip_id",
                F.least(
                    F.col("component_id"), F.coalesce(F.col("_n"), F.col("component_id"))
                ).alias("component_id"),
                (
                    F.coalesce(F.col("_n"), F.col("component_id"))
                    < F.col("component_id")
                ).alias("_changed"),
            )
        ).localCheckpoint()
        changed = merged.filter(F.col("_changed")).limit(1).count()
        labels = merged.drop("_changed")
        if changed == 0:
            break
    return labels


def dup_pairs_from_components(components: DataFrame) -> DataFrame:
    """All intra-component pairs (a < b) -- the relation the recall gate
    scores. Quadratic per component by definition; only used on verified
    clusters (small) and in tests."""
    l = components.select(F.col("component_id"), F.col("clip_id").alias("a"))
    r = components.select(F.col("component_id"), F.col("clip_id").alias("b"))
    return (
        l.join(r, "component_id")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
