"""P10: connected components via hash-min label propagation with pointer
doubling on DataFrames.

Each round does two things:
  1. neighbour-min: every vertex takes the min label over itself and its
     neighbours (edges JOIN labels, groupBy min);
  2. pointer doubling (path shortcutting): label(u) <- label(label(u)).
     Labels are always existing vertex ids (they start as own-id and only
     ever propagate mins of ids), so the label table doubles as a parent
     forest with parent <= child; one extra self-join per round halves
     every path's depth.

Neighbour-min alone converges in O(diameter) rounds -- a 1000-hop duplicate
chain would need 1000 shuffle rounds and round-1's max_iter=20 silently
returned split components. With shortcutting the combination converges in
O(log n) rounds (Shiloach-Vishkin style); the >20-hop chain test pins the
round count. Non-convergence at max_iter now RAISES instead of returning
wrong labels.

Each round is: edges JOIN labels (shuffle on src) -> groupBy dst min
(shuffle on dst) -> outer-merge with labels -> label-table self-join.
localCheckpoint() after each round cuts the lineage so Catalyst does not
re-plan an ever-growing DAG -- the classic iterative-DataFrame requirement
(SURVEY.md section 4).

Lineage cut has two flavors. localCheckpoint (default) caches on
executors: fastest, but partitions die with an executor, and one
local-mode scheduler race was observed hanging its eager materialization
job (everything idle, DAG event loop parked -- Spark-internal, not
reproducible on demand). checkpoint_dir=... round-trips each round's
label table through parquet instead: durable against executor loss (the
right call on a preemptible 1000-executor cluster), restartable
mid-computation, and independent of RDD checkpoint machinery. Labels are
2 narrow columns x n_vertices, so the per-round write is small next to
the round's own shuffles; the pipeline passes its workdir automatically.

At 100 TB scale all shuffles are keyed by clip_id; pre-partitioning edges
and labels on the same key keeps rounds co-partitioned, and the O(log n)
round bound keeps the sequential-shuffle count ~30 even at 10^12 vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Connected components did not converge within max_iter rounds."""


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "clip_id",
    max_iter: int = 50,
    return_rounds: bool = False,
    checkpoint_dir: str | None = None,
):
    """vertices(id), edges(a, b) -> components(clip_id, component_id).

    component_id is the lexicographic min clip_id of the component.
    Raises ConvergenceError if labels are still changing after max_iter
    rounds (never returns silently wrong labels). checkpoint_dir switches
    the per-round lineage cut from executor-memory localCheckpoint to a
    durable parquet round-trip under that directory (see module
    docstring); labels are identical either way."""
    if checkpoint_dir is not None:
        import os
        import shutil
        import threading

        os.makedirs(checkpoint_dir, exist_ok=True)
        spark = vertices.sparkSession
        seq = [0]
        seq_lock = threading.Lock()
        # The two init cuts (cc_001/cc_002: initial labels + undirected
        # edges, the latter re-read EVERY round) must live for the whole
        # computation; label merges (cc_003+) are each fully consumed by
        # the next round's write, so only the newest is needed for
        # restart. Without reclamation a 10^12-vertex run would hold ~30
        # rounds x the full label table. (The init cuts run from a thread
        # pool, so sequence assignment is locked; which init table lands
        # as cc_001 vs cc_002 is immaterial -- reclamation only
        # distinguishes init files, seq <= 2, from merge files.)
        prev_merge = [None]

        def _cut(df: DataFrame) -> DataFrame:
            with seq_lock:
                seq[0] += 1
                mine = seq[0]
            p = os.path.join(checkpoint_dir, f"cc_{mine:03d}.parquet")
            df.write.mode("overwrite").parquet(p)
            if mine > 2:
                if prev_merge[0] is not None:
                    shutil.rmtree(prev_merge[0], ignore_errors=True)
                prev_merge[0] = p
            return spark.read.parquet(p)
    else:
        def _cut(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    # The two init cuts (label table, undirected-deduped edge table) are
    # independent writes -- materialize them concurrently so one write's
    # task tail back-fills the other's idle cores instead of paying two
    # serial job latencies. Threads matter only for the wall clock; the
    # cut files and everything downstream are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    lbl0 = vertices.select(
        F.col(id_col).alias("clip_id"), F.col(id_col).alias("component_id"))
    und0 = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_lbl = pool.submit(_cut, lbl0)
        f_und = pool.submit(_cut, und0)
        labels = f_lbl.result()
        und = f_und.result()

    def _step(lbl: DataFrame) -> DataFrame:
        """One propagation step (neighbour-min + pointer doubling) ->
        labels + a per-row _changed flag."""
        neigh = (
            und.join(lbl, und.src == lbl.clip_id)
            .groupBy(F.col("dst").alias("clip_id"))
            .agg(F.min("component_id").alias("_n"))
        )
        merged = lbl.join(neigh, "clip_id", "left").select(
            "clip_id",
            F.least(
                F.col("component_id"), F.coalesce(F.col("_n"), F.col("component_id"))
            ).alias("component_id"),
            (
                F.coalesce(F.col("_n"), F.col("component_id")) < F.col("component_id")
            ).alias("_changed"),
        )
        # pointer doubling: component_id <- label(component_id)
        parents = merged.select(
            F.col("clip_id").alias("_p"), F.col("component_id").alias("_gp")
        )
        return (
            merged.join(parents, merged.component_id == parents._p, "left")
            .select(
                "clip_id",
                F.coalesce(F.col("_gp"), F.col("component_id")).alias("component_id"),
                (
                    F.col("_changed")
                    | (F.coalesce(F.col("_gp"), F.col("component_id"))
                       < F.col("component_id"))
                ).alias("_changed"),
            )
        )

    rounds = 0
    converged = False
    while rounds < max_iter:
        # Fuse up to two propagation steps into ONE materialization: the
        # label sequence is identical (same operations, just not
        # materialized between the steps), but barriers, lineage cuts and
        # (on the durable path) parquet write+read round trips halve. On a
        # 1000-executor cluster each avoided cut is a full-cluster barrier;
        # at sandbox scale it halves the stage's job-submission floor.
        # `rounds` counts STEPS so max_iter keeps its meaning.
        n_steps = min(2, max_iter - rounds)
        merged = _step(labels)
        if n_steps == 2:
            merged = _step(merged.drop("_changed"))
        rounds += n_steps
        # convergence signal piggybacks on the cut's own materialization
        # job via observe() -- it fires under BOTH eager localCheckpoint
        # and the parquet write, so no second job (and, on the durable
        # path, no re-scan of the label table just to probe _changed).
        # Only the LAST fused step's _changed matters: if the final step
        # moved no label, the table is a fixed point of the propagation
        # operator and further rounds are no-ops.
        obs = Observation(f"cc_changed_{rounds}")
        merged = merged.observe(
            obs, F.sum(F.col("_changed").cast("long")).alias("n"))
        merged = _cut(merged)
        changed = int(obs.get["n"] or 0)
        labels = merged.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels would be wrong -- raise max_iter or inspect the edge graph"
        )
    if return_rounds:
        return labels, rounds
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


def merge_components(
    prev: DataFrame,
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 50,
) -> DataFrame:
    """Incremental connected components: fold NEW vertices + edges into a
    PREVIOUS labeling without re-clustering the old corpus.

    At 10^12 clips a nightly full `connected_components` re-run costs
    O(corpus) per night; this costs O(#old components + delta). The trick
    is exact graph contraction: every previous component is already
    connected, so it can be represented by its label alone. New edges are
    mapped through the old labels (an endpoint inside an old component
    becomes that component's label; unlabeled endpoints stay themselves),
    CC runs on the contracted graph (old labels + new vertices only), and
    old members inherit their component's new label by one join.

    Labels remain IDENTICAL to a full re-run over the union graph: an old
    label is the min clip_id of its old component, so the hash-min of a
    merged contracted component is min(old labels, new ids) = the global
    min clip_id. Pinned by test_merge_components_equals_full_rerun.

    prev: (clip_id, component_id) -- a completed labeling. vertices/edges:
    the NEW clips and ALL newly discovered edges (either endpoint may be
    old or new)."""
    lbl_a = prev.select(F.col("clip_id").alias("a"), F.col("component_id").alias("_la"))
    lbl_b = prev.select(F.col("clip_id").alias("b"), F.col("component_id").alias("_lb"))
    contracted_edges = (
        edges.join(lbl_a, "a", "left")
        .join(lbl_b, "b", "left")
        .select(
            F.coalesce("_la", F.col("a")).alias("a"),
            F.coalesce("_lb", F.col("b")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    old_labels = prev.select(F.col("component_id").alias("clip_id")).distinct()
    new_only = vertices.select("clip_id").join(
        prev.select("clip_id"), "clip_id", "left_anti")
    contracted_vertices = old_labels.unionByName(new_only).distinct()

    sub = connected_components(
        contracted_vertices, contracted_edges, max_iter=max_iter)

    relabel = sub.select(
        F.col("clip_id").alias("component_id"), F.col("component_id").alias("_new")
    )
    old = prev.join(relabel, "component_id").select(
        "clip_id", F.col("_new").alias("component_id"))
    new = new_only.join(sub, "clip_id").select("clip_id", "component_id")
    return old.unionByName(new)
