"""Connected components over a pair graph — near-dup GROUPS, not just pairs.

Every near-dup generator in ops/dedup.py emits PAIRS (id_a, id_b). Actual
deduplication needs the transitive closure: if A~B and B~C, then {A,B,C} is
one duplicate group and exactly one representative survives. This module
closes that gap with a distributed hash-min label propagation:

    label(v) := min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Each iteration is ONE join of the label frame against
the (small, static) edge frame + one aggregation — two shuffles over frames
of longs. Convergence takes O(graph diameter) rounds; near-dup graphs are
dense clique-ish clusters (diameter 2-3 in practice), so the loop runs 3-5
times, not log(n). Lineage is cut per round (localCheckpoint) so the plan
does not grow with iterations — the standard Spark pattern for iterative
graph algorithms. For adversarial long-chain graphs at extreme scale the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) converges in O(log n) rounds; hash-min is
chosen here because dedup graphs are shallow and it needs half the shuffles
per round.

The per-round driver `.count()` reads ONE scalar (changed-label count) —
it is the loop-termination test, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id_a, id_b) undirected pair graph → (id, component) where component
    is the MINIMUM node id reachable — a canonical representative.

    Only nodes that appear in at least one pair are returned (isolated docs
    are their own trivial component; callers left-join and coalesce).
    Raises if the graph has not converged after ``max_iterations`` — a
    signal the graph is pathologically deep, not clique-ish, and the
    large-star/small-star variant should be used instead.
    """
    spark = pairs.sparkSession
    # undirected: keep both orientations so min labels flow both ways
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)  # static; computed once

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # min label among neighbors, then min with own label
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias("comp"),
                (F.col("nmin") < F.col("comp")).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels.select("id", "comp")
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds — "
        "graph diameter exceeds the hash-min budget; use a star-contraction variant"
    )


def neardup_groups(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pair graph → (id, rep_id, group_size): each duplicated doc
    with its group's canonical representative (minimum id) and the group
    size. Feeding any ops/dedup pair generator through this yields the
    keep-one-per-group dedup decision: keep rows where id == rep_id (plus
    all docs never seen in a pair)."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("group_size"))
    return comp.join(sizes, "comp").select(
        F.col("id"), F.col("comp").alias("rep_id"), "group_size"
    )
