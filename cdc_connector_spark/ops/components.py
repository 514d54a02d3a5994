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
graph algorithms.

For adversarial DEEP graphs (chains, long paths — diameter ≫ the round
budget) ``connected_components_star`` implements the two-phase
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14), which converges in O(log n) rounds
regardless of diameter; ``connected_components`` falls back to it
automatically when hash-min exhausts its budget, so callers never see the
depth distinction. Hash-min stays the first choice because dedup graphs
are shallow and it needs half the shuffles per round.

The per-round driver `.count()` reads ONE scalar (changed-label /
changed-edge count) — it is the loop-termination test, not a data collect.
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
    If the graph has not converged after ``max_iterations`` — a signal it
    is pathologically deep, not clique-ish — the computation FALLS BACK to
    the O(log n) large-star/small-star contraction instead of failing.
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
    # diameter exceeds the hash-min budget: switch to the depth-independent
    # star contraction rather than raising (its round count is O(log n))
    return connected_components_star(pairs, id_a, id_b)


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 40,
) -> DataFrame:
    """Two-phase large-star/small-star connected components (Kiveris et
    al., SoCC'14): same contract as ``connected_components`` — (id, comp)
    with comp = minimum reachable id, nodes drawn from the pair graph —
    but convergence is O(log n) ROUNDS REGARDLESS OF GRAPH DIAMETER, the
    variant for adversarially deep graphs (a 1000-node chain converges in
    ~6 rounds where hash-min needs 999).

    Each round is two phases over the edge frame only (no separate label
    frame):

    - **large-star**: every node links its strictly-larger neighbors to
      the minimum of its closed neighborhood — long chains fold onto
      local minima in parallel;
    - **small-star**: every node links its smaller-or-equal neighbors
      (and itself) to that minimum — stars flatten.

    Both phases are a groupBy-min plus one join over (long, long) edges;
    the edge set only shrinks toward the final star forest, so per-round
    cost DECREASES as components contract. Fixpoint = the edge set is
    exactly (node → component-min) for every non-root node; roots are the
    nodes never appearing on the large side. Termination test is an exact
    set compare (subtract + two scalar counts), not a probabilistic hash.
    """
    edges0 = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    # node set from the UNFILTERED pairs: a node seen only in a self-loop
    # is still its own component (hash-min parity)
    nodes = (
        edges0.select(F.col("u").alias("id"))
        .unionByName(edges0.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical undirected form: (u, v) with u > v, self-loops dropped
    edges = (
        edges0.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    if n_edges == 0:
        return nodes.select("id", F.col("id").alias("comp"))
    converged = False
    for _ in range(max_iterations):
        # large-star: m(x) = min over closed neighborhood of x; every
        # neighbor y > x re-links to m(x). Output keeps u > v orientation
        # by construction (y > x >= m(x)).
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("nmin"))
        mins = mins.select("u", F.least(F.col("u"), F.col("nmin")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: with edges oriented high->low, m(x) = min low
        # neighbor of x; every low neighbor and x itself link to m(x).
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(
                mins2.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_next = small.count()
        if n_next == n_edges and small.subtract(edges).count() == 0:
            edges = small
            converged = True
            break
        edges, n_edges = small, n_next
    if not converged:
        # 40 rounds covers n ≈ 2^40 nodes; reaching here means a logic bug,
        # not a big graph — fail loudly rather than return a non-star set
        raise RuntimeError(
            f"star contraction did not converge in {max_iterations} rounds"
        )
    # fixpoint edge set is the star forest: non-roots point at their
    # component min; roots never appear on the large side
    labels = edges.groupBy("u").agg(F.min("v").alias("comp")).select(
        F.col("u").alias("id"), "comp"
    )
    roots = nodes.join(labels, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    return labels.unionByName(roots)


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
