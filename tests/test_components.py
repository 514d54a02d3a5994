"""Connected components / near-dup groups (ops/components.py)."""

from __future__ import annotations

import pytest

from cdc_connector_spark.ops.components import (
    connected_components,
    connected_components_star,
    neardup_groups,
)


def test_components_basic_transitivity(spark):
    # {1,2,3} via chain, {10,11} pair, {20,21,22,23} star on 20
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (20, 22), (20, 23)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_components_long_chain_and_reverse_edges(spark):
    # worst case for hash-min: a path graph, labels must flow the full
    # length; edges given in both orientations and descending order
    n = 12
    rows = [(i + 1, i) for i in range(n)]  # 12-11, 11-10, ... 1-0
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_components_budget_exhaustion_falls_back_to_star(spark):
    """A graph deeper than the hash-min budget no longer raises: the
    convergence guard hands off to the O(log n) star contraction and the
    answer is still exact."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components(pairs, max_iterations=1).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_star_contraction_converges_on_deep_chain(spark):
    """Verdict r5 #5 done-criterion: a 1000-node chain (diameter 999 —
    hash-min's worst case would need 999 rounds) converges within a small
    O(log n) budget with the non-convergence guard never tripping."""
    n = 1000
    pairs = spark.createDataFrame(
        [(i + 1, i) for i in range(n)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["comp"]
        for r in connected_components_star(pairs, max_iterations=15).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_neardup_groups_sizes_and_reps(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (100, 200)], "id_a long, id_b long"
    )
    rows = {r["id"]: (r["rep_id"], r["group_size"]) for r in neardup_groups(pairs).collect()}
    assert rows == {5: (5, 3), 9: (5, 3), 7: (5, 3), 100: (100, 2), 200: (100, 2)}


from hypothesis import given, settings, strategies as st  # noqa: E402

EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)),
    min_size=1,
    max_size=20,
).filter(lambda es: any(a != b for a, b in es))


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical rep = min node id in the component
    return {n: find(n) for n in parent}


@settings(max_examples=12, deadline=None)
@given(EDGES)
def test_components_match_union_find(spark, edges):
    """Distributed hash-min label propagation == sequential union-find with
    min-id canonical representatives, for ANY random multigraph (self-loops
    and duplicate/reversed edges included)."""
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    # every edge endpoint appears in the output, self-loop-only nodes included
    assert got == _union_find(edges)


@settings(max_examples=12, deadline=None)
@given(EDGES)
def test_star_contraction_matches_union_find(spark, edges):
    """Large-star/small-star reaches the SAME labeling as hash-min and
    union-find on any random multigraph — the two distributed variants are
    interchangeable, which is what lets the guard fall back silently."""
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components_star(pairs).collect()}
    assert got == _union_find(edges)


def test_canonical_survivorship_composition(spark):
    """The keep-one-per-family rule end-to-end on a planted corpus: the
    best-quality member survives, singletons pass through untouched."""
    import pyspark.sql.functions as F

    from cdc_connector_spark.ops.components import neardup_groups
    from cdc_connector_spark.ops.dedup import minhash_verified_pairs
    from cdc_connector_spark.ops.textstats import quality_score
    from pyspark.sql import Window

    base = "the quick brown fox jumps over the lazy dog and runs away fast today"
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1, slightly longer -> higher quality
        (3, "completely different words about shipping containers and ports"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = docs.select("doc_id", F.round(quality_score("text"), 6).alias("quality"))
    pairs = minhash_verified_pairs(docs, num_hashes=64, bands=32, jaccard_threshold=0.5)
    groups = neardup_groups(pairs)
    mem = groups.join(q, groups["id"] == q["doc_id"]).select(
        "doc_id", "rep_id", "group_size", "quality"
    )
    w = Window.partitionBy("rep_id").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    winners = (
        mem.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        .select("doc_id", "group_size")
    )
    singles = q.join(groups.select(F.col("id").alias("doc_id")), "doc_id", "left_anti")
    got = {r["doc_id"]: r["group_size"] for r in winners.collect()}
    assert got == {2: 2}  # doc 2 beats doc 1 on quality within the family
    assert {r["doc_id"] for r in singles.collect()} == {3}
