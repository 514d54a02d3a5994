"""ops/cluster.py — deterministic distributed k-means + SemDedup.

Cross-engine value verification lives in the driver oracle
(`kmeans_clusters_embeddings`, `semdedup_pairs_embeddings`); these tests pin
the algorithmic invariants: planted-cluster recovery, the deterministic
init/tie-break/empty-cluster rules, and the SemDedup pair semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

from cdc_connector_spark.ops.cluster import (
    kmeans_assign,
    kmeans_clusters,
    kmeans_fit,
    kmeans_init,
    oversized_clusters,
    semdedup_pairs,
    semdedup_prune,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


@pytest.fixture(scope="module")
def planted(spark):
    """Three tight, well-separated blobs; ids interleaved across blobs so
    partition order ≠ cluster order."""
    rng = np.random.default_rng(11)
    centers = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [0.0, 10.0, 10.0]])
    rows = []
    for i in range(60):
        c = i % 3
        rows.append((i, centers[c] + rng.normal(0, 0.05, 3)))
    return _emb_df(spark, rows), centers


def test_kmeans_recovers_planted_blobs(spark, planted):
    df, centers = planted
    out = kmeans_clusters(df, k=3, iters=5).toPandas()
    assert len(out) == 60
    # every blob lands in exactly one cluster and clusters don't mix
    by_blob = {b: set(out[out.vec_id % 3 == b].cluster_id) for b in range(3)}
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set().union(*by_blob.values())) == 3
    # fitted centroids sit on the planted centers
    C = kmeans_fit(df, k=3, iters=5)
    d = np.linalg.norm(C[:, None, :] - centers[None, :, :], axis=2).min(axis=1)
    assert (d < 0.1).all()


def test_init_is_lowest_ids_in_order(spark, planted):
    df, _ = planted
    C = kmeans_init(df, k=3)
    expected = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in df.filter("vec_id < 3").collect()
    }
    for i in range(3):
        assert np.allclose(C[i], expected[i], atol=1e-6)


def test_empty_cluster_keeps_previous_centroid_and_ties_go_low(spark):
    # all three seeds identical -> every point ties -> argmin picks cluster
    # 0; clusters 1 and 2 empty out and must KEEP their previous centroid
    rows = [(i, [1.0, 1.0]) for i in range(3)] + [
        (i, [5.0, 5.0]) for i in range(3, 7)
    ]
    df = _emb_df(spark, rows)
    C = kmeans_fit(df, k=3, iters=1)
    assert np.allclose(C[1], [1.0, 1.0]) and np.allclose(C[2], [1.0, 1.0])
    # cluster 0 absorbed everything: mean of all 7 points
    assert np.allclose(C[0], np.mean([r[1] for r in rows], axis=0))
    assigned = kmeans_assign(df, C).toPandas()
    assert set(assigned.cluster_id) <= {0, 1, 2}


def test_assign_distances_rounded_and_exact(spark):
    df = _emb_df(spark, [(0, [0.0, 0.0]), (1, [3.0, 4.0])])
    C = np.array([[0.0, 0.0], [3.0, 0.0]])
    out = kmeans_assign(df, C).orderBy("vec_id").toPandas()
    assert out.cluster_id.tolist() == [0, 1]
    assert out.sq_dist.tolist() == [0.0, 16.0]


def test_semdedup_finds_within_cluster_neardup_only(spark):
    rng = np.random.default_rng(5)
    base_a = rng.normal(0, 1, 16)
    base_b = -base_a  # opposite cluster, cosine -1 vs a
    rows = [
        (0, base_a),
        (1, base_a + rng.normal(0, 0.01, 16)),  # near-dup of 0
        (2, base_b),
        (3, base_b * 1.5 + rng.normal(0, 0.01, 16)),  # near-dup of 2
        (4, rng.normal(0, 1, 16) * 3),  # loner
        (5, rng.normal(0, 1, 16) * 3),
    ]
    df = _emb_df(spark, rows)
    pairs = semdedup_pairs(df, k=2, iters=4, threshold=0.95).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (0, 1) in got and (2, 3) in got
    # no cross-cluster / non-dup pairs at this threshold
    assert got == {(0, 1), (2, 3)}
    assert (pairs.cos_sim >= 0.95).all()


def test_semdedup_prune_keeps_lowest_id(spark):
    rng = np.random.default_rng(9)
    v = rng.normal(0, 1, 8)
    rows = [(0, v), (1, v * 1.001), (2, v * 0.999), (3, -v)]
    df = _emb_df(spark, rows)
    kept = semdedup_prune(df, k=1, iters=2, threshold=0.99)
    assert sorted(r["vec_id"] for r in kept.select("vec_id").collect()) == [0, 3]


def test_semdedup_max_cluster_guard(spark):
    rows = [(i, [1.0, float(i % 2)]) for i in range(10)]
    df = _emb_df(spark, rows)
    with pytest.raises(Exception, match="max_cluster"):
        semdedup_pairs(df, k=1, iters=1, max_cluster=5).collect()


def test_semdedup_oversize_subsample_keeps_core_pairs(spark):
    # one mega-cluster (k=1): 2 near-dup pairs — one in the dense core near
    # the centroid, one far out in the tail. With max_cluster below the
    # cluster size, policy="subsample" keeps the max_cluster members CLOSEST
    # to the centroid: the core pair survives, the tail pair is the explicit
    # recall trade, and nothing raises.
    rng = np.random.default_rng(21)
    core = rng.normal(0, 0.1, 8)
    far = core + 50.0  # same direction-ish but far from the mean
    rows = [
        (0, core),
        (1, core * 1.0001),  # core near-dup pair (0,1)
        (2, far),
        (3, far * 1.0001),  # tail near-dup pair (2,3)
    ] + [(i, rng.normal(0, 0.1, 8)) for i in range(4, 10)]
    df = _emb_df(spark, rows)
    with pytest.raises(Exception, match="max_cluster"):
        semdedup_pairs(df, k=1, iters=2, threshold=0.99, max_cluster=8).collect()
    pairs = semdedup_pairs(
        df, k=1, iters=2, threshold=0.99, max_cluster=8,
        oversize_policy="subsample",
    ).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (0, 1) in got  # dense-core pair survives the cut
    assert (2, 3) not in got  # tail pair is the documented trade
    # full-recall run (no cap) finds both — proves the cut is the only delta
    full = semdedup_pairs(df, k=1, iters=2, threshold=0.99).toPandas()
    full_pairs = {(a, b) for a, b in zip(full.id_a, full.id_b)}
    assert {(0, 1), (2, 3)} <= full_pairs
    assert got <= full_pairs


def test_oversized_clusters_audit(spark):
    rows = [(i, [1.0, 0.0]) for i in range(7)] + [(i, [0.0, 1.0]) for i in range(7, 10)]
    df = _emb_df(spark, rows)
    C = np.array([[1.0, 0.0], [0.0, 1.0]])
    assigned = kmeans_assign(df, C)
    audit = oversized_clusters(assigned, max_cluster=5).toPandas()
    assert audit.cluster_id.tolist() == [0] and audit.n_members.tolist() == [7]
    assert oversized_clusters(assigned, max_cluster=10).count() == 0


def test_subsample_requires_sq_dist_column(spark):
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.cluster import pairs_within_clusters

    df = _emb_df(spark, [(0, [1.0]), (1, [1.0])]).withColumn(
        "cluster_id", F.lit(0).cast("int")
    )
    with pytest.raises(ValueError, match="sq_dist"):
        pairs_within_clusters(df, oversize_policy="subsample")


def test_kmeans_fit_tol_converges_to_fixed_point(spark, planted):
    df, centers = planted
    # convergence variant: stops early on tight blobs and lands on the same
    # fixed point as a long fixed-iteration run
    C_tol = kmeans_fit(df, k=3, tol=1e-9, max_iters=50)
    C_fix = kmeans_fit(df, k=3, iters=10)
    assert np.allclose(np.sort(C_tol, axis=0), np.sort(C_fix, axis=0), atol=1e-9)
    d = np.linalg.norm(C_tol[:, None, :] - centers[None, :, :], axis=2).min(axis=1)
    assert (d < 0.1).all()


def test_kmeans_requires_k_vectors(spark):
    df = _emb_df(spark, [(0, [1.0]), (1, [2.0])])
    with pytest.raises(ValueError, match="only 2 vectors"):
        kmeans_fit(df, k=5, iters=1)


def test_semdedup_index_probe_finds_neardup_in_o_batch(spark, tmp_path):
    from cdc_connector_spark.ops.cluster import (
        semdedup_index_lookup,
        semdedup_index_write,
    )

    rng = np.random.default_rng(3)
    base_a, base_b = rng.normal(0, 1, 8), rng.normal(0, 1, 8)
    corpus = _emb_df(
        spark,
        [(0, base_a), (1, base_b), (2, base_a * 2), (3, base_b * 0.5),
         (4, rng.normal(0, 1, 8)), (5, rng.normal(0, 1, 8))],
    )
    path = str(tmp_path / "idx")
    semdedup_index_write(corpus, path, k=2, iters=3)

    batch = _emb_df(spark, [(100, base_a * 1.001), (101, rng.normal(0, 1, 8) * 5)])
    hits = semdedup_index_lookup(batch, path, threshold=0.98).toPandas()
    got = {(r.batch_id, r.corpus_id) for r in hits.itertuples()}
    assert (100, 0) in got and (100, 2) in got  # both scaled copies of base_a
    assert not any(b == 101 for b, _ in got)  # random probe matches nothing


def test_semdedup_index_append_uses_pinned_centroids(spark, tmp_path):
    from cdc_connector_spark.ops.cluster import (
        semdedup_index_lookup,
        semdedup_index_write,
    )

    rng = np.random.default_rng(4)
    v = rng.normal(0, 1, 8)
    corpus = _emb_df(spark, [(i, rng.normal(0, 1, 8)) for i in range(6)])
    path = str(tmp_path / "idx")
    semdedup_index_write(corpus, path, k=2, iters=2)
    # append a new member; a later probe near it must find it
    semdedup_index_write(_emb_df(spark, [(50, v)]), path, k=2, iters=2, mode="append")
    hits = semdedup_index_lookup(
        _emb_df(spark, [(200, v * 1.01)]), path, threshold=0.98
    ).collect()
    assert {r["corpus_id"] for r in hits} == {50}


def test_semdedup_index_guards(spark, tmp_path):
    import os

    from cdc_connector_spark.ops.cluster import (
        semdedup_index_lookup,
        semdedup_index_write,
    )

    corpus = _emb_df(spark, [(i, [float(i), 1.0]) for i in range(5)])
    fresh = str(tmp_path / "nope")
    with pytest.raises(ValueError, match="_META"):
        semdedup_index_write(corpus, fresh, k=2, iters=1, mode="append")

    path = str(tmp_path / "idx")
    semdedup_index_write(corpus, path, k=2, iters=1)
    with pytest.raises(ValueError, match="built with"):
        semdedup_index_write(corpus, path, k=3, iters=1, mode="append")
    # a half-built index (no _META — crash before the atomic rename) must
    # fail fast on probe, not probe silently
    os.remove(os.path.join(path, "_META"))
    with pytest.raises(FileNotFoundError):
        semdedup_index_lookup(_emb_df(spark, [(9, [1.0, 1.0])]), path).collect()


def test_semdedup_index_rebuild_in_place(spark, tmp_path):
    """Overwriting an existing index must retrain, repartition, and pin the
    NEW centroids (_META removed before the rewrite: no stale window)."""
    from cdc_connector_spark.ops.cluster import (
        semdedup_index_lookup,
        semdedup_index_write,
    )

    rng = np.random.default_rng(6)
    v = rng.normal(0, 1, 8)
    path = str(tmp_path / "idx")
    semdedup_index_write(_emb_df(spark, [(i, rng.normal(0, 1, 8)) for i in range(5)]), path, k=2, iters=1)
    # rebuild over a DIFFERENT corpus containing v
    semdedup_index_write(
        _emb_df(spark, [(10, v), (11, rng.normal(0, 1, 8)), (12, rng.normal(0, 1, 8))]),
        path, k=2, iters=2,
    )
    hits = semdedup_index_lookup(
        _emb_df(spark, [(99, v * 1.001)]), path, threshold=0.98
    ).collect()
    assert {r["corpus_id"] for r in hits} == {10}
    # old corpus ids are gone
    assert not any(r["corpus_id"] < 10 for r in hits)


def test_kmeans_fit_rejects_iters_with_tol(spark, planted):
    df, _ = planted
    with pytest.raises(ValueError, match="mutually exclusive"):
        kmeans_fit(df, k=3, iters=50, tol=1e-6)


def test_kmeans_plusplus_init_beats_ids_on_adversarial_ids(spark):
    """Verdict r6 #6 done-criterion: on a fixture where the k smallest ids
    all sit in ONE blob (adjacent ids sharing a region — the real-corpus
    hazard), seeded k-means++ init recovers the planted structure while
    the deterministic ids init stays stuck; inertia must be decisively
    lower. The oracle twin (init='ids') is unchanged."""
    from cdc_connector_spark.ops.cluster import kmeans_init_plusplus

    rng = np.random.default_rng(5)
    centers = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [0.0, 10.0, 10.0]])
    rows = []
    for i in range(60):
        c = i // 20  # ids 0..19 blob 0, 20..39 blob 1, 40..59 blob 2
        rows.append((i, centers[c] + rng.normal(0, 0.05, 3)))
    df = _emb_df(spark, rows)
    X = np.vstack([np.asarray(v, dtype=np.float64) for _, v in rows])

    def inertia(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return float(d2.min(axis=1).sum())

    C_ids = kmeans_fit(df, k=3, iters=4)
    C_pp = kmeans_fit(df, k=3, iters=4, init="kmeans++", seed=0, init_sample=60)
    assert inertia(C_pp) < 0.1 * inertia(C_ids)
    # ++ centroids actually sit on the planted centers
    d = np.linalg.norm(C_pp[:, None, :] - centers[None, :, :], axis=2).min(axis=1)
    assert (d < 0.1).all()
    # seeded determinism: same seed -> identical seeds; different seed may differ
    a = kmeans_init_plusplus(df, 3, seed=1, sample_size=60)
    b = kmeans_init_plusplus(df, 3, seed=1, sample_size=60)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="init must be"):
        kmeans_fit(df, k=3, init="random")


def test_kmeans_fit_rejects_explicit_default_iters_with_tol(spark, planted):
    df, _ = planted
    with pytest.raises(ValueError, match="mutually exclusive"):
        kmeans_fit(df, k=3, iters=3, tol=1e-6)  # explicit 3 must ALSO raise
