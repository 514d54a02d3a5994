"""Property tests: the distributed k-means/SemDedup implementations must
match a straight-line numpy re-implementation of the SAME deterministic
recipe on randomized inputs (seeded). This is the engine-independence
property the DuckDB oracle checks on the fixtures, exercised here across
many random layouts/partitionings."""

import random

import numpy as np

from cdc_connector_spark.ops.cluster import kmeans_clusters, semdedup_pairs


def numpy_kmeans(ids, M, k, iters):
    """Reference: the documented recipe, sequential."""
    order = np.argsort(ids)
    C = M[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + (C * C).sum(1)[None, :]
        assign = d2.argmin(1)
        for j in range(k):
            members = M[assign == j]
            if len(members):
                C[j] = members.mean(0)
    d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + (C * C).sum(1)[None, :]
    assign = d2.argmin(1)
    return assign, d2[np.arange(len(M)), assign]


def test_kmeans_matches_numpy_reference_on_random_inputs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n, dim, k, iters = rng.choice([(40, 4, 3, 2), (120, 8, 5, 3), (75, 3, 4, 4)])
        nprng = np.random.default_rng(100 + trial)
        M = np.round(nprng.normal(0, 1, (n, dim)), 4)
        ids = np.arange(n)
        # shuffle row order and vary partitioning: layout must not matter
        perm = nprng.permutation(n)
        df = spark.createDataFrame(
            [(int(ids[i]), [float(x) for x in M[i]]) for i in perm],
            "vec_id bigint, embedding array<float>",
        ).repartition(rng.choice([1, 3, 7]))
        got = {
            r["vec_id"]: (r["cluster_id"], r["sq_dist"])
            for r in kmeans_clusters(df, k=k, iters=iters).collect()
        }
        exp_assign, exp_d2 = numpy_kmeans(ids, M.astype(np.float64), k, iters)
        for i in range(n):
            assert got[i][0] == exp_assign[i], (trial, i)
            # the 4-decimal test grid can land d2 EXACTLY on the .5 boundary
            # of the 6th decimal, where 1e-15 float-order noise flips the
            # rounding — allow one ulp of the rounded place (the fixture
            # oracle has continuous values, where this never bites)
            assert abs(got[i][1] - round(exp_d2[i], 6)) <= 1.5e-6, (trial, i)


def test_semdedup_matches_bruteforce_on_random_inputs(spark):
    rng = np.random.default_rng(7)
    n, dim, k = 60, 6, 4
    M = np.round(rng.normal(0, 1, (n, dim)), 4)
    # plant a few near-dups so the survivor set is non-trivial
    M[10] = M[3] * 1.01
    M[11] = M[3] + 0.001
    df = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    ).repartition(5)
    thr = 0.9
    got = {
        (r["id_a"], r["id_b"]) for r in semdedup_pairs(df, k=k, iters=3, threshold=thr).collect()
    }
    assign, _ = numpy_kmeans(np.arange(n), M.astype(np.float64), k, 3)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = np.round(Mn @ Mn.T, 6)
    exp = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if assign[a] == assign[b] and sims[a, b] >= thr
    }
    assert got == exp
    assert (3, 10) in exp or (3, 11) in exp  # the planted dups made it in
