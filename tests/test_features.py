"""ops/features.py — per-dimension embedding standardization."""

from __future__ import annotations

import math

from cdc_connector_spark.ops.features import dimension_stats, standardize_embeddings


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_dimension_stats_hand_checked(spark):
    df = _emb(spark, [(0, [1.0, 5.0], 0), (1, [3.0, 5.0], 0)])
    out = {r["dim"]: r for r in dimension_stats(df).collect()}
    assert out[0]["mean"] == 2.0 and out[0]["std"] == 1.0
    assert out[1]["mean"] == 5.0 and out[1]["std"] == 0.0
    assert out[0]["n"] == 2


def test_standardize_zscores_and_zero_variance(spark):
    df = _emb(spark, [(0, [1.0, 5.0], 0), (1, [3.0, 5.0], 1)])
    out = {r["vec_id"]: r["z"] for r in standardize_embeddings(df).collect()}
    # dim0: mean 2, std 1 -> z = -1, +1 ; dim1 zero-variance -> 0.0
    assert out[0] == [-1.0, 0.0] and out[1] == [1.0, 0.0]


def test_standardize_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-3, 3) for _ in range(6)], i % 2) for i in range(40)]
    df = _emb(spark, rows)
    got = {r["vec_id"]: r["z"] for r in standardize_embeddings(df).collect()}
    dims = 6
    for d in range(dims):
        xs = [r[1][d] for r in rows]
        n = len(xs)
        sx = sum(round(x, 12) for x in xs)
        sxx = sum(round(x * x, 12) for x in xs)
        mean = sx / n
        std = math.sqrt(max(sxx / n - mean * mean, 0.0))
        for i, x in enumerate([r[1][d] for r in rows]):
            assert got[i][d] == round((x - mean) / std, 6), (i, d)


def test_standardize_keeps_other_columns(spark):
    df = _emb(spark, [(0, [1.0], 7), (1, [2.0], 8)])
    rows = standardize_embeddings(df).collect()
    assert {r["label"] for r in rows} == {7, 8}
    assert all(len(r["z"]) == 1 for r in rows)


def test_standardize_output_column_order_is_stable(spark):
    """Output schema = input keep-order + z: the id-keyed re-attach join
    must not let the join key migrate to the front (advisor, r14)."""
    df = _emb(spark, [(0, [1.0], 7), (1, [2.0], 8)])
    out = standardize_embeddings(df)
    assert out.columns == ["vec_id", "label", "z"]
