"""Z-order clustering: file min/max footprints shrink vs random layout, and
both cluster columns prune."""

import pytest

from pyspark.sql import functions as F

from cdc_connector_spark.ops.zorder import file_stats, zorder_write, zvalue


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.01/orders.parquet")


def _avg_span(stats):
    spans = [(hi - lo) for lo, hi in stats]
    return sum(spans) / len(spans)


def test_zorder_tightens_file_bounds(spark, orders, tmp_path):
    rand_path = str(tmp_path / "rand")
    z_path = str(tmp_path / "z")
    orders.repartition(16).write.parquet(rand_path)  # round-robin: every file spans ~everything
    zorder_write(orders, z_path, ["o_custkey", "o_orderkey"], num_files=16)

    # both clustered columns must have far tighter per-file ranges
    for col in ("o_custkey", "o_orderkey"):
        rand_span = _avg_span(file_stats(spark, rand_path, col))
        z_span = _avg_span(file_stats(spark, z_path, col))
        assert z_span < rand_span / 2, f"{col}: z {z_span} vs rand {rand_span}"

    # data integrity: same rows
    a = spark.read.parquet(z_path)
    assert a.count() == orders.count()
    assert a.agg(F.sum("o_orderkey")).first()[0] == orders.agg(F.sum("o_orderkey")).first()[0]


def test_zvalue_is_deterministic_and_total(spark, orders):
    z1 = zvalue(orders.select("o_custkey", "o_orderkey"), ["o_custkey", "o_orderkey"])
    assert z1.filter(F.col("__z").isNull()).count() == 0
    # same input → same z (stable ranks)
    s1 = z1.agg(F.sum("__z")).first()[0]
    s2 = zvalue(orders.select("o_custkey", "o_orderkey"), ["o_custkey", "o_orderkey"]).agg(F.sum("__z")).first()[0]
    assert s1 == s2


def test_snapshot_with_zorder_phase3(spark, orders, tmp_path):
    from cdc_connector_spark.snapshot.engine import snapshot_table
    from cdc_connector_spark.tables import meta_from_df

    meta = meta_from_df("tpch", "orders", orders, ["o_orderkey"])
    path = snapshot_table(
        spark, orders, meta, str(tmp_path), mode="overwrite", zorder_cols=["o_custkey"],
        rows_per_partition=1000,
    )
    out = spark.read.parquet(path)
    assert out.count() == orders.count()
    spans = file_stats(spark, path, "o_custkey")
    assert len(spans) > 1  # actually produced a clustered multi-file layout


def test_quantile_and_rank_methods_both_tighten(spark, orders, tmp_path):
    for method in ("quantile", "rank"):
        z = zvalue(orders.select("o_custkey", "o_orderkey"), ["o_custkey", "o_orderkey"], method=method)
        assert z.filter(F.col("__z").isNull()).count() == 0
    rand_path, q_path = str(tmp_path / "r"), str(tmp_path / "q")
    orders.repartition(16).write.parquet(rand_path)
    zorder_write(orders, q_path, ["o_custkey"], num_files=16)  # default quantile path
    assert _avg_span(file_stats(spark, q_path, "o_custkey")) < _avg_span(file_stats(spark, rand_path, "o_custkey")) / 2
