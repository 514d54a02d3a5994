"""ops/bucketed.py — bucketed-table layout kills the join shuffle.

The scale claim in SCALING.md ("co-locate joins via bucketing") pinned as
an executable fact: the same join runs with Exchange operators on plain
parquet and with ZERO Exchanges on aligned bucketed tables.
"""

from __future__ import annotations

import pytest

from cdc_connector_spark.ops.bucketed import bucketed_tables_aligned, save_bucketed


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # warehouse.dir is a static conf — tables land in the session default
    # (spark-warehouse/, gitignored) and are dropped in teardown
    a = spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 2000).selectExpr("id AS k", "id * 3 AS vb")
    save_bucketed(a, "bt_a", ["k"], num_buckets=8, sort_cols=["k"])
    save_bucketed(b, "bt_b", ["k"], num_buckets=8, sort_cols=["k"])
    yield a, b
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    spark.sql("DROP TABLE IF EXISTS bt_c")


def test_bucketed_join_is_exchange_free(spark, bucketed_pair):
    a, b = bucketed_pair
    # plain frames: the join must shuffle (or broadcast) — force SMJ via
    # threshold so the comparison is apples-to-apples
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = a.join(b, "k")
        assert "Exchange" in _physical_plan(plain)

        ta, tb = spark.table("bt_a"), spark.table("bt_b")
        joined = ta.join(tb, "k")
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "SortMergeJoin" in plan
        # values identical to the plain join
        assert joined.count() == 2000
        row = joined.filter("k = 7").collect()[0]
        assert (row["va"], row["vb"]) == (14, 21)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_alignment_check(spark, bucketed_pair):
    assert bucketed_tables_aligned(spark, "bt_a", "bt_b")
    c = spark.range(0, 100).selectExpr("id AS k", "id AS vc")
    save_bucketed(c, "bt_c", ["k"], num_buckets=4)  # mismatched count
    assert not bucketed_tables_aligned(spark, "bt_a", "bt_c")


def test_save_bucketed_guard(spark):
    with pytest.raises(ValueError, match="non-empty"):
        save_bucketed(spark.range(1), "bt_bad", [])
