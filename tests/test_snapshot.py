import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_connector_spark.snapshot.engine import snapshot_database, snapshot_table
from cdc_connector_spark.snapshot.planner import (
    choose_partition_column,
    jdbc_read_options,
    plan_num_partitions,
    plan_range,
)
from cdc_connector_spark.tables import TableMeta, find_ts_column, meta_from_df


def test_plan_num_partitions():
    assert plan_num_partitions(0) == 1
    assert plan_num_partitions(999_999) == 1
    assert plan_num_partitions(1_000_001) == 2
    assert plan_num_partitions(10_000_000) == 10
    assert plan_num_partitions(10**12, max_partitions=10_000) == 10_000


def test_plan_range_single_pass(spark):
    df = spark.range(5, 1000)
    plan = plan_range(df, "id", rows_per_partition=100)
    assert (plan.lower, plan.upper, plan.num_partitions) == (5, 999, 10)


def test_choose_partition_column(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "id int, name string, v double")
    assert choose_partition_column(["id"], df.schema) == "id"
    assert choose_partition_column(["name"], df.schema) is None
    assert choose_partition_column(["name", "id"], df.schema) == "id"


def test_jdbc_read_options_partitioned(spark):
    df = spark.range(0, 5_000_000)
    plan = plan_range(df, "id")
    opts = jdbc_read_options("jdbc:mysql://h/db", "t", plan)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "5"
    assert opts["fetchsize"] == "100000"


def test_table_meta_index_fk_round_trip(spark):
    """Source index/FK metadata (migrate_v3.py:307-369 analogue) must
    survive a serialize→deserialize round trip and surface the clustering
    suggestion for the sink."""
    from cdc_connector_spark.tables import ForeignKeyMeta, IndexMeta

    df = spark.createDataFrame([(1, 2, "x")], "id bigint, cust_id bigint, updated_at string")
    meta = meta_from_df(
        "shop", "orders", df, ["id"],
        indexes=[IndexMeta(name="ix_cust", columns=["cust_id"], unique=False)],
        foreign_keys=[ForeignKeyMeta(name="fk_cust", columns=["cust_id"],
                                     ref_table="customer", ref_columns=["c_id"])],
    )
    assert meta.cluster_columns() == ["cust_id"]
    back = type(meta).from_dict(meta.to_dict())
    assert back.indexes == meta.indexes
    assert back.foreign_keys == meta.foreign_keys
    assert back.schema == meta.schema
    assert back.ts_col == "updated_at"


def test_fk_orphans_anti_join(spark):
    from cdc_connector_spark.tables import ForeignKeyMeta, fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id bigint, cust_id bigint"
    )
    parent = spark.createDataFrame([(10, "a"), (20, "b")], "c_id bigint, name string")
    fk = ForeignKeyMeta("fk_cust", ["cust_id"], "customer", ["c_id"])
    bad = fk_orphans(child, parent, fk).collect()
    # id=3 violates; id=4 (NULL FK) does not, per SQL FK semantics
    assert [r["id"] for r in bad] == [3]


def test_find_ts_column():
    assert find_ts_column(["id", "LAST_MODIFIED_DATE"]) == "LAST_MODIFIED_DATE"
    assert find_ts_column(["id", "created_date", "updated_at"]) == "updated_at"
    assert find_ts_column(["id", "date_modified"]) == "date_modified"
    assert find_ts_column(["id", "v"]) is None


def test_snapshot_table_normalizes_and_is_idempotent(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "0000-00-00 00:00:00", 1), (2, "2024-01-01 00:00:00", 0)],
        "ID long, Created string, Active int",
    )
    meta = TableMeta(
        db="trading",
        table="T_OFFER",
        pk_cols=["id"],
        zero_date_cols=["Created"],
        tinyint_bool_cols=["Active"],
        casts={"Created": "timestamp"},
    )
    path = snapshot_table(spark, src, meta, str(tmp_path))
    assert path.endswith("trading_t_offer")
    out = spark.read.parquet(path)
    assert set(out.columns) == {"id", "created", "active"}
    rows = {r["id"]: (r["created"], r["active"]) for r in out.collect()}
    assert rows[1][0] is None and rows[1][1] is True
    assert rows[2][1] is False

    # idempotent skip: second run with mode=ignore leaves data unchanged
    src2 = spark.createDataFrame([(9, "2020-01-01", 1)], "ID long, Created string, Active int")
    snapshot_table(spark, src2, meta, str(tmp_path), mode="ignore")
    assert spark.read.parquet(path).count() == 2


def test_snapshot_database_parallel(spark, tmp_path):
    t1 = spark.createDataFrame([(1, "x")], "id long, v string")
    t2 = spark.createDataFrame([(2, "y")], "id long, v string")
    res = snapshot_database(
        spark,
        [(t1, meta_from_df("db", "a", t1, ["id"])), (t2, meta_from_df("db", "b", t2, ["id"]))],
        str(tmp_path),
        max_workers=2,
    )
    assert set(res) == {"db_a", "db_b"}
    assert all(os.path.exists(p) for p in res.values())


def test_snapshot_table_row_count_avoids_source_count(spark, tmp_path, monkeypatch):
    """r13 review pin: with ``row_count`` supplied, snapshot_table must
    never call source.count() — on a live pgcopy/JDBC frame that count
    is a SECOND full read of the table through the COPY pipes. count()
    is sabotaged here; the write path must still succeed and honor the
    supplied count for partition sizing."""
    from pyspark.sql import DataFrame

    from cdc_connector_spark.snapshot.engine import snapshot_table
    from cdc_connector_spark.tables import meta_from_df

    df = spark.range(100).selectExpr("id as k", "cast(id as string) v")
    meta = meta_from_df("db", "t_rowcount", df, ["k"])

    def boom(self):
        raise AssertionError("source.count() called despite row_count")

    monkeypatch.setattr(DataFrame, "count", boom)
    out = snapshot_table(
        spark, df, meta, str(tmp_path), mode="overwrite", row_count=100
    )
    monkeypatch.undo()
    assert spark.read.parquet(out).count() == 100
