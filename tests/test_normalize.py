import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_connector_spark.functions.normalize import (
    bit_to_boolean,
    lag_minutes,
    lowercase_columns,
    normalize_row,
    null_zero_date,
    route_table_name,
    sink_table_name,
    strip_nul_binary,
    strip_nul_string,
    tinyint_to_boolean,
)


def test_bit_to_boolean(spark):
    df = spark.createDataFrame(
        [(1, bytes([0])), (2, bytes([1])), (3, None), (4, b"\x00\x01")],
        "id int, b binary",
    )
    got = {r["id"]: r["v"] for r in df.select("id", bit_to_boolean("b").alias("v")).collect()}
    assert got == {1: False, 2: True, 3: None, 4: True}


def test_tinyint_to_boolean(spark):
    df = spark.createDataFrame([(1, 0), (2, 1), (3, 127), (4, None)], "id int, t int")
    got = {r["id"]: r["v"] for r in df.select("id", tinyint_to_boolean("t").alias("v")).collect()}
    assert got == {1: False, 2: True, 3: True, 4: None}


def test_zero_date_to_null(spark):
    df = spark.createDataFrame(
        [(1, "0000-00-00 00:00:00"), (2, "0000-00-00"), (3, "2024-05-01 10:00:00"), (4, None)],
        "id int, d string",
    )
    out = df.select("id", null_zero_date("d").cast("timestamp").alias("v")).collect()
    got = {r["id"]: r["v"] for r in out}
    assert got[1] is None and got[2] is None and got[4] is None
    assert got[3] == datetime.datetime(2024, 5, 1, 10, 0, 0)


def test_strip_nul_string(spark):
    df = spark.createDataFrame([(1, "ab\x00cd"), (2, "\x00"), (3, "clean"), (4, None)], "id int, s string")
    got = {r["id"]: r["v"] for r in df.select("id", strip_nul_string(F.col("s")).alias("v")).collect()}
    assert got == {1: "abcd", 2: "", 3: "clean", 4: None}


def test_strip_nul_binary(spark):
    df = spark.createDataFrame(
        [(1, b"\x00ab\x00"), (2, b"\x01\x02"), (3, None)], "id int, b binary"
    )
    got = {r["id"]: bytes(r["v"]) if r["v"] is not None else None
           for r in df.select("id", strip_nul_binary("b").alias("v")).collect()}
    assert got == {1: b"ab", 2: b"\x01\x02", 3: None}


def test_lowercase_columns(spark):
    df = spark.createDataFrame([(1, "x")], "ID int, Payload string")
    assert lowercase_columns(df).columns == ["id", "payload"]


def test_lag_minutes(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 12, 30), datetime.datetime(2024, 1, 1, 12, 0))],
        "a timestamp, b timestamp",
    )
    assert df.select(lag_minutes("a", "b").alias("m")).collect()[0]["m"] == 30.0


def test_route_table_name():
    assert (
        route_table_name("xchange_trading_v2.xchange_trading.T_OFFER", prefix="trading_")
        == "trading_t_offer"
    )
    assert sink_table_name("Trading", "T_OFFER") == "trading_t_offer"


def test_normalize_row_order(spark):
    # zero-date nulling must happen before the cast (SURVEY.md §7)
    df = spark.createDataFrame(
        [(1, "0000-00-00 00:00:00", "a\x00b", 1, bytes([0]))],
        "ID int, Created string, Comment string, Active int, Damaged binary",
    )
    out = normalize_row(
        df,
        zero_date_cols=["Created"],
        strip_nul_cols=["Comment"],
        tinyint_bool_cols=["Active"],
        bit_bool_cols=["Damaged"],
        casts={"Created": "timestamp"},
    )
    assert out.columns == ["id", "created", "comment", "active", "damaged"]
    row = out.collect()[0]
    assert row["created"] is None
    assert row["comment"] == "ab"
    assert row["active"] is True
    assert row["damaged"] is False
