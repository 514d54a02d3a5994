"""r11 review regressions for ops/timeseries.py."""

from pyspark.sql import functions as F

from cdc_connector_spark.ops.timeseries import linear_attribution


def test_linear_attribution_type_col_parameter(spark):
    """type_col was the one hardcoded column name in an otherwise fully
    parameterized operator (r11 review)."""
    rows = [
        (1, 1, "tap", "2024-01-01 00:00:00", None),
        (2, 1, "buy", "2024-01-01 01:00:00", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "eid long, uid long, etype string, ts_s string, amount double"
    ).select(
        "eid", "uid", "etype", F.col("ts_s").cast("timestamp").alias("t"), "amount"
    )
    out = linear_attribution(
        df,
        value_event="buy",
        touch_event="tap",
        ts_col="t",
        user_col="uid",
        id_col="eid",
        value_col="amount",
        type_col="etype",
    ).collect()
    assert [(r["eid"], r["n_conversions"], r["credit"]) for r in out] == [(1, 1, 10.0)]
