"""ops/experiment.py — hash-split A/B readout + two-proportion z-test."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from cdc_connector_spark.ops.experiment import ab_test_report, hash_variant


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_hash_variant_stable_and_balanced(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "u bigint")
    out = df.select(hash_variant(F.col("u")).alias("v"))
    counts = {r["v"]: r["n"] for r in out.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1}
    assert abs(counts[0] - counts[1]) < 300  # roughly balanced
    # stable: same input -> same assignment
    a = [r["v"] for r in out.orderBy("v").collect()]
    b = [r["v"] for r in df.select(hash_variant(F.col("u")).alias("v")).orderBy("v").collect()]
    assert a == b


def test_ab_test_report_hand_checked(spark):
    t0 = datetime(2024, 1, 1)

    def ts(i):
        return t0.replace(minute=i)

    # explicit variant column: variant = user_id % 2
    # A (even users): 10,12 exposed; 10 converts AFTER exposure,
    #   12's purchase is BEFORE exposure (must NOT count)
    # B (odd users): 11,13,15 exposed; 13 converts
    rows = [
        (1, ts(0), 10, "view"), (2, ts(1), 10, "purchase"),
        (3, ts(5), 12, "purchase"), (4, ts(6), 12, "view"),
        (5, ts(0), 11, "view"),
        (6, ts(0), 13, "view"), (7, ts(2), 13, "purchase"),
        (8, ts(0), 15, "view"),
        # user 17: purchase but never exposed -> excluded entirely
        (9, ts(0), 17, "purchase"),
    ]
    df = _ev(spark, rows)
    r = ab_test_report(df, variant_col=(F.col("user_id") % 2).cast("int")).collect()[0]
    assert (r["users_a"], r["conv_a"], r["users_b"], r["conv_b"]) == (2, 1, 3, 1)
    assert r["cvr_a"] == 0.5 and r["cvr_b"] == round(1 / 3, 6)
    p = 2 / 5
    want_z = round((0.5 - 1 / 3) / math.sqrt(p * (1 - p) * (1 / 2 + 1 / 3)), 6)
    assert r["z"] == want_z


def test_ab_test_report_degenerate(spark):
    t0 = datetime(2024, 1, 1)
    # all exposure in variant 0 only -> z guarded to 0.0
    rows = [(1, t0, 2, "view"), (2, t0, 4, "view")]
    df = _ev(spark, rows)
    r = ab_test_report(df, variant_col=F.lit(0)).collect()[0]
    assert (r["users_a"], r["users_b"], r["z"]) == (2, 0, 0.0)
    assert r["cvr_b"] == 0.0
