"""Round-10 batch 4: funnel time-to-convert, watermark sizing,
equi-depth histogram."""

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.timeseries import (
    equidepth_histogram,
    funnel_durations,
    watermark_sizing,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))


def test_funnel_durations_earliest_chaining(spark):
    rows = [
        # user 1: view@0, click@10min -> duration 600s
        (1, 1, "view", "2024-01-01 00:00:00"),
        (2, 1, "click", "2024-01-01 00:10:00"),
        # user 2: view@0, click@30min (an EARLIER click at -5min must not
        # count: chain requires click strictly after the first view)
        (3, 2, "click", "2023-12-31 23:55:00"),
        (4, 2, "view", "2024-01-01 00:00:00"),
        (5, 2, "click", "2024-01-01 00:30:00"),
        # user 3: view only -> not converted, excluded from durations
        (6, 3, "view", "2024-01-01 00:00:00"),
    ]
    out = funnel_durations(_ev(spark, rows), ["view", "click"], percentiles=(50, 90)).collect()
    row = out[0]
    assert (row["step"], row["from_type"], row["to_type"], row["users"]) == (
        2,
        "view",
        "click",
        2,
    )
    # durations: [600s, 1800s]; nearest-rank p50 = 600s, p90 = 1800s
    assert row["p50_us"] == 600 * 1_000_000 and row["p90_us"] == 1800 * 1_000_000


def test_funnel_durations_empty_transition(spark):
    rows = [(1, 1, "view", "2024-01-01 00:00:00")]
    out = funnel_durations(_ev(spark, rows), ["view", "click"]).collect()
    assert out[0]["users"] == 0 and out[0]["p50_us"] is None


def test_watermark_sizing_counts(spark):
    rows = [
        (1, 1, "click", "2024-01-01 00:00:00", "2024-01-01 00:00:30"),  # 30s late
        (2, 1, "click", "2024-01-01 00:00:00", "2024-01-01 00:02:00"),  # 2min
        (3, 1, "click", "2024-01-01 00:00:00", "2024-01-01 00:20:00"),  # 20min
        (4, 1, "view", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),  # on time
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string, in_s string"
    ).select(
        "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"),
        F.col("in_s").cast("timestamp").alias("ingest_ts"),
    )
    got = {
        (r["event_type"], r["watermark_minutes"]): (r["late"], r["late_share"])
        for r in watermark_sizing(df, candidate_minutes=(1, 5)).collect()
    }
    assert got[("click", 1)] == (2, pytest.approx(round(2 / 3, 6)))
    assert got[("click", 5)] == (1, pytest.approx(round(1 / 3, 6)))
    assert got[("view", 1)] == (0, 0.0)


def test_equidepth_histogram_balanced_and_skewed(spark):
    # 100 distinct values, 4 buckets -> exactly 25 each
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    rows = equidepth_histogram(df, "x", buckets=4).collect()
    assert [r["depth"] for r in rows] == [25, 25, 25, 25]
    assert rows[0]["lo"] == 0.0 and rows[3]["hi"] == 99.0
    # boundaries don't overlap and cover in order
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] < b["lo"]
    # heavy duplicate: one value holding 90 of 100 rows cannot straddle —
    # its bucket honestly carries the skew
    skew = spark.createDataFrame(
        [(5.0,)] * 90 + [(float(i),) for i in range(10)], "x double"
    )
    srows = equidepth_histogram(skew, "x", buckets=4).collect()
    assert sum(r["depth"] for r in srows) == 100
    assert max(r["depth"] for r in srows) >= 90  # skew surfaced, not hidden


def test_equidepth_quantize_bounds_window_and_balances(spark):
    """quantize_to (r10 verdict #4): near-unique values snap to the grid
    before the distinct collapse — boundaries land on grid points,
    depths stay exact row counts summing to n, and each bucket's depth
    is within one grid cell's mass of the ideal n/buckets."""
    import math
    import random

    rng = random.Random(7)
    vals = [rng.uniform(0, 1000) for _ in range(2000)]  # all distinct
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    q = 10.0
    rows = equidepth_histogram(df, "x", buckets=4, quantize_to=q).collect()
    assert sum(r["depth"] for r in rows) == 2000
    # every boundary is a grid point
    for r in rows:
        assert r["lo"] == math.floor(r["lo"] / q) * q
        assert r["hi"] == math.floor(r["hi"] / q) * q
    # depth balance within one grid cell's mass of ideal
    cell_counts = {}
    for v in vals:
        cell_counts[math.floor(v / q)] = cell_counts.get(math.floor(v / q), 0) + 1
    max_cell = max(cell_counts.values())
    for r in rows:
        assert abs(r["depth"] - 500) <= max_cell
    import pytest as _pytest

    with _pytest.raises(ValueError):
        equidepth_histogram(df, "x", buckets=4, quantize_to=-1.0)
