"""As-of join: hand-built cases + randomized cross-check vs pandas merge_asof."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cdc_connector_spark.ops.asof import asof_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [(1, 10.0, "A"), (1, 20.0, "A"), (1, 25.0, "B"), (1, 5.0, "B")],
        "trade_id int, ts double, sym string",
    ).select("trade_id", "sym", "ts")
    quotes = spark.createDataFrame(
        [
            ("A", 9.0, 100.0),
            ("A", 20.0, 110.0),  # equal-ts: inclusive match
            ("A", 21.0, 120.0),
            ("B", 6.0, 200.0),
        ],
        "sym string, ts double, px double",
    )
    return trades, quotes


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_backward_inclusive(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym")
    got = _rows(out, "sym", "ts", "px")
    assert got == [
        ("A", 10.0, 100.0),  # latest quote <= 10 is 9.0
        ("A", 20.0, 110.0),  # equal ts matches
        ("B", 5.0, None),    # nothing at or before 5
        ("B", 25.0, 200.0),
    ]


def test_forward(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", direction="forward")
    got = _rows(out, "sym", "ts", "px")
    assert got == [
        ("A", 10.0, 110.0),  # earliest quote >= 10 is 20.0
        ("A", 20.0, 110.0),  # inclusive
        ("B", 5.0, 200.0),
        ("B", 25.0, None),
    ]


def test_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", tolerance_seconds=1.5)
    got = _rows(out, "sym", "ts", "px")
    assert got == [
        ("A", 10.0, 100.0),  # |10-9| = 1 <= 1.5
        ("A", 20.0, 110.0),  # 0
        ("B", 5.0, None),
        ("B", 25.0, None),   # |25-6| = 19 > 1.5 → nulled out
    ]


def test_tolerance_subsecond_on_timestamps(spark):
    """r12 fix: timestamp tolerance must measure MICROSECOND distance —
    the old unix_timestamp form truncated to whole seconds, so a 0.9s
    gap measured 0 and a boundary-crossing 0.3s gap measured 1."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10.900"), (2, "2024-01-01 00:01:00.100")],
        "k int, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10.000", 1.0), (2, "2024-01-01 00:00:59.900", 2.0)],
        "k int, ts string, px double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "px")
    out = asof_join(left, right, on="ts", by="k", tolerance_seconds=0.5)
    got = {r["k"]: r["px"] for r in out.collect()}
    # k=1: gap 0.9s > 0.5 -> nulled (old code: 0s "within")
    # k=2: gap 0.2s <= 0.5 -> kept (old code: 1s "outside")
    assert got == {1: None, 2: 2.0}


def test_equal_ts_right_rows_seq_tiebreak(spark):
    left = spark.createDataFrame([(1, 10.0)], "k int, ts double")
    right = spark.createDataFrame(
        [(1, 10.0, 1, "first"), (1, 10.0, 2, "second")],
        "k int, ts double, seq int, v string",
    )
    out = asof_join(left, right, on="ts", by="k", seq_col="seq")
    assert out.collect()[0]["v"] == "second"  # greatest seq wins


def test_randomized_vs_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "ts": rng.uniform(0, 1000, n_l).round(3),
            "lval": np.arange(n_l),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_r),
            "ts": rng.uniform(0, 1000, n_r).round(3),
            "rval": np.arange(n_r).astype(float),
        }
    )
    # merge_asof needs unique (k, ts) on the right for a deterministic match
    rpd = rpd.drop_duplicates(subset=["k", "ts"], keep="last")

    expected = pd.merge_asof(
        lpd.sort_values("ts", kind="mergesort"),
        rpd.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lval")

    out = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on="ts",
        by="k",
    )
    got = out.toPandas().sort_values("lval")
    exp_r = expected["rval"].to_numpy()
    got_r = got["rval"].to_numpy()
    both_nan = np.isnan(exp_r) & np.isnan(got_r)
    assert bool(np.all(both_nan | (exp_r == got_r)))


def test_no_by_key_global_asof(spark):
    left = spark.createDataFrame([(10.0,), (1.0,)], "ts double")
    right = spark.createDataFrame([(2.0, "x"), (9.0, "y")], "ts double, v string")
    out = asof_join(left, right, on="ts")
    got = _rows(out, "ts", "v")
    assert got == [(1.0, None), (10.0, "y")]


def test_composite_by_keys(spark):
    left = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 10.0), (2, "x", 10.0)], "region int, sym string, ts double"
    )
    right = spark.createDataFrame(
        [(1, "x", 5.0, 100.0), (1, "y", 6.0, 200.0), (2, "x", 20.0, 300.0)],
        "region int, sym string, ts double, px double",
    )
    out = asof_join(left, right, on="ts", by=["region", "sym"])
    got = {(r["region"], r["sym"]): r["px"] for r in out.collect()}
    assert got == {(1, "x"): 100.0, (1, "y"): 200.0, (2, "x"): None}


def test_null_in_matched_right_row_stays_null(spark):
    """The matched right row's NULL must NOT be backfilled from an older
    right row (regression: per-column fill stitched rows together)."""
    left = spark.createDataFrame([(1, 3.0)], "k int, ts double")
    right = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None)], "k int, ts double, px double"
    )
    out = asof_join(left, right, on="ts", by="k").collect()[0]
    assert out["ts_right"] == 2.0  # matched the ts=2.0 row...
    assert out["px"] is None       # ...whose px is NULL, and stays NULL


def test_forward_equal_ts_seq_tiebreak(spark):
    """Greatest seq wins at equal ts in BOTH directions."""
    left = spark.createDataFrame([(1, 10.0)], "k int, ts double")
    right = spark.createDataFrame(
        [(1, 10.0, 1, "first"), (1, 10.0, 2, "second")],
        "k int, ts double, seq int, v string",
    )
    out = asof_join(left, right, on="ts", by="k", direction="forward", seq_col="seq")
    assert out.collect()[0]["v"] == "second"


def test_global_asof_equals_keyed_formulation(spark):
    """r14 review pin: the by=None path (range-bucketed window + carried
    bucket boundary, never a whole-input one-task window) returns exactly
    what the keyed one-shuffle formulation returns on a constant key —
    randomized, both directions, with seq tie-break and tolerance."""
    import random

    rng = random.Random(14)
    # r15 (advisor): include NULL `on` rows on BOTH sides — the bucketed
    # path must route them to the edge bucket matching the keyed window's
    # nulls-first (asc/backward) / nulls-last (desc/forward) placement
    trades = [
        (i, None if i % 57 == 0 else float(rng.randrange(0, 500)))
        for i in range(400)
    ]
    quotes = [
        (None if i % 71 == 0 else float(rng.randrange(0, 500)), float(i), i)
        for i in range(300)
    ]
    t = spark.createDataFrame(trades, "trade_id int, ts double")
    q = spark.createDataFrame(quotes, "ts double, px double, seq int")
    for direction in ("backward", "forward"):
        for tol in (None, 7.0):
            g = asof_join(
                t, q, on="ts", by=None, direction=direction,
                tolerance_seconds=tol, seq_col="seq",
            )
            k = asof_join(
                t.withColumn("__k", F.lit(1)),
                q.withColumn("__k", F.lit(1)),
                on="ts", by="__k", direction=direction,
                tolerance_seconds=tol, seq_col="seq",
            ).drop("__k")
            got = _rows(g, "trade_id", "ts", "px", "seq", "ts_right")
            want = _rows(k, "trade_id", "ts", "px", "seq", "ts_right")
            assert got == want, (direction, tol)


def test_global_asof_date_on_column(spark):
    """r15 (advisor, medium): DateType `on` must work on the by=None path —
    CAST(date AS double) is illegal in Spark, so bucketing goes through
    unix_micros(cast timestamp)."""
    import datetime as dt

    d = dt.date
    t = spark.createDataFrame(
        [(1, d(2024, 1, 10)), (2, d(2024, 3, 5)), (3, d(2024, 6, 1))],
        "trade_id int, ts date",
    )
    q = spark.createDataFrame(
        [(d(2024, 1, 1), 1.0), (d(2024, 2, 1), 2.0), (d(2024, 5, 1), 3.0)],
        "ts date, px double",
    )
    got = _rows(asof_join(t, q, on="ts"), "trade_id", "px")
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]
    # tolerance on a DateType column rides the unix_micros path too
    # (r15 self-review: the else-arm CAST(date AS double) is illegal);
    # 20 days > 9-day gap for trade 1, < 33/31-day gaps for trades 2,3
    tol = _rows(
        asof_join(t, q, on="ts", tolerance_seconds=20 * 86400.0), "trade_id", "px"
    )
    assert tol == [(1, 1.0), (2, None), (3, None)]
    # keyed path, same DateType tolerance
    tk = _rows(
        asof_join(
            t.withColumn("k", F.lit(1)),
            q.withColumn("k", F.lit(1)),
            on="ts", by="k", tolerance_seconds=20 * 86400.0,
        ),
        "trade_id", "px",
    )
    assert tk == tol


def test_global_asof_rejects_unorderable_on_type(spark):
    """String `on` has no double embedding consistent with its native sort;
    the global path must refuse rather than silently mis-bucket."""
    t = spark.createDataFrame([(1, "b")], "trade_id int, ts string")
    q = spark.createDataFrame([("a", 1.0)], "ts string, px double")
    with pytest.raises(TypeError, match="timestamp, date, or numeric"):
        asof_join(t, q, on="ts")
    # keyed path still accepts any orderable type
    t2 = t.withColumn("k", F.lit(1))
    q2 = q.withColumn("k", F.lit(1))
    assert _rows(asof_join(t2, q2, on="ts", by="k"), "trade_id", "px") == [(1, 1.0)]


def test_global_asof_plan_has_no_full_input_single_task_window(spark):
    """The only no-partition window in the global-asof plan runs over the
    <=65-row bucket-carry frame; the union itself is windowed per range
    bucket (r14 review — the merge_islands one-task class)."""
    t = spark.createDataFrame([(i, float(i)) for i in range(50)], "id int, ts double")
    q = spark.createDataFrame([(float(i), float(i)) for i in range(50)], "ts double, px double")
    plan = asof_join(t, q, on="ts")._jdf.queryExecution().optimizedPlan().toString()
    # the big-side window must carry the __b bucket in its partition spec
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:2000]
    unpartitioned = [s for s in specs if "__b" not in s and "__ord" not in s]
    partitioned = [s for s in specs if "__b" in s]
    assert partitioned, specs
    # any unpartitioned spec belongs to the carry frame (ordered by __b only)
    assert all("__b" in s for s in unpartitioned) or len(unpartitioned) == 0 or all(
        s.strip().startswith("__b") for s in unpartitioned
    ), specs
