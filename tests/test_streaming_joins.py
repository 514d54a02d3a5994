"""streaming/joins.py — interval join: batch semantics + streaming run.

Value verification of the batch semantics lives in the driver oracle
(`interval_join_events`); here we pin the window-boundary rules, the
left-outer behavior, and that the SAME builder actually runs as a
stream-stream join with watermarks (Spark rejects unbounded-state
stream-stream joins outright, so a completing streaming query IS the proof
that the state-eviction shape is right).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from cdc_connector_spark.streaming.joins import interval_join


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_interval_join_window_boundaries(spark):
    anchors = _df(spark, [(1, 100, "2024-01-01 12:00:00")])
    ctx = _df(
        spark,
        [
            (1, 1, "2024-01-01 11:00:00"),  # exactly lookback ago -> in
            (1, 2, "2024-01-01 10:59:59"),  # just outside -> out
            (1, 3, "2024-01-01 12:00:00"),  # simultaneous -> in
            (1, 4, "2024-01-01 12:00:01"),  # after anchor -> out
            (2, 5, "2024-01-01 11:30:00"),  # wrong key -> out
        ],
    )
    out = interval_join(anchors, ctx, key_col="user_id", lookback="1 hour").collect()
    got = sorted((r["c_event_id"], r["lag_us"]) for r in out)
    assert got == [(1, 3_600_000_000), (3, 0)]


def test_interval_join_left_outer_keeps_lonely_anchor(spark):
    anchors = _df(spark, [(1, 100, "2024-01-01 12:00:00"), (2, 200, "2024-01-01 12:00:00")])
    ctx = _df(spark, [(1, 1, "2024-01-01 11:30:00")])
    out = interval_join(
        anchors, ctx, key_col="user_id", lookback="1 hour", how="left_outer"
    ).collect()
    by_anchor = {r["a_event_id"]: r["c_event_id"] for r in out}
    assert by_anchor == {100: 1, 200: None}


def test_interval_join_streaming_end_to_end(spark, tmp_path):
    """Two file-fed streams; the joined memory sink must contain exactly the
    in-window pair. Append-mode output for a stream-stream inner join is
    emitted once both watermarks pass the join window."""
    a_dir, c_dir = str(tmp_path / "a"), str(tmp_path / "c")
    schema = "user_id bigint, event_id bigint, ts timestamp"
    _df(
        spark,
        [
            (1, 100, "2024-01-01 12:00:00"),
            # late-side watermark movers so the join window can close
            (9, 900, "2024-01-01 20:00:00"),
        ],
    ).repartition(1).write.parquet(os.path.join(a_dir, "f0"))
    _df(
        spark,
        [
            (1, 1, "2024-01-01 11:30:00"),
            (1, 2, "2024-01-01 09:00:00"),  # outside lookback
            (9, 901, "2024-01-01 20:00:00"),
        ],
    ).repartition(1).write.parquet(os.path.join(c_dir, "f0"))

    def stream(d):
        return (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )

    out = interval_join(
        stream(a_dir), stream(c_dir), key_col="user_id", lookback="1 hour",
        watermark="0 seconds",
    ).filter(F.col("user_id") == 1)
    q = (
        out.writeStream.format("memory")
        .queryName("ij_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ij_sink").collect()
    assert [(r["a_event_id"], r["c_event_id"]) for r in rows] == [(100, 1)]


def test_interval_join_matches_bruteforce_on_random_inputs(spark):
    """Randomized property: the join must equal a driver-side double loop
    over the same window rule, across layouts."""
    import random as _random

    rng = _random.Random(99)
    base = 1_700_000_000
    anchors = [
        (rng.randrange(5), 100 + i, base + rng.randrange(0, 7200)) for i in range(40)
    ]
    ctx = [
        (rng.randrange(5), 500 + i, base + rng.randrange(0, 7200)) for i in range(120)
    ]

    def df(rows):
        return spark.createDataFrame(
            [(u, e, t) for u, e, t in rows], "user_id bigint, event_id bigint, ts long"
        ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(4)

    out = interval_join(df(anchors), df(ctx), key_col="user_id", lookback="30 minutes")
    got = {(r["a_event_id"], r["c_event_id"], r["lag_us"]) for r in out.collect()}
    exp = {
        (ae, ce, (at - ct) * 1_000_000)
        for au, ae, at in anchors
        for cu, ce, ct in ctx
        if au == cu and 0 <= at - ct <= 1800
    }
    assert got == exp and len(exp) > 0
