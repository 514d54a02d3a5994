"""Windowed/session aggregation and the applyInPandasWithState latest-per-key
operator — batch parity plus streaming mechanics (memory sink)."""

import os
import time

import pytest

from pyspark.sql import functions as F

from cdc_connector_spark.streaming.stateful import latest_state_stream
from cdc_connector_spark.streaming.windows import session_windows, windowed_event_stats


def test_windowed_stats_batch_parity(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:05:00", "click", 1.0),
            ("2024-01-01 00:55:00", "click", 2.0),
            ("2024-01-01 01:05:00", "click", 4.0),
            ("2024-01-01 00:10:00", "view", 8.0),
        ],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = windowed_event_stats(df, window="1 hour").collect()
    got = {(r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"]) for r in out}
    assert got == {(0, "click"): (2, 3.0), (1, "click"): (1, 4.0), (0, "view"): (1, 8.0)}


def test_sliding_window(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0), ("2024-01-01 00:40:00", "a", 2.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = windowed_event_stats(df, window="1 hour", slide="30 minutes").collect()
    # event at 00:10 belongs to [23:30,00:30) and [00:00,01:00); at 00:40 to
    # [00:00,01:00) and [00:30,01:30)
    counts = sorted(r["n_events"] for r in out)
    assert counts == [1, 1, 2]


def test_session_windows_gap_merge(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 1),
            ("2024-01-01 00:10:00", 1),   # same session (gap 30m)
            ("2024-01-01 02:00:00", 1),   # new session
            ("2024-01-01 00:00:00", 2),
        ],
        "ts string, user_id int",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = session_windows(df, gap="30 minutes")
    rows = sorted((r["user_id"], r["n_events"]) for r in out.collect())
    assert rows == [(1, 1), (1, 2), (2, 1)]


@pytest.fixture
def changelog_dir(spark, tmp_path):
    """Two changelog parquet files: inserts then update+delete."""
    d = str(tmp_path / "log")
    schema = "id bigint, v string, __op string, __ts_ms bigint, __seq bigint"
    spark.createDataFrame(
        [(1, "a", "c", 100, 1), (2, "b", "c", 100, 2)], schema
    ).repartition(1).write.mode("overwrite").parquet(os.path.join(d, "f0"))
    spark.createDataFrame(
        [(1, "a2", "u", 200, 3), (2, None, "d", 200, 4), (3, "c", "c", 200, 5)], schema
    ).repartition(1).write.mode("overwrite").parquet(os.path.join(d, "f1"))
    return d


def test_latest_state_stream_applyinpandaswithstate(spark, tmp_path, changelog_dir):
    schema = "id bigint, v string, __op string, __ts_ms bigint, __seq bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(changelog_dir)
    )
    out = latest_state_stream(stream, key_cols=["id"])
    q = (
        out.writeStream.format("memory")
        .queryName("latest_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from latest_state").collect()
    # final emission per key: id=1 updated to a2, id=2 deleted, id=3 inserted
    final = {}
    for r in rows:
        cur = final.get(r["id"])
        if cur is None or (r["__ts_ms"], r["__seq"]) >= (cur["__ts_ms"], cur["__seq"]):
            final[r["id"]] = r
    assert final[1]["v"] == "a2" and final[1]["__deleted"] is False
    assert final[2]["__deleted"] is True
    assert final[3]["v"] == "c" and final[3]["__deleted"] is False


def test_windowed_stats_streaming_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    schema = "ts timestamp, event_type string, value double"
    spark.createDataFrame(
        [("2024-01-01 00:05:00", "click", 1.0), ("2024-01-01 00:20:00", "click", 2.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts")).repartition(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = windowed_event_stats(stream, window="1 hour", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_stats").collect()
    assert any(r["n_events"] == 2 and r["sum_value"] == 3.0 for r in rows)


def test_latest_state_stream_transformwithstate(spark, tmp_path, changelog_dir):
    """Spark 4 transformWithStateInPandas variant: same final state as the
    applyInPandasWithState operator. Skips where Spark's state-server
    protocol dependency (protobuf) is unavailable."""
    pytest.importorskip("google.protobuf.descriptor")
    from cdc_connector_spark.streaming.stateful import latest_state_stream_tws

    schema = "id bigint, v string, __op string, __ts_ms bigint, __seq bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(changelog_dir)
    )
    out = latest_state_stream_tws(stream, key_cols=["id"])
    q = (
        out.writeStream.format("memory")
        .queryName("latest_state_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from latest_state_tws").collect()
    final = {}
    for r in rows:
        cur = final.get(r["id"])
        if cur is None or (r["__ts_ms"], r["__seq"]) >= (cur["__ts_ms"], cur["__seq"]):
            final[r["id"]] = r
    assert final[1]["v"] == "a2" and final[1]["__deleted"] is False
    assert final[2]["__deleted"] is True
    assert final[3]["v"] == "c" and final[3]["__deleted"] is False


def test_trending_topk_streaming_matches_batch(spark, tmp_path):
    from cdc_connector_spark.streaming.windows import top_keys_per_window

    rows = [
        ("2024-01-01 00:05:00", "click"), ("2024-01-01 00:10:00", "click"),
        ("2024-01-01 00:15:00", "view"), ("2024-01-01 00:20:00", "view"),
        ("2024-01-01 00:25:00", "error"),  # hour 0: click=2 view=2 error=1
        ("2024-01-01 01:05:00", "view"), ("2024-01-01 01:10:00", "view"),
        ("2024-01-01 01:15:00", "click"),  # hour 1: view=2 click=1
    ]
    src = str(tmp_path / "ev")
    batch_df = spark.createDataFrame(rows, "ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    batch_df.repartition(1).write.mode("overwrite").parquet(src)

    # streaming counts (watermarked) -> memory sink -> emission-side rank
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    counts = windowed_event_stats(stream, window="1 hour", value_col=None)
    q = (
        counts.writeStream.format("memory")
        .queryName("trend_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_t"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from trend_counts")
    top_stream = {
        (str(r["window_start"]), r["rk"]): r["event_type"]
        for r in top_keys_per_window(emitted, k=2).collect()
    }
    # batch parity: same builder + rank on the batch frame
    top_batch = {
        (str(r["window_start"]), r["rk"]): r["event_type"]
        for r in top_keys_per_window(
            windowed_event_stats(batch_df, window="1 hour", value_col=None), k=2
        ).collect()
    }
    assert top_stream == top_batch
    # deterministic tie-break: hour 0 click(2) ties view(2) -> click first
    h0 = [v for (w, _), v in sorted(top_stream.items()) if "00:00:00" in w]
    assert h0 == ["click", "view"]


def test_watermark_sizing_bound_drives_real_stream_drops(spark, tmp_path):
    """Close the watermark loop (r10 verdict #5): watermark_sizing's
    recommended bound goes into a REAL withWatermark stream and the
    measured late-drop count (numRowsDroppedByWatermark) equals the
    report row's prediction.

    The equivalence holds when lateness values sit outside the stream's
    ambiguity band (W, W + batch spacing + window]: the report predicts
    from per-event lateness, while Spark drops on window_end <= global
    watermark (= max event ts of PRIOR batches - W), so an event whose
    lateness lands inside the band is report-late but may still be
    accepted by the batch it arrives in. The fixture's latenesses are
    5 min and 60 min around W = 10 min with 30-min batch spacing and
    1-min windows — far from both edges.

    Files arrive while the query RUNS (default trigger +
    processAllAvailable): under trigger(availableNow) Spark 4.1 latches
    the late-event filter watermark at query start and drops NOTHING
    within the run — measured here, so the sizing report can only be
    validated against a live-arrival stream, which is also the shape
    the report models."""
    import os

    from cdc_connector_spark.ops.timeseries import watermark_sizing

    src = str(tmp_path / "wm_events")
    os.makedirs(src)
    schema = "ts timestamp, ingest_ts timestamp, event_type string, value double"
    batches = [
        # (event_ts, ingest_ts): one on-time "clock" event per batch
        # advances the watermark exactly like a live feed's head
        [("2024-01-01 01:00:00", "2024-01-01 01:00:00")],
        [
            ("2024-01-01 01:30:00", "2024-01-01 01:30:00"),
            ("2024-01-01 01:25:00", "2024-01-01 01:30:00"),  # 5m late: keep
            ("2024-01-01 00:30:00", "2024-01-01 01:30:00"),  # 60m late: drop
        ],
        [
            ("2024-01-01 02:00:00", "2024-01-01 02:00:00"),
            ("2024-01-01 01:55:00", "2024-01-01 02:00:00"),  # 5m late: keep
            ("2024-01-01 01:00:00", "2024-01-01 02:00:00"),  # 60m late: drop
        ],
    ]

    def write(i, rows):
        spark.createDataFrame(
            [(a, b, "click", 1.0) for a, b in rows],
            "ts_s string, in_s string, event_type string, value double",
        ).select(
            F.to_timestamp("ts_s").alias("ts"),
            F.to_timestamp("in_s").alias("ingest_ts"),
            "event_type",
            "value",
        ).repartition(1).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))

    for i, rows in enumerate(batches):
        write(i, rows)

    # 1) the sizing report on the whole feed
    batch_df = spark.read.schema(schema).option("recursiveFileLookup", "true").parquet(src)
    report = {
        r["watermark_minutes"]: r
        for r in watermark_sizing(batch_df, candidate_minutes=(1, 10, 120)).collect()
    }
    assert report[1]["late"] == 4 and report[120]["late"] == 0
    # recommended bound: smallest W losing <= 30% of events
    rec = min(m for m, r in report.items() if r["late_share"] <= 0.3)
    assert rec == 10
    predicted_late = report[rec]["late"]
    assert predicted_late == 2

    # 2) the REAL stream at that bound: files arrive between triggers
    import shutil

    live = str(tmp_path / "wm_live")
    os.makedirs(live)
    shutil.copytree(os.path.join(src, "f0"), os.path.join(live, "f0"))
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(live)
    )
    out = windowed_event_stats(
        stream, window="1 minute", key_col=None, watermark=f"{rec} minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wm_loop")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for i in (1, 2):
            shutil.copytree(os.path.join(src, f"f{i}"), os.path.join(live, f"f{i}"))
            q.processAllAvailable()
        dropped = sum(
            s.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for s in p.get("stateOperators", [])
        )
        rows = spark.sql("select * from wm_loop").collect()
    finally:
        q.stop()
    # update mode re-emits a window on every change: latest count = max
    per_window = {}
    for r in rows:
        per_window[r["window_start"]] = max(
            per_window.get(r["window_start"], 0), r["n_events"]
        )
    kept = sum(per_window.values())
    assert dropped == predicted_late  # report row == measured drops
    assert kept == sum(len(b) for b in batches) - predicted_late == 5
