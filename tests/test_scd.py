"""ops/scd.py — SCD Type 2 validity intervals from a change stream."""

from __future__ import annotations

from datetime import datetime

from cdc_connector_spark.ops.scd import scd2_intervals


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def _us(dt):
    return int((dt - datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def test_scd2_intervals_compression_and_bounds(spark):
    t0 = datetime(2024, 1, 1)

    def ts(i):
        return t0.replace(minute=i)

    rows = [
        # user 1: A A B A  -> versions A(0..2) B(2..3) A(3..open):
        # the echo at minute 1 compresses; recurrence at minute 3 is NEW
        (1, ts(0), 1, "A"), (2, ts(1), 1, "A"), (3, ts(2), 1, "B"), (4, ts(3), 1, "A"),
        # user 2: single state -> one open interval
        (5, ts(0), 2, "X"),
    ]
    got = {
        (r["user_id"], r["version"]): r
        for r in scd2_intervals(_ev(spark, rows)).collect()
    }
    assert len(got) == 4
    v1, v2, v3 = got[(1, 1)], got[(1, 2)], got[(1, 3)]
    assert [v1["state"], v2["state"], v3["state"]] == ["A", "B", "A"]
    assert v1["effective_from_us"] == _us(ts(0))
    assert v1["effective_to_us"] == _us(ts(2)) == v2["effective_from_us"]
    assert v2["effective_to_us"] == _us(ts(3)) == v3["effective_from_us"]
    assert v3["effective_to_us"] is None and v3["is_current"]
    assert not v1["is_current"] and not v2["is_current"]
    u2 = got[(2, 1)]
    assert u2["state"] == "X" and u2["is_current"] and u2["effective_to_us"] is None


def test_scd2_intervals_duplicate_ts_tiebreak(spark):
    # same timestamp, different states: event_id orders them, so the
    # intervals are deterministic (B at eid 10 precedes C at eid 11)
    t0 = datetime(2024, 1, 1)
    rows = [(10, t0, 1, "B"), (11, t0, 1, "C")]
    got = sorted(
        scd2_intervals(_ev(spark, rows)).collect(), key=lambda r: r["version"]
    )
    assert [r["state"] for r in got] == ["B", "C"]
    assert got[0]["effective_to_us"] == got[1]["effective_from_us"]
    assert got[1]["is_current"] and not got[0]["is_current"]


def test_bitemporal_cutoffs_reach_parquet_scan(spark, tmp_path):
    """r13 review pin: both bitemporal cutoffs must appear in
    PushedFilters as raw-column comparisons — the pre-r13 form filtered
    on unix_micros(cast(...)), a computed expression the scan cannot
    see (only IsNotNull pushed; a recorded-day partition layout pruned
    nothing)."""
    import re

    from cdc_connector_spark.ops.scd import bitemporal_as_of

    df = spark.range(10).selectExpr(
        "id as user_id",
        "'a' as event_type",
        "timestamp_micros(cast(id*1000000 as bigint)) as ts",
        "timestamp_micros(cast(id*1000000 as bigint)) as recorded_ts",
        "id as event_id",
    )
    p = str(tmp_path / "bt")
    df.write.parquet(p)
    out = bitemporal_as_of(
        spark.read.parquet(p), valid_at_us=5_000_000, known_at_us=4_000_000
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "LessThanOrEqual(recorded_ts" in pushed, pushed
    assert "LessThanOrEqual(ts" in pushed, pushed
    # semantics unchanged: recorded cutoff 4s hides the 5s row
    got = {(r["user_id"], r["valid_from_us"]) for r in out.collect()}
    assert got == {(i, i * 1_000_000) for i in range(5)}
