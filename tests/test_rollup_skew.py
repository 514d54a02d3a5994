"""Incremental rollup (IVM) parity + salted-join equivalence."""

from pyspark.sql import functions as F

from cdc_connector_spark.ops.rollup import merge_rollup, rollup_delta, rollup_read
from cdc_connector_spark.ops.skew import salted_join


def _events(spark):
    rows = [
        # (event_id, ts, event_type, value, op)
        (1, "2024-01-01 00:10:00", "click", 1.0, "c"),
        (2, "2024-01-01 00:20:00", "click", 2.0, "c"),
        (3, "2024-01-01 00:30:00", "view", 4.0, "c"),
        (4, "2024-01-01 01:10:00", "click", 8.0, "c"),
        (5, "2024-01-01 00:20:00", "click", 2.0, "d"),  # retracts event 2
        (6, "2024-01-01 01:30:00", "view", 16.0, "c"),
        (7, "2024-01-01 01:10:00", "click", 8.0, "d"),  # retracts event 4
    ]
    return spark.createDataFrame(
        rows, "event_id int, ts string, event_type string, value double, op string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _as_dict(df):
    return {
        (r["window_start"].isoformat(), r["event_type"]): (r["n_events"], float(r["sum_value"]))
        for r in rollup_read(df).collect()
    }


def test_incremental_equals_full_recompute(spark):
    ev = _events(spark)
    full = rollup_delta(ev, key_cols=["event_type"], op_col="op")

    b1 = ev.filter(F.col("event_id") <= 3)
    b2 = ev.filter(F.col("event_id") > 3)
    inc = merge_rollup(
        merge_rollup(None, rollup_delta(b1, key_cols=["event_type"], op_col="op"), ["event_type"]),
        rollup_delta(b2, key_cols=["event_type"], op_col="op"),
        ["event_type"],
    )
    assert _as_dict(inc) == _as_dict(merge_rollup(None, full, ["event_type"]))


def test_batch_order_does_not_matter(spark):
    ev = _events(spark)
    b1 = ev.filter(F.col("event_id") <= 3)
    b2 = ev.filter(F.col("event_id") > 3)
    d1 = rollup_delta(b1, key_cols=["event_type"], op_col="op")
    d2 = rollup_delta(b2, key_cols=["event_type"], op_col="op")
    a = merge_rollup(merge_rollup(None, d1, ["event_type"]), d2, ["event_type"])
    b = merge_rollup(merge_rollup(None, d2, ["event_type"]), d1, ["event_type"])
    assert _as_dict(a) == _as_dict(b)


def test_fully_retracted_window_vanishes(spark):
    ev = _events(spark)
    # hour 01 'click': event 4 inserted then retracted by event 7 → gone
    out = _as_dict(merge_rollup(None, rollup_delta(ev, key_cols=["event_type"], op_col="op"), ["event_type"]))
    assert ("2024-01-01T01:00:00", "click") not in out
    assert out[("2024-01-01T00:00:00", "click")] == (1, 1.0)  # only event 1 survives
    assert out[("2024-01-01T01:00:00", "view")] == (1, 16.0)


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    # skew: key 0 on 50% of rows
    big = big.withColumn("k", F.when(F.col("payload") % 2 == 0, 0).otherwise(F.col("k")))
    small = spark.createDataFrame([(i, f"dim_{i}") for i in range(7)], "k long, name string")

    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, on="k").select("k", "payload", "name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0 and salted.exceptAll(plain).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
    small = spark.createDataFrame([(1, "dim")], "k int, name string")
    out = {r["k"]: r["name"] for r in salted_join(big, small, on="k", how="left").collect()}
    assert out == {1: "dim", 99: None}


def test_audio_decode_stub(spark):
    from cdc_connector_spark.ops.multimodal import decode_audio_features

    df = spark.createDataFrame([(1, bytearray(b"abc")), (2, None)], "media_id long, media binary")
    rows = {r["media_id"]: r for r in decode_audio_features(df, fake=True).collect()}
    assert rows[1]["duration_ms"] == 30 and 8000 <= rows[1]["sample_rate"] <= 48000
    assert rows[2]["duration_ms"] == 0


def test_rollup_read_zero_count_transient_group_gives_null_avg(spark):
    """r14 review pin: a retract-before-insert group (count 0, nonzero
    sum — legitimate transient state) reads back with NULL avg, not IEEE
    Infinity (ANSI double/0 = Inf, which poisons downstream aggregates)."""
    from cdc_connector_spark.ops.rollup import rollup_read

    roll = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00", 0, -5.0),
         ("2024-01-01 00:00:00", "2024-01-01 01:00:00", 2, 10.0)],
        "window_start string, window_end string, n_events long, sum_value double",
    )
    rows = {r["n_events"]: r["avg_value"] for r in rollup_read(roll).collect()}
    assert rows[0] is None
    assert rows[2] == 5.0


def test_salted_join_salt_is_deterministic_row_hash(spark):
    """r14 review pin: the salt derives from the row CONTENT (xxhash64 of
    all columns), not monotonically_increasing_id — a recomputed task
    must route every row to the same salt bucket or shuffle-retry can
    lose/duplicate rows (the SPARK-23207 class). Same input therefore
    always produces the same bucket assignment."""
    from cdc_connector_spark.ops.skew import salted_join
    from pyspark.sql import functions as F

    big = spark.createDataFrame([(i % 3, i) for i in range(200)], "k int, v int")
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    out1 = sorted((r["k"], r["v"], r["name"]) for r in salted_join(big, small, "k").collect())
    out2 = sorted((r["k"], r["v"], r["name"]) for r in salted_join(big, small, "k").collect())
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in big.join(small, "k").collect()
    )
    assert out1 == out2 == plain
    # and the salt expression itself is reproducible run-to-run
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(16))
    )
    a = {(r["k"], r["v"]): r["__salt"] for r in salted.collect()}
    b = {(r["k"], r["v"]): r["__salt"] for r in salted.collect()}
    assert a == b


def test_salted_join_tolerates_unhashable_columns(spark):
    """r15 advisor pin: xxhash64 raises on MapType columns at analysis
    time, so the salt hashes only hashable columns — a big side carrying a
    map payload must still join correctly."""
    from cdc_connector_spark.ops.skew import salted_join
    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [(i % 3, i) for i in range(60)], "k int, v int"
    ).withColumn("props", F.create_map(F.lit("n"), F.col("v")))
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    got = sorted(
        (r["k"], r["v"], r["props"]["n"], r["name"])
        for r in salted_join(big, small, "k").collect()
    )
    want = sorted(
        (r["k"], r["v"], r["props"]["n"], r["name"])
        for r in big.join(small, "k").collect()
    )
    assert got == want
    # nested map inside an array/struct is also excluded from the salt
    big2 = big.withColumn("nested", F.array(F.col("props")))
    assert salted_join(big2, small, "k").count() == 60


def test_zorder_interleave_rejects_sign_bit_overflow(spark):
    """r14 review pin: k*bits > 63 raises (the top bit would land in the
    long's sign position and order the hottest z-range FIRST)."""
    import pytest

    from cdc_connector_spark.ops.zorder import zvalue

    df = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
    with pytest.raises(ValueError, match="63 value bits"):
        zvalue(df, ["a", "b", "c", "d"], bits=16)
