"""Round-10 batch 2: daily percentile bands, bitemporal as-of,
column-profile diff, FK-consistent sampling, label-propagation
communities — each pinned against a brute-force in-test reference."""

import math

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.corpus import (
    consistent_fk_frames,
    consistent_fk_sample,
    hash_sample,
)
from cdc_connector_spark.ops.graph import label_propagation
from cdc_connector_spark.ops.scd import bitemporal_as_of
from cdc_connector_spark.ops.timeseries import daily_percentiles
from cdc_connector_spark.validation.checks import column_profile_diff


# ------------------------------------------------------------ percentiles

def test_daily_percentiles_nearest_rank(spark):
    vals = [5.0, 1.0, 9.0, 3.0, 7.0]  # sorted: 1 3 5 7 9
    rows = [("t", f"2024-01-01 0{i}:00:00", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = daily_percentiles(df, percentiles=(50, 90, 99)).collect()[0]
    # n=5: rank(50) = ceil(2.5) = 3 -> 5.0 ; rank(90) = ceil(4.5) = 5 -> 9.0
    assert (out["n"], out["p50"], out["p90"], out["p99"]) == (5, 5.0, 9.0, 9.0)


def test_daily_percentiles_multiday_and_nulls(spark):
    rows = [("t", "2024-01-01 01:00:00", 1.0), ("t", "2024-01-01 02:00:00", None)] + [
        ("t", "2024-01-02 01:00:00", float(v)) for v in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    got = {r["day"]: r for r in daily_percentiles(df, percentiles=(50, 99)).collect()}
    assert got["2024-01-01"]["n"] == 1 and got["2024-01-01"]["p99"] == 1.0
    assert got["2024-01-02"]["p50"] == 50.0 and got["2024-01-02"]["p99"] == 99.0


# ------------------------------------------------------------- bitemporal

def _ts(s):
    import datetime

    return int(
        datetime.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1_000_000
    )


def test_bitemporal_late_correction_changes_only_later_T(spark):
    # user 1: state A valid 01-01 recorded 01-01; CORRECTION: state B
    # valid 01-01 (same valid time) recorded 01-05 with higher event_id
    rows = [
        (1, 1, "A", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        (2, 1, "B", "2024-01-01 00:00:00", "2024-01-05 01:00:00"),
        (3, 2, "C", "2024-01-02 00:00:00", "2024-01-02 01:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, vs string, rs string"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("vs").cast("timestamp").alias("ts"),
        F.col("rs").cast("timestamp").alias("recorded_ts"),
    )
    V = _ts("2024-01-03 00:00:00")
    # T before the correction arrived: the world believed A
    before = {
        r["user_id"]: r["state"]
        for r in bitemporal_as_of(df, V, _ts("2024-01-04 00:00:00")).collect()
    }
    assert before == {1: "A", 2: "C"}
    # T after the correction: same V now answers B (event_id tie-break)
    after = {
        r["user_id"]: r["state"]
        for r in bitemporal_as_of(df, V, _ts("2024-01-06 00:00:00")).collect()
    }
    assert after == {1: "B", 2: "C"}
    # V before user 2's first state: user 2 absent (stated, not padded)
    early = {
        r["user_id"]: r["state"]
        for r in bitemporal_as_of(
            df, _ts("2024-01-01 12:00:00"), _ts("2024-01-06 00:00:00")
        ).collect()
    }
    assert early == {1: "B"}


def test_bitemporal_latest_recorded_wins_equal_valid_ts(spark):
    """The canonical bitemporal case (r10 ADVICE): a late-arriving
    correction carries the SAME valid time but a LOWER event_id (e.g. a
    replayed upstream id) — the latest-RECORDED version must win; with
    only order_cols (event_id DESC) breaking the tie, the stale original
    would."""
    rows = [
        (9, 1, "STALE", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        (2, 1, "FIXED", "2024-01-01 00:00:00", "2024-01-05 01:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, vs string, rs string"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("vs").cast("timestamp").alias("ts"),
        F.col("rs").cast("timestamp").alias("recorded_ts"),
    )
    V = _ts("2024-01-03 00:00:00")
    # T sees both versions: latest recorded_ts wins despite event_id 2 < 9
    got = {
        r["user_id"]: r["state"]
        for r in bitemporal_as_of(df, V, _ts("2024-01-06 00:00:00")).collect()
    }
    assert got == {1: "FIXED"}
    # T before the correction: the stale original is (correctly) the answer
    before = {
        r["user_id"]: r["state"]
        for r in bitemporal_as_of(df, V, _ts("2024-01-02 00:00:00")).collect()
    }
    assert before == {1: "STALE"}


# ------------------------------------------------------------ profile diff

def test_column_profile_diff_detects_each_drift_kind(spark):
    src = spark.createDataFrame(
        [(i, float(i) / 4, f"s{i % 5}") for i in range(40)], "k long, x double, s string"
    )
    # sink: 2 rows dropped, one x value nulled, s intact
    snk = src.filter(F.col("k") < 38).withColumn(
        "x", F.when(F.col("k") == 0, None).otherwise(F.col("x"))
    )
    out = {r["column"]: r for r in column_profile_diff(src, snk, ["k", "x", "s"]).collect()}
    assert not out["k"]["profile_match"] and out["k"]["snk_rows"] == 38
    assert out["x"]["snk_nulls"] == 1 and not out["x"]["profile_match"]
    assert out["s"]["src_distinct"] == out["s"]["snk_distinct"] == 5
    # same multiset -> fingerprints equal; any drift -> unequal
    same = {r["column"]: r for r in column_profile_diff(src, src, ["k", "x", "s"]).collect()}
    assert all(r["profile_match"] for r in same.values())
    # fingerprint is ORDER-FREE: a reshuffled table profiles identically
    shuffled = src.orderBy(F.col("x").desc()).repartition(7)
    re = {r["column"]: r for r in column_profile_diff(src, shuffled, ["k", "x", "s"]).collect()}
    assert all(r["profile_match"] for r in re.values())


def test_column_profile_diff_hll_mode_parity(spark):
    """distinct_mode='hll' (r10 verdict #3): the executable sketch swap.
    Same drift detection as exact mode (rows/nulls/fingerprints are the
    same exact stats), distinct columns become the deterministic HLL
    estimate — pinned equal to hll_distinct's est on the same column,
    accurate on the fixture, and equal-multiset inputs still match."""
    import pytest as _pytest

    from cdc_connector_spark.ops.sketch import hll_distinct

    src = spark.createDataFrame(
        [(i, float(i) / 4, f"s{i % 5}") for i in range(40)], "k long, x double, s string"
    )
    snk = src.filter(F.col("k") < 38).withColumn(
        "x", F.when(F.col("k") == 0, None).otherwise(F.col("x"))
    )
    out = {
        r["column"]: r
        for r in column_profile_diff(src, snk, ["k", "x", "s"], distinct_mode="hll").collect()
    }
    # exact-stat drift detection identical to exact mode
    assert not out["k"]["profile_match"] and out["k"]["snk_rows"] == 38
    assert out["x"]["snk_nulls"] == 1 and not out["x"]["profile_match"]
    # estimate == hll_distinct's est on the same (typed) column
    [hd] = hll_distinct(
        src.select(F.col("s").alias("v"), F.lit("s").alias("g")), "v", "g", p=12
    ).collect()
    assert out["s"]["src_distinct"] == hd["est"]
    # sketch accuracy at fixture scale: 5 distinct, ~exact at p=12
    assert out["s"]["src_distinct"] == _pytest.approx(5.0, rel=0.05)
    assert out["k"]["src_distinct"] == _pytest.approx(40.0, rel=0.05)
    # equal multisets -> equal registers -> full match
    same = {
        r["column"]: r
        for r in column_profile_diff(src, src, ["k", "x", "s"], distinct_mode="hll").collect()
    }
    assert all(r["profile_match"] for r in same.values())
    # all-NULL column estimates 0.0 (the exact-mode convention)
    nulled = src.withColumn("x", F.lit(None).cast("double"))
    z = {
        r["column"]: r
        for r in column_profile_diff(nulled, nulled, ["x"], distinct_mode="hll").collect()
    }
    assert z["x"]["src_distinct"] == 0.0 and z["x"]["profile_match"]
    with _pytest.raises(ValueError):
        column_profile_diff(src, snk, ["k"], distinct_mode="bogus")


# ---------------------------------------------------------------- fk sample

def test_consistent_fk_sample_referential_integrity(spark):
    parents = spark.createDataFrame([(i,) for i in range(200)], "pk long")
    children = spark.createDataFrame(
        [(i, i % 200) for i in range(1000)], "ck long, fk long"
    )
    frames = consistent_fk_frames(parents, [("child", children, "fk")], "pk", pct=20)
    kept_parents = {r["pk"] for r in frames[0][1].collect()}
    kept_children = frames[1][1].collect()
    # every kept child points at a kept parent (zero orphans)
    assert all(r["fk"] in kept_parents for r in kept_children)
    # rate lands near pct on the parent (multiplicative-hash uniformity)
    assert 20 <= len(kept_parents) <= 60
    # matches the standalone hash_sample decision exactly
    direct = {r["pk"] for r in hash_sample(parents, 20, key_col="pk").collect()}
    assert kept_parents == direct
    summary = {r["table"]: r for r in consistent_fk_sample(
        parents, [("child", children, "fk")], "pk", pct=20
    ).collect()}
    assert summary["parent"]["rows_kept"] == len(kept_parents)
    assert summary["child"]["distinct_keys"] == len(kept_parents)  # 5 children each


# ------------------------------------------------------------- label prop

def _lpa_brute(edges, rounds):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            counts = {}
            for u in adj[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        labels = new
    return labels


def test_label_propagation_matches_brute_sync(spark):
    import random

    rng = random.Random(9)
    edges = list({(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "src int, dst int")
    for rounds in (1, 3):
        got = {r["node"]: r["label"] for r in label_propagation(e, rounds=rounds).collect()}
        assert got == _lpa_brute(edges, rounds)


def test_label_propagation_two_cliques_bridge(spark):
    # two 4-cliques joined by one bridge edge: LPA keeps them separate
    # communities (CC would merge them into one)
    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    e = spark.createDataFrame(clique1 + clique2 + [(3, 10)], "src int, dst int")
    got = {r["node"]: r["label"] for r in label_propagation(e, rounds=3).collect()}
    assert len({got[v] for v in range(4)}) == 1
    assert len({got[v] for v in range(10, 14)}) == 1
    assert got[0] != got[12]
