"""ops/rangejoin.py — bin-bucketed band join.

Value verification is the driver oracle (`band_join_acctbal` vs DuckDB's
native range join); these tests pin boundary inclusivity, exactly-once
pair emission for bin-spanning intervals, negative-domain floor handling,
the guards, and a randomized brute-force equivalence."""

import random

import pytest

from pyspark.sql import functions as F

from cdc_connector_spark.ops.rangejoin import band_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "p_id bigint, bal double")


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "i_id bigint, lo double, hi double")


def test_band_join_boundaries_inclusive_and_no_dups(spark):
    pts = _points(spark, [(1, 10.0), (2, 20.0), (3, 20.0001), (4, -5.0)])
    # interval spanning MANY bins (width 1) must still emit each pair once
    ivs = _intervals(spark, [(100, 10.0, 20.0), (200, -7.5, -2.5)])
    out = band_join(pts, ivs, "bal", "lo", "hi", bin_width=1.0).collect()
    got = sorted((r["p_id"], r["i_id"]) for r in out)
    assert got == [(1, 100), (2, 100), (4, 200)]  # 3 is past hi; no dups


def test_band_join_extra_keys_partition_the_match(spark):
    pts = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 10.0, "B")], "p_id bigint, bal double, grp string"
    )
    ivs = spark.createDataFrame(
        [(100, 5.0, 15.0, "A")], "i_id bigint, lo double, hi double, grp string"
    )
    out = band_join(pts, ivs, "bal", "lo", "hi", 10.0, extra_keys=["grp"]).collect()
    assert [(r["p_id"], r["i_id"]) for r in out] == [(1, 100)]
    assert "grp" in out[0].asDict()  # key survives exactly once


def test_band_join_guards(spark):
    pts = _points(spark, [(1, 1.0)])
    ivs = _intervals(spark, [(1, 0.0, 2.0)])
    with pytest.raises(ValueError, match="inner"):
        band_join(pts, ivs, "bal", "lo", "hi", 1.0, how="left")
    with pytest.raises(ValueError, match="bin_width"):
        band_join(pts, ivs, "bal", "lo", "hi", 0.0)
    clash = pts.withColumnRenamed("p_id", "i_id")
    with pytest.raises(ValueError, match="ambiguous"):
        band_join(clash, ivs, "bal", "lo", "hi", 1.0)


def test_band_join_matches_bruteforce_random(spark):
    rng = random.Random(17)
    pts = [(i, round(rng.uniform(-100, 100), 3)) for i in range(120)]
    ivs = []
    for i in range(60):
        lo = round(rng.uniform(-110, 90), 3)
        ivs.append((1000 + i, lo, round(lo + rng.uniform(0, 40), 3)))
    for w in (0.7, 10.0, 250.0):  # widths below/at/above typical length
        out = band_join(
            _points(spark, pts).repartition(4),
            _intervals(spark, ivs).repartition(3),
            "bal", "lo", "hi", w,
        ).collect()
        got = sorted((r["p_id"], r["i_id"]) for r in out)
        exp = sorted(
            (p, i) for p, b in pts for i, lo, hi in ivs if lo <= b <= hi
        )
        assert got == exp, w
        assert len(exp) > 0


def test_interval_overlap_join_exactly_once_and_bruteforce(spark):
    from cdc_connector_spark.ops.rangejoin import interval_overlap_join

    rng = random.Random(23)
    lhs = []
    for i in range(50):
        lo = round(rng.uniform(-60, 60), 3)
        lhs.append((i, lo, round(lo + rng.uniform(0, 30), 3)))
    rhs = []
    for i in range(40):
        lo = round(rng.uniform(-60, 60), 3)
        rhs.append((100 + i, lo, round(lo + rng.uniform(0, 30), 3)))
    L = spark.createDataFrame(lhs, "l_id bigint, l_lo double, l_hi double")
    R = spark.createDataFrame(rhs, "r_id bigint, r_lo double, r_hi double")
    for w in (2.0, 15.0, 200.0):
        out = interval_overlap_join(
            L.repartition(3), R.repartition(4), "l_lo", "l_hi", "r_lo", "r_hi", w
        ).collect()
        got = sorted((r["l_id"], r["r_id"]) for r in out)
        exp = sorted(
            (a, b)
            for a, alo, ahi in lhs
            for b, blo, bhi in rhs
            if alo <= bhi and blo <= ahi
        )
        assert got == exp, w          # exactly-once: sorted lists equal
        assert len(got) == len(set(got))
        assert len(exp) > 0
