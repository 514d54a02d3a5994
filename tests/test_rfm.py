"""ops/rfm.py — RFM segmentation with CDF-quantile (ntile-free) scoring."""

from __future__ import annotations

import datetime as dt
import math

from cdc_connector_spark.ops.rfm import rfm_segments


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )


def _ts(d):
    return dt.datetime(2024, 1, d)


def test_rfm_hand_checked_two_buckets(spark):
    # customer -> (last day, n orders, total)
    rows = [
        (1, 10, _ts(1), 10.0),
        (2, 20, _ts(2), 5.0),
        (3, 20, _ts(3), 5.0),
        (4, 30, _ts(3), 5.0),
        (5, 30, _ts(4), 5.0),
        (6, 30, _ts(4), 5.0),
        (7, 40, _ts(4), 100.0),
    ]
    out = {r["customer"]: r for r in rfm_segments(_orders(spark, rows), buckets=2).collect()}
    n = 4
    # recency_days: c10=3, c20=1, c30=0, c40=0 (asof = 2024-01-04)
    assert {c: out[c]["recency_days"] for c in out} == {10: 3, 20: 1, 30: 0, 40: 0}
    # r: worst-first desc cum -> 3:cum1->ceil(2/4)=1; 1:cum2->1; 0:cum4->2
    assert {c: out[c]["r"] for c in out} == {10: 1, 20: 1, 30: 2, 40: 2}
    # frequency: c10=1,c20=2,c30=3,c40=1 -> asc cum: 1:2->1; 2:3->2; 3:4->2
    assert {c: out[c]["f"] for c in out} == {10: 1, 40: 1, 20: 2, 30: 2}
    # monetary units: c10=10, c20=10, c30=15, c40=100 -> cum: 10:2->1; 15:3->2; 100:4->2
    assert {c: out[c]["m"] for c in out} == {10: 1, 20: 1, 30: 2, 40: 2}
    assert out[40]["segment"] == 2 * 100 + 1 * 10 + 2
    assert out[10]["monetary_cents"] == 1000


def test_rfm_ties_share_bucket_and_cents_exact(spark):
    rows = [
        (1, 1, _ts(1), 0.1 + 0.2),  # float-noise amount -> exact cents 30
        (2, 2, _ts(1), 0.3),
    ]
    out = {r["customer"]: r for r in rfm_segments(_orders(spark, rows), buckets=5).collect()}
    assert out[1]["monetary_cents"] == out[2]["monetary_cents"] == 30
    for k in ("r", "f", "m", "segment"):
        assert out[1][k] == out[2][k]


def test_rfm_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    rows = []
    ok = 0
    for c in range(1, 21):
        for _ in range(rng.randint(1, 5)):
            ok += 1
            rows.append((ok, c, _ts(rng.randint(1, 28)), rng.randint(1, 500) / 1.0))
    out = {r["customer"]: r for r in rfm_segments(_orders(spark, rows), buckets=5).collect()}

    # python reference of the documented rule
    per = {}
    for _, c, d, amt in rows:
        last, n, cents = per.get(c, (dt.datetime(1, 1, 1), 0, 0))
        per[c] = (max(last, d), n + 1, cents + round(amt * 100))
    asof = max(v[0] for v in per.values())
    base = {
        c: ((asof - v[0]).days, v[1], v[2], v[2] // 100) for c, v in per.items()
    }
    N = len(base)

    def scores(vals, worst_first_key):
        uniq = sorted(set(vals), key=worst_first_key)
        cum, out_s = 0, {}
        cnt = {}
        for v in vals:
            cnt[v] = cnt.get(v, 0) + 1
        for v in uniq:
            cum += cnt[v]
            out_s[v] = math.ceil(5 * cum / N)
        return out_s

    rs = scores([b[0] for b in base.values()], worst_first_key=lambda v: -v)
    fs = scores([b[1] for b in base.values()], worst_first_key=lambda v: v)
    ms = scores([b[3] for b in base.values()], worst_first_key=lambda v: v)
    for c, (rd, fq, cents, mu) in base.items():
        row = out[c]
        assert (row["recency_days"], row["frequency"], row["monetary_cents"]) == (rd, fq, cents)
        assert (row["r"], row["f"], row["m"]) == (rs[rd], fs[fq], ms[mu]), c


# --------------------------------------------------- revenue_concentration


def test_revenue_concentration_hand_checked(spark):
    from cdc_connector_spark.ops.rfm import revenue_concentration

    rows = [(i, c, _ts(1), amt) for i, (c, amt) in enumerate(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, 700.0)]
    )]
    df = _orders(spark, rows)
    r = revenue_concentration(df, top_num=1, top_den=4).collect()[0]
    # sorted asc [100,100,100,700]: S1=3400, G = 2*3400/(4*1000) - 5/4
    assert r["gini"] == 0.45 and r["top_share"] == 0.7
    assert r["n_customers"] == 4 and r["total_units"] == 1000


def test_revenue_concentration_equal_is_zero_gini(spark):
    from cdc_connector_spark.ops.rfm import revenue_concentration

    rows = [(i, i, _ts(1), 100.0) for i in range(10)]
    r = revenue_concentration(_orders(spark, rows)).collect()[0]
    assert r["gini"] == 0.0 and r["top_share"] == 0.1


def test_revenue_concentration_tie_straddle(spark):
    """k falls inside a tied value group: the straddling group contributes
    exactly (k - cprev) of its members."""
    from cdc_connector_spark.ops.rfm import revenue_concentration

    rows = [(i, i, _ts(1), 100.0) for i in range(9)] + [(9, 9, _ts(1), 1000.0)]
    # top 1/2 of 10 customers = 5: the 1000 whale + 4 of the 9 tied 100s
    r = revenue_concentration(_orders(spark, rows), top_num=1, top_den=2).collect()[0]
    assert r["top_share"] == round((1000 + 4 * 100) / 1900, 6)


def test_revenue_concentration_rejects_bad_fraction(spark):
    import pytest as _pytest

    from cdc_connector_spark.ops.rfm import revenue_concentration

    with _pytest.raises(ValueError):
        revenue_concentration(_orders(spark, [(1, 1, _ts(1), 1.0)]), top_num=5, top_den=5)
