"""Round-10 batch 3: MMR diversified top-k, TWAP, retry-window dedup,
daily-count streaks — brute-force-pinned."""

import math
import random

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.ann import mmr_topk
from cdc_connector_spark.ops.timeseries import count_streaks, retry_dedup, twap


# ------------------------------------------------------------------- mmr

def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 6)


def _mmr_brute(vecs, q, k, lam, fetch):
    simq = {i: _cos(v, q) for i, v in vecs.items()}
    pool = sorted(simq, key=lambda i: (-simq[i], i))[:fetch]
    picks = []
    for step in range(k):
        if not picks:
            best = min(pool, key=lambda i: (-simq[i], i))
            picks.append((best, simq[best], simq[best]))
        else:
            rem = [i for i in pool if i not in {p[0] for p in picks}]
            scored = []
            for i in rem:
                ms = max(_cos(vecs[i], vecs[p[0]]) for p in picks)
                scored.append((round(lam * simq[i] - (1 - lam) * ms, 6), i))
            score, best = max(((s, i) for s, i in scored), key=lambda t: (t[0], -t[1]))
            picks.append((best, simq[best], score))
    return picks


def test_mmr_matches_brute_and_diversifies(spark):
    rng = random.Random(17)
    # two tight clusters + scatter: plain top-3 would all come from
    # cluster A; MMR must mix in cluster B
    def jitter(base):
        return [b + rng.uniform(-0.01, 0.01) for b in base]

    A, B = [1.0, 0.0, 0.0, 0.0], [0.8, 0.6, 0.0, 0.0]
    vecs = {}
    for i in range(5):
        vecs[i] = jitter(A)
    for i in range(5, 10):
        vecs[i] = jitter(B)
    for i in range(10, 20):
        vecs[i] = [rng.uniform(-1, 1) for _ in range(4)]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    q = A
    got = [
        (r["id"], r["cos_sim"], r["mmr_score"])
        for r in mmr_topk(df, q, k=4, lam=0.5, fetch=12).collect()
    ]
    exp = _mmr_brute(vecs, q, k=4, lam=0.5, fetch=12)
    assert got == exp
    # diversification fired: not all picks from cluster A
    assert any(i >= 5 for i, _, _ in got)
    # plain top-4 WOULD be all cluster A (the contrast that motivates MMR)
    plain = sorted(vecs, key=lambda i: (-_cos(vecs[i], q), i))[:4]
    assert all(i < 5 for i in plain)


def test_mmr_k_equals_fetch_and_validation(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)], "vec_id long, embedding array<double>"
    )
    out = mmr_topk(df, [1.0, 1.0], k=3, fetch=3).collect()
    assert [r["pick"] for r in out] == [1, 2, 3]
    assert len({r["id"] for r in out}) == 3  # no repeats
    with pytest.raises(ValueError):
        mmr_topk(df, [1.0, 1.0], k=5, fetch=3)
    with pytest.raises(ValueError):
        mmr_topk(df, [1.0, 1.0], lam=1.5)


# ------------------------------------------------------------------ twap

def test_twap_locf_weighting(spark):
    # value 10 holds for 90 min, value 100 for 10 min, last sample closes
    rows = [
        (1, "t", "2024-01-01 00:00:00", 10.0),
        (2, "t", "2024-01-01 01:30:00", 100.0),
        (3, "t", "2024-01-01 01:40:00", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string, value double"
    ).select("event_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    row = twap(df).collect()[0]
    exp = (10.0 * 90 + 100.0 * 10) / 100
    assert row["twap"] == pytest.approx(round(exp, 6), abs=1e-9)
    assert row["duration_us"] == 100 * 60 * 1_000_000 and row["n"] == 3
    # plain AVG would say 39.0 — the burst-overweight TWAP corrects (19.0)
    assert abs(row["twap"] - 39.0) == pytest.approx(20.0, abs=1e-6)


def test_twap_single_sample_day_excluded(spark):
    df = spark.createDataFrame(
        [(1, "t", "2024-01-01 05:00:00", 42.0)],
        "event_id long, event_type string, ts_s string, value double",
    ).select("event_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    assert twap(df).count() == 0


# ------------------------------------------------------------ retry dedup

def test_retry_dedup_burst_keeps_head(spark):
    rows = [
        # burst of 3 within 5s: keep head, drop 2 (chained echoes)
        (1, 7, "click", "2024-01-01 00:00:00"),
        (2, 7, "click", "2024-01-01 00:00:03"),
        (3, 7, "click", "2024-01-01 00:00:06"),
        # 10s later: new burst head
        (4, 7, "click", "2024-01-01 00:00:20"),
        # other user same second: NOT an echo (different key)
        (5, 8, "click", "2024-01-01 00:00:00"),
        (6, 7, "view", "2024-01-01 00:00:01"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {r["event_type"]: r for r in retry_dedup(df, within_seconds=5).collect()}
    assert (got["click"]["total"], got["click"]["dropped"], got["click"]["kept"]) == (5, 2, 3)
    assert got["view"]["dropped"] == 0


# --------------------------------------------------------------- streaks

def test_count_streaks_longest_run(spark):
    # daily counts: 2,1,2,3,4,1 -> longest increasing run 1,2,3,4 (len 4
    # incl. anchor) starting day 2
    counts = [2, 1, 2, 3, 4, 1]
    rows = []
    eid = 0
    for d, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, "t", f"2024-01-{d+1:02d} 10:00:00"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts_s string").select(
        "event_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    row = count_streaks(df).collect()[0]
    assert (row["streak_len"], row["streak_start"], row["streak_end"]) == (
        4,
        "2024-01-02",
        "2024-01-05",
    )
    assert row["n_days"] == 6
