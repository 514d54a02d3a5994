"""ops/timeseries.py — UCR-style sliding-window subsequence search."""

from __future__ import annotations

import pytest

from cdc_connector_spark.ops.timeseries import subsequence_search


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )


def test_subsequence_search_finds_planted_motif(spark):
    from datetime import datetime

    t0 = datetime(2024, 1, 1)

    def ts(i):
        return t0.replace(minute=i)

    rows = []
    # user 1: noise, then the exact pattern at positions 3..5
    vals1 = [5.0, 60.0, 12.0, 10.0, 20.0, 30.0, 44.0]
    rows += [(i, ts(i), 1, v) for i, v in enumerate(vals1)]
    # user 2: a near-miss (off by 1 at each point)
    vals2 = [11.0, 21.0, 31.0, 90.0]
    rows += [(100 + i, ts(i), 2, v) for i, v in enumerate(vals2)]
    # user 3: too short for the window
    rows += [(200, ts(0), 3, 10.0), (201, ts(1), 3, 20.0)]
    # NULL value must be dropped, not poison the series
    rows += [(300, ts(8), 1, None)]
    df = _ev(spark, rows)

    got = subsequence_search(df, query=[10.0, 20.0, 30.0], k=3).collect()
    assert (got[0]["user_id"], got[0]["start_pos"], got[0]["dist"]) == (1, 3, 0.0)
    assert (got[1]["user_id"], got[1]["start_pos"], got[1]["dist"]) == (2, 0, 3.0)
    assert all(r["user_id"] != 3 for r in got)


def test_subsequence_search_deterministic_order_and_guards(spark):
    from datetime import datetime

    t0 = datetime(2024, 1, 1)
    # two identical windows -> tie breaks by (user, start_pos)
    rows = [
        (1, t0.replace(minute=0), 1, 1.0),
        (2, t0.replace(minute=1), 1, 2.0),
        (3, t0.replace(minute=0), 2, 1.0),
        (4, t0.replace(minute=1), 2, 2.0),
    ]
    df = _ev(spark, rows)
    got = subsequence_search(df, query=[1.0, 2.0], k=2).collect()
    assert [(r["user_id"], r["start_pos"]) for r in got] == [(1, 0), (2, 0)]
    with pytest.raises(ValueError, match="non-empty"):
        subsequence_search(df, query=[])
    with pytest.raises(ValueError, match="k must"):
        subsequence_search(df, query=[1.0], k=0)


def test_funnel_earliest_completion_chaining(spark):
    from datetime import datetime

    from cdc_connector_spark.ops.timeseries import funnel

    t0 = datetime(2024, 1, 1)

    def ts(i):
        return t0.replace(minute=i)

    rows = [
        # user 1 completes A -> B -> C in order
        (1, ts(0), 1, "A"), (2, ts(1), 1, "B"), (3, ts(2), 1, "C"),
        # user 2: B BEFORE A, no B after -> stops at A
        (4, ts(0), 2, "B"), (5, ts(1), 2, "A"),
        # user 3: A then C then B -> reaches B but C never after B
        (6, ts(0), 3, "A"), (7, ts(1), 3, "C"), (8, ts(2), 3, "B"),
        # user 4: never does A -> not counted anywhere
        (9, ts(0), 4, "B"), (10, ts(1), 4, "C"),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    got = {r["step"]: (r["event_type"], r["users"], r["conversion_pct"]) for r in funnel(df, ["A", "B", "C"]).collect()}
    assert got[1] == ("A", 3, 1.0)
    assert got[2] == ("B", 2, round(2 / 3, 6))
    assert got[3] == ("C", 1, round(1 / 3, 6))
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        funnel(df, [])


def test_funnel_empty_first_step_reports_zero(spark):
    from datetime import datetime

    from cdc_connector_spark.ops.timeseries import funnel

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, "B")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    got = {r["step"]: (r["users"], r["conversion_pct"]) for r in funnel(df, ["A", "B"]).collect()}
    assert got[1] == (0, 0.0) and got[2] == (0, 0.0)


def test_cohort_retention_matrix(spark):
    from datetime import datetime

    from cdc_connector_spark.ops.timeseries import cohort_retention

    def d(day):
        return datetime(2024, 1, day)

    rows = [
        # cohort week of Jan 1: users 1,2; user 1 returns both later weeks,
        # user 2 returns only in week offset 2
        (1, d(2), 1, "x"), (2, d(9), 1, "x"), (3, d(16), 1, "x"),
        (4, d(3), 2, "x"), (5, d(17), 2, "x"),
        # cohort week of Jan 8: user 3, never returns
        (6, d(10), 3, "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {(r["cohort"], r["offset"]): (r["users"], r["retention_pct"])
           for r in cohort_retention(df, bucket="week").collect()}
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-01", 2)] == (2, 1.0)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert ("2024-01-08", 1) not in got
    import pytest as _pt

    with _pt.raises(ValueError, match="day/week/month"):
        cohort_retention(df, bucket="year")
    # month buckets use calendar arithmetic
    feb = spark.createDataFrame(
        [(1, datetime(2024, 1, 20), 1, "x"), (2, datetime(2024, 2, 2), 1, "x")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    gm = {(r["cohort"], r["offset"]) for r in cohort_retention(feb, bucket="month").collect()}
    assert gm == {("2024-01-01", 0), ("2024-01-01", 1)}


def _brute_funnel_users(events, steps, within=None, max_gap=None):
    """Exists-chain reference: events = [(user, type, t_seconds)]; returns
    {step_index: user_count} by exhaustive DFS over ordered chains."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, ty, t in events:
        per_user[u].append((t, ty))
    out = {i: 0 for i in range(len(steps))}
    for u, evs in per_user.items():
        evs.sort()
        best = -1  # deepest step index reached by any chain

        def dfs(k, prev_t, anchor):
            nonlocal best
            best = max(best, k - 1)
            if k == len(steps):
                return
            for t, ty in evs:
                if ty != steps[k]:
                    continue
                if prev_t is not None and not (t > prev_t):
                    continue
                if prev_t is not None and max_gap is not None and t - prev_t > max_gap:
                    continue
                if anchor is not None and within is not None and t - anchor > within:
                    continue
                dfs(k + 1, t, t if anchor is None else anchor)

        dfs(0, None, None)
        for i in range(best + 1):
            out[i] += 1
    return out


def test_funnel_windowed_vs_bruteforce_random(spark):
    """Exact exists-chain semantics: the anchored running-max formulation
    must agree with exhaustive chain search on random event paths, for
    within-only, gap-only, and combined windows."""
    import random
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import funnel_windowed

    rng = random.Random(42)
    steps = ["view", "click", "purchase"]
    base = datetime(2024, 1, 1)
    for trial, (within, max_gap) in enumerate(
        [(900.0, None), (None, 300.0), (900.0, 300.0), (None, None)]
    ):
        events = []
        eid = 0
        for u in range(25):
            for _ in range(rng.randint(0, 12)):
                eid += 1
                events.append(
                    (u, rng.choice(steps + ["noise"]), rng.randint(0, 3600))
                )
        df = spark.createDataFrame(
            [
                (i, u, ty, base + timedelta(seconds=t))
                for i, (u, ty, t) in enumerate(events)
            ],
            "event_id bigint, user_id bigint, event_type string, ts timestamp",
        )
        got = {
            r["step"] - 1: r["users"]
            for r in funnel_windowed(df, steps, within=within, max_gap=max_gap).collect()
        }
        want = _brute_funnel_users(
            [(u, ty, t) for (u, ty, t) in events], steps, within, max_gap
        )
        assert got == want, (trial, within, max_gap, got, want)


def test_funnel_windowed_edges(spark):
    """Boundary semantics: gap/within bounds are INCLUSIVE, ordering is
    strict (same-timestamp steps never chain), greedy-earliest would
    under-count (the second-entry user converts), unbounded equals
    funnel()."""
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import funnel, funnel_windowed

    base = datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [(i, u, ty, base + timedelta(seconds=s)) for i, (u, ty, s) in enumerate(rows)],
            "event_id bigint, user_id bigint, event_type string, ts timestamp",
        )

    # inclusive gap boundary: B exactly max_gap after A converts
    df = mk([(1, "A", 0), (1, "B", 300)])
    got = {r["step"]: r["users"] for r in funnel_windowed(df, ["A", "B"], max_gap=300.0).collect()}
    assert got == {1: 1, 2: 1}
    # strict ordering: same-timestamp B does not chain
    df = mk([(1, "A", 0), (1, "B", 0)])
    got = {r["step"]: r["users"] for r in funnel_windowed(df, ["A", "B"], max_gap=300.0).collect()}
    assert got == {1: 1, 2: 0}
    # greedy-earliest trap: first A's window expires, second A converts
    df = mk([(1, "A", 0), (1, "B", 500), (1, "A", 450)])
    got = {r["step"]: r["users"] for r in funnel_windowed(df, ["A", "B"], within=100.0).collect()}
    assert got == {1: 1, 2: 1}
    # entry-anchored within: chain must fit the window of ITS step-1 event
    df = mk([(1, "A", 0), (1, "B", 50), (1, "C", 200)])
    got = {r["step"]: r["users"] for r in funnel_windowed(df, ["A", "B", "C"], within=100.0).collect()}
    assert got == {1: 1, 2: 1, 3: 0}
    # unbounded == funnel()
    df = mk(
        [(1, "A", 0), (1, "B", 10), (2, "A", 5), (3, "B", 7), (2, "B", 3), (1, "C", 20)]
    )
    a = {(r["step"], r["users"], r["conversion_pct"]) for r in funnel(df, ["A", "B", "C"]).collect()}
    b = {(r["step"], r["users"], r["conversion_pct"]) for r in funnel_windowed(df, ["A", "B", "C"]).collect()}
    assert a == b
    with pytest.raises(ValueError, match="within"):
        funnel_windowed(df, ["A"], within=0)
    with pytest.raises(ValueError, match="max_gap"):
        funnel_windowed(df, ["A"], max_gap=-1)


def test_cohort_retention_dst_spring_forward(spark):
    """Week offsets are calendar-wise (datediff of dates), not epoch
    division: under a DST session timezone a one-week gap spanning
    spring-forward is 601200s, which epoch/604800 arithmetic truncates to
    offset 0 (double-counting the cohort). US spring-forward 2024 was
    Mar 10; week buckets Mar 4 and Mar 11 must be offsets 0 and 1."""
    from datetime import datetime

    from cdc_connector_spark.ops.timeseries import cohort_retention

    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.createDataFrame(
            [(1, datetime(2024, 3, 5), 1, "x"), (2, datetime(2024, 3, 12), 1, "x")],
            "event_id bigint, ts timestamp, user_id bigint, event_type string",
        )
        got = {(r["cohort"], r["offset"]): r["users"]
               for r in cohort_retention(df, bucket="week").collect()}
        assert got == {("2024-03-04", 0): 1, ("2024-03-04", 1): 1}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_rolling_daily_counts(spark):
    from datetime import datetime

    from cdc_connector_spark.ops.timeseries import rolling_daily_counts

    rows = [
        # type a: days 1,2,3 with counts 1,2,1; day 10 isolated
        (1, datetime(2024, 1, 1, 5), 1, "a"),
        (2, datetime(2024, 1, 2, 5), 1, "a"), (3, datetime(2024, 1, 2, 6), 1, "a"),
        (4, datetime(2024, 1, 3, 5), 1, "a"),
        (5, datetime(2024, 1, 10, 5), 1, "a"),
        # type b: one day
        (6, datetime(2024, 1, 2, 5), 1, "b"),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    got = {(r["event_type"], r["day"]): (r["n"], r["rolling"])
           for r in rolling_daily_counts(df, window_days=3).collect()}
    assert got[("a", "2024-01-01")] == (1, 1)
    assert got[("a", "2024-01-02")] == (2, 3)
    assert got[("a", "2024-01-03")] == (1, 4)
    assert got[("a", "2024-01-10")] == (1, 1)  # outside every earlier window
    assert got[("b", "2024-01-02")] == (1, 1)
    import pytest as _pt

    with _pt.raises(ValueError, match="window_days"):
        rolling_daily_counts(df, window_days=0)


def test_daily_anomalies(spark):
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import daily_anomalies

    rows = []
    eid = 0
    # type a: 10 quiet days of exactly 2 events, one day of 30 -> huge z
    for d in range(10):
        for _ in range(2):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + timedelta(days=d), 1, "a"))
    for _ in range(30):
        eid += 1
        rows.append((eid, datetime(2024, 1, 11), 1, "a"))
    # type b: constant series -> zero variance -> no rows
    for d in range(5):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + timedelta(days=d), 1, "b"))
    # type c: single day -> d=1 -> no rows
    eid += 1
    rows.append((eid, datetime(2024, 1, 1), 1, "c"))
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    got = daily_anomalies(df, z_threshold=2.0).collect()
    assert [(r["event_type"], r["day"], r["n"]) for r in got] == [("a", "2024-01-11", 30)]
    # z matches the exact-integer-sums formula
    d, s, ss = 11, 50, 940  # 10 days of 2 + one day of 30
    mean = s / d
    var = (ss - s * s / d) / (d - 1)
    assert abs(got[0]["z"] - round((30 - mean) / var ** 0.5, 6)) < 1e-9


def test_cusum_changepoints_vs_recursive_reference(spark):
    """The closed-form C − min(0, running-min C) must equal the textbook
    recursion S_t = max(0, S_{t-1} + x_t) on a randomized series, and a
    sustained small shift must alarm where single-day z-scores stay
    quiet."""
    import random
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import cusum_changepoints, daily_anomalies

    rng = random.Random(7)
    rows, eid = [], 0
    counts = []
    # 20 baseline days of 10±1, then 10 drifted days of 13±1 (small shift)
    for d in range(30):
        c = (10 if d < 20 else 13) + rng.choice([-1, 0, 1])
        counts.append(c)
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + timedelta(days=d), 1, "a"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {r["day"]: (r["s_pos"], r["s_neg"]) for r in cusum_changepoints(df, k=1, h=5).collect()}

    # recursive reference over the same integer series
    ref_level = sum(counts) * 1.0 / len(counts)
    import math
    ref_level = math.floor(ref_level)
    sp = sn = 0
    want = {}
    for d, c in enumerate(counts):
        sp = max(0, sp + c - ref_level - 1)
        sn = max(0, sn + ref_level - c - 1)
        if sp > 5 or sn > 5:
            day = (datetime(2024, 1, 1) + timedelta(days=d)).strftime("%Y-%m-%d")
            want[day] = (sp, sn)
    assert got == want and want  # alarms exist and match exactly
    # the drift is invisible to single-day z-scores at the same data
    zdays = {r["day"] for r in daily_anomalies(df, z_threshold=2.5).collect()}
    assert not (set(want) & zdays) or len(zdays) < len(want)


def test_linear_attribution(spark):
    """Equal split across in-window touches; inclusive window edge;
    out-of-window and other-user touches excluded; NULL-value purchases
    credit nothing."""
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import linear_attribution

    base = datetime(2024, 1, 1)

    def t(s):
        return base + timedelta(seconds=s)

    rows = [
        # user 1: clicks at 0, 50, then purchase(90) at 100 -> 45 each;
        # click at exactly window edge (100-100=0) INCLUSIVE
        (1, t(0), 1, "click", None),
        (2, t(50), 1, "click", None),
        (3, t(100), 1, "purchase", 90.0),
        # second purchase at 130 (window 100): clicks 50 only (0 is out) -> 60
        (4, t(130), 1, "purchase", 60.0),
        # user 2: click AFTER the purchase -> uncredited; NULL-value purchase
        (5, t(10), 2, "purchase", None),
        (6, t(20), 2, "click", None),
        # user 3: lone click, no purchase
        (7, t(0), 3, "click", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    got = {r["event_id"]: (r["n_conversions"], r["credit"])
           for r in linear_attribution(df, window=100.0).collect()}
    assert got == {1: (1, 45.0), 2: (2, 105.0)}
    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        linear_attribution(df, window=0)


def test_robust_anomalies_vs_zscore(spark):
    """A massive outlier day inflates stddev enough to HIDE a moderate
    spike from z-scores; the MAD detector flags both. MAD=0 (constant
    majority) types report nothing."""
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import daily_anomalies, robust_anomalies

    rows, eid = [], 0
    # type a: alternating 9/11 baseline (MAD 1), one 1000 day (gross),
    # one 40 day (moderate)
    counts = [9, 11] * 10 + [1000, 40]
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1) + timedelta(days=d), 1, "a"))
    # type b: strictly constant -> MAD 0 -> silent
    for d in range(9):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1) + timedelta(days=d), 1, "b"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    robust = {r["day"]: r["robust_z"] for r in robust_anomalies(df, z_threshold=3.5).collect()}
    plain = {r["day"] for r in daily_anomalies(df, z_threshold=2.0).collect()}
    d_gross = (datetime(2024, 1, 1) + timedelta(days=20)).strftime("%Y-%m-%d")
    d_mod = (datetime(2024, 1, 1) + timedelta(days=21)).strftime("%Y-%m-%d")
    assert d_gross in robust and d_mod in robust   # MAD flags both
    assert d_mod not in plain                      # sigma dragged by the 1000-day
    assert not any(day for day in robust if day not in (d_gross, d_mod))
    # exact modified z for the moderate day: median 11 (middle of the
    # 9/11 alternation), MAD 2 (devs 0×10, 2×10, 29, 989)
    assert abs(robust[d_mod] - round(0.6745 * (40 - 11.0) / 2.0, 6)) < 1e-9


def test_trend_by_key_exact_line_and_degenerates(spark):
    from datetime import datetime

    from cdc_connector_spark.ops.timeseries import trend_by_key

    t0 = datetime(2024, 3, 1)
    ud0 = (t0 - datetime(1970, 1, 1)).days
    rows = []
    eid = 0
    # "lin": day i has exactly 2i+3 events -> OLS fits slope 2 exactly
    for i in range(6):
        for _ in range(2 * i + 3):
            rows.append((eid, t0.replace(day=1 + i), 1, "lin")); eid += 1
    # "flat": constant 4/day -> slope 0, intercept 4
    for i in range(4):
        for _ in range(4):
            rows.append((eid, t0.replace(day=1 + i), 2, "flat")); eid += 1
    # "one": a single day -> dropped (zero x-variance)
    rows.append((eid, t0, 3, "one"))
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    got = {r["event_type"]: r for r in trend_by_key(df).collect()}
    assert set(got) == {"lin", "flat"}
    assert got["lin"]["days"] == 6
    assert got["lin"]["slope"] == 2.0
    assert got["lin"]["intercept"] == round(3.0 - 2.0 * ud0, 6)
    assert got["flat"]["slope"] == 0.0
    assert got["flat"]["intercept"] == 4.0


def test_transition_matrix_counts_and_probs(spark):
    from datetime import datetime

    from cdc_connector_spark.ops.timeseries import transition_matrix

    t0 = datetime(2024, 1, 1)

    def ts(i):
        return t0.replace(minute=i)

    rows = [
        # user 1: A B A C  -> A->B, B->A, A->C
        (1, ts(0), 1, "A"), (2, ts(1), 1, "B"), (3, ts(2), 1, "A"), (4, ts(3), 1, "C"),
        # user 2: A B      -> A->B
        (5, ts(0), 2, "A"), (6, ts(1), 2, "B"),
        # user 3: single event, no successor
        (7, ts(0), 3, "A"),
        # user 4: duplicate timestamp -> event_id breaks the tie: B then C
        (8, ts(5), 4, "B"), (9, ts(5), 4, "C"),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    got = {(r["cur_type"], r["next_type"]): (r["n"], r["p"]) for r in transition_matrix(df).collect()}
    assert got[("A", "B")] == (2, round(2 / 3, 6))
    assert got[("A", "C")] == (1, round(1 / 3, 6))
    assert got[("B", "A")] == (1, 0.5)
    assert got[("B", "C")] == (1, 0.5)
    assert ("C", "A") not in got  # C is always terminal here


def test_ewma_daily_matches_truncated_recursion_exactly(spark):
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import ewma_daily
    import pytest as _pytest

    t0 = datetime(2024, 1, 1)
    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, t0 + timedelta(days=i), 1, "x")); eid += 1
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    w = 4
    got = {r["day"]: (r["n"], r["ewma"]) for r in ewma_daily(df, window=w).collect()}
    # python replay of the truncated recursion, seeded at the oldest value
    for t in range(len(counts)):
        day = (t0 + timedelta(days=t)).strftime("%Y-%m-%d")
        if t < w - 1:
            assert day not in got  # warm-up rows must not emit
            continue
        s = float(counts[t - w + 1])
        for i in range(t - w + 2, t + 1):
            s = (counts[i] + s) / 2.0
        assert got[day] == (counts[t], s), (day, got[day], s)  # EXACT equality
    with _pytest.raises(ValueError, match="window"):
        ewma_daily(df, window=1)
    with _pytest.raises(ValueError, match="window"):
        ewma_daily(df, window=31)


def test_rolling_distinct_actives(spark):
    from datetime import datetime, timedelta

    from cdc_connector_spark.ops.timeseries import rolling_distinct_actives
    import pytest as _pytest

    t0 = datetime(2024, 1, 1)

    def d(i):
        return t0 + timedelta(days=i)

    rows = [
        # type A: user 1 active days 0,1,2; user 2 active day 2 ONLY;
        # user 1 twice on day 0 (distinct, not 2 actives)
        (1, d(0), 1, "A"), (2, d(0), 1, "A"), (3, d(1), 1, "A"),
        (4, d(2), 1, "A"), (5, d(2), 2, "A"),
        # day 9: outside any 3-day window of the earlier days
        (6, d(9), 3, "A"),
        # type B: single event — window isolation across types
        (7, d(1), 1, "B"),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    got = {(r["event_type"], r["day"]): r["actives"]
           for r in rolling_distinct_actives(df, window_days=3).collect()}
    day = lambda i: d(i).strftime("%Y-%m-%d")  # noqa: E731
    assert got[("A", day(0))] == 1          # dup rows collapse
    assert got[("A", day(1))] == 1
    assert got[("A", day(2))] == 2          # users {1, 2} in the window
    assert got[("A", day(9))] == 1          # old users aged out
    assert got[("B", day(1))] == 1
    # emission only on REAL event days — no phantom day-3/day-4 rows
    assert ("A", day(3)) not in got and ("A", day(4)) not in got
    assert len(got) == 5
    with _pytest.raises(ValueError, match="window_days"):
        rolling_distinct_actives(df, window_days=0)


def test_autocorrelation_alternating_series(spark):
    """A strictly alternating daily count series has ACF(1) = -1 and
    ACF(2) = +1; a lag with zero variance on a side is dropped."""
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.timeseries import autocorrelation

    rows = []
    eid = 0
    for d in range(10):  # days 1..10: counts 1,3,1,3,...
        n = 1 if d % 2 == 0 else 3
        for _ in range(n):
            rows.append((eid, f"2026-01-{d+1:02d} 12:00:00"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id bigint, ts string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    acf = {r.lag: (r.n, r.corr) for r in autocorrelation(df, max_lag=3).collect()}
    assert acf[1] == (9, -1.0)
    assert acf[2] == (8, 1.0)
    assert acf[3] == (7, -1.0)


def test_autocorrelation_pairs_calendar_wise(spark):
    """A missing day must NOT shift alignment: with days 1,2,4,5 at
    counts 1,2,4,5, lag-1 pairs are (1,2) and (4,5) only — never (2,4)."""
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.timeseries import autocorrelation

    rows = []
    eid = 0
    for d, n in [(1, 1), (2, 2), (4, 4), (5, 5)]:
        for _ in range(n):
            rows.append((eid, f"2026-01-{d:02d} 12:00:00"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id bigint, ts string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    acf = {r.lag: (r.n, r.corr) for r in autocorrelation(df, max_lag=2).collect()}
    # lag 1: pairs (1,2),(4,5) -> perfect positive line
    assert acf[1] == (2, 1.0)
    # lag 2: only (2..day4) pair exists -> 1 point, zero variance -> dropped
    assert 2 not in acf
    import pytest as _pt

    with _pt.raises(ValueError, match="max_lag"):
        autocorrelation(df, max_lag=0)


def test_session_window_merges_at_exact_gap_boundary(spark):
    """F.session_window semantics pin: an event EXACTLY gap seconds after
    the previous one still merges (new session strictly beyond the gap);
    session end = last event + gap."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2026-01-01 10:00:00"),
        (1, "2026-01-01 10:30:00"),   # exactly +gap -> merges
        (1, "2026-01-01 11:00:01"),   # +30:01 -> new session
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "sw.start", "sw.end", "n")
        .orderBy("start")
        .collect()
    )
    assert [(r.n, str(r.start), str(r.end)) for r in out] == [
        (2, "2026-01-01 10:00:00", "2026-01-01 11:00:00"),
        (1, "2026-01-01 11:00:01", "2026-01-01 11:30:01"),
    ]


# ------------------------------------------------------- weekday_profile


def test_weekday_profile_hand_checked(spark):
    import datetime as dt

    from cdc_connector_spark.ops.timeseries import weekday_profile

    # 2024-01-01 is a Monday. Mon: 3 events on 1 day; Tue: 1+3 on 2 days.
    rows = (
        [(dt.datetime(2024, 1, 1, 10), 1)] * 3
        + [(dt.datetime(2024, 1, 2, 10), 1)]
        + [(dt.datetime(2024, 1, 9, 10), 1)] * 3
    )
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    out = {r["weekday"]: r for r in weekday_profile(df).collect()}
    assert out[0]["n_days"] == 1 and out[0]["total_events"] == 3
    assert out[1]["n_days"] == 2 and out[1]["total_events"] == 4
    assert out[0]["mean_per_day"] == 3.0 and out[1]["mean_per_day"] == 2.0
    # overall mean = 7/3; ratios = 3/(7/3), 2/(7/3)
    assert out[0]["seasonal_ratio"] == round(3.0 / (7.0 / 3.0), 6)
    assert out[1]["seasonal_ratio"] == round(2.0 / (7.0 / 3.0), 6)


def test_weekday_profile_flat_series_ratio_one(spark):
    import datetime as dt

    from cdc_connector_spark.ops.timeseries import weekday_profile

    rows = [(dt.datetime(2024, 1, d, 12), 1) for d in range(1, 15)]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    out = weekday_profile(df).collect()
    assert len(out) == 7
    assert all(r["seasonal_ratio"] == 1.0 and r["n_days"] == 2 for r in out)


# ----------------------------------------------------- interevent_stats


def test_interevent_hand_checked_and_tie_stable(spark):
    import datetime as dt

    from cdc_connector_spark.ops.timeseries import interevent_stats

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1 click at 0, 10, 30 -> gaps 10s, 20s
        (1, ts(0), 1, "click"), (2, ts(10), 1, "click"), (3, ts(30), 1, "click"),
        # user 2 click at 5, 5 (duplicate ts) -> gap 0
        (4, ts(5), 2, "click"), (5, ts(5), 2, "click"),
        # single view -> no gap, type absent
        (6, ts(0), 1, "view"),
        # NULL user ignored
        (7, ts(1), None, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["event_type"]: r for r in interevent_stats(df).collect()}
    c = out["click"]
    assert c["n_gaps"] == 3 and c["min_us"] == 0
    assert c["max_us"] == 20_000_000
    # gaps sorted: [0, 10s, 20s] -> nearest-rank p50 = rank ceil(1.5)=2
    assert c["p50_us"] == 10_000_000
    assert "view" not in out


def test_interevent_nearest_rank_percentiles(spark):
    import datetime as dt

    from cdc_connector_spark.ops.timeseries import interevent_stats

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, 0, i * 10), 1, "t") for i in [0, 1, 3, 6, 10, 15]
    ]  # gaps 10,20,30,40,50 us
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = interevent_stats(df).collect()[0]
    # nearest-rank p90 over [10,20,30,40,50]: rank ceil(4.5) = 5 -> 50
    assert r["p90_us"] == 50 and r["n_gaps"] == 5
    # p50: rank ceil(2.5) = 3 -> 30
    assert r["p50_us"] == 30


# ------------------------------------------------------- session_summary


def test_session_summary_hand_checked(spark):
    import datetime as dt

    from cdc_connector_spark.ops.timeseries import session_summary

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m)

    rows = [
        # user 1: session A (0, 10) len 600s; session B (120) bounce
        (1, ts(0), 1), (2, ts(10), 1), (3, ts(120), 1),
        # user 2: one bounce session
        (4, ts(5), 2),
        # NULL user ignored
        (5, ts(6), None),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    r = session_summary(df, gap_seconds=1800).collect()[0]
    assert r["n_sessions"] == 3 and r["n_users"] == 2
    assert r["bounce_sessions"] == 2
    assert r["bounce_rate"] == round(2 / 3, 6)
    assert r["mean_events"] == round(4 / 3, 6)
    # lengths sorted [0, 0, 600]; nearest-rank median = rank 2 -> 0
    assert r["p50_session_s"] == 0


def test_session_summary_empty_input_reports_zeros(spark):
    from cdc_connector_spark.ops.timeseries import session_summary

    df = spark.createDataFrame([], "event_id long, ts timestamp, user_id long")
    r = session_summary(df).collect()[0]
    assert r["n_sessions"] == 0 and r["bounce_rate"] == 0.0
    assert r["p50_session_s"] is None


# ------------------------------------------------------------------ pettitt


def _brute_pettitt(x):
    """Brute sign double-sum reference: (t, u) at the first argmax of
    |U_t| with U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j)."""
    n = len(x)
    best = None
    for t in range(1, n):
        u = 0
        for i in range(t):
            for j in range(t, n):
                u += (x[i] > x[j]) - (x[i] < x[j])
        if best is None or abs(u) > abs(best[1]):
            best = (t, u)
    return best


def _daily_events(spark, counts, etype="a", start=None):
    """One event per unit: day d gets counts[d] rows."""
    from datetime import datetime, timedelta

    start = start or datetime(2024, 1, 1, 6)
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, start + timedelta(days=d), 1, etype))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_pettitt_detects_planted_level_shift(spark):
    from cdc_connector_spark.ops.timeseries import pettitt_changepoint

    counts = [5, 6, 5, 4, 5, 6, 5, 20, 21, 19, 20, 22, 21, 20]  # shift after day 7
    out = pettitt_changepoint(_daily_events(spark, counts)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["change_day"] == "2024-01-07"  # last low day (t = 7 prefix days)
    assert r["n_days"] == 14
    assert r["days_before"] == 7 and r["days_after"] == 7
    assert r["sum_before"] == sum(counts[:7]) and r["sum_after"] == sum(counts[7:])
    assert r["u_signed"] < 0  # prefix below suffix
    assert r["k_stat"] == abs(r["u_signed"])


def test_pettitt_matches_bruteforce_on_random_series(spark):
    import random

    from cdc_connector_spark.ops.timeseries import pettitt_changepoint

    rng = random.Random(11)
    for trial in range(6):
        n = rng.randint(4, 16)
        counts = [rng.randint(1, 6) for _ in range(n)]
        t_ref, u_ref = _brute_pettitt(counts)
        r = pettitt_changepoint(_daily_events(spark, counts)).collect()[0]
        assert r["u_signed"] == u_ref, (counts, r)
        assert r["days_before"] == t_ref, (counts, r, t_ref)


def test_pettitt_handles_ties_and_multi_type(spark):
    from cdc_connector_spark.ops.timeseries import pettitt_changepoint

    a = _daily_events(spark, [3, 3, 3, 9, 9, 9], etype="a")
    b = _daily_events(spark, [7, 7, 7, 7], etype="b")  # constant: U == 0
    out = {r["event_type"]: r for r in pettitt_changepoint(a.unionByName(b)).collect()}
    assert out["a"]["days_before"] == 3 and out["a"]["u_signed"] == -9  # 3*3*sign(3-9)
    # constant series: every U_t is 0; earliest day wins the tie
    assert out["b"]["k_stat"] == 0 and out["b"]["change_day"] == "2024-01-01"


# ----------------------------------------------------------------- seasonal


def test_seasonal_anomaly_ignores_weekly_cycle_global_flags_it(spark):
    """A weekly-cyclic feed (weekend counts 3x weekdays) with one truly
    anomalous Wednesday: the weekday-adjusted screen flags ONLY the
    Wednesday, while the global z-screen flags weekend days too."""
    from cdc_connector_spark.ops.timeseries import daily_anomalies, seasonal_anomalies

    # 2024-01-01 is a Monday; 6 full weeks
    counts = []
    for w in range(6):
        counts += [10, 10, 10, 10, 10, 30, 30]
    # plant the anomaly: third Wednesday (index 2 + 14) spikes
    counts[16] = 25
    df = _daily_events(spark, counts)
    # one outlier among d=6 samples caps |z| at (d-1)/sqrt(d) ~ 2.04
    seasonal = seasonal_anomalies(df, z_threshold=1.6).collect()
    assert [r["day"] for r in seasonal] == ["2024-01-17"]
    assert seasonal[0]["weekday"] == 2  # Wednesday, 0 = Monday
    global_days = {r["day"] for r in daily_anomalies(df, z_threshold=1.2).collect()}
    assert any(d in global_days for d in ("2024-01-06", "2024-01-07"))  # weekend noise


def test_seasonal_anomaly_skips_degenerate_cells(spark):
    from cdc_connector_spark.ops.timeseries import seasonal_anomalies

    # single week: every (type, weekday) cell has d == 1 -> no rows
    assert seasonal_anomalies(_daily_events(spark, [1, 2, 3, 4, 5, 6, 7])).count() == 0


# --------------------------------------------------- sessionize_scalable


def test_sessionize_scalable_equals_naive_window(spark):
    """r15 skew-rehearsal pin: the bucketed+repaired sessionizer returns
    EXACTLY the naive single-window formulation's sessions — randomized,
    with a hot key (40% of rows), sessions straddling bucket boundaries,
    one continuous chain spanning 3+ whole buckets, and equal-ts ties
    broken by order_col."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.timeseries import sessionize_scalable

    rng = random.Random(15)
    rows, t = [], 0.0
    for i in range(3000):
        key = 1 if rng.random() < 0.4 else rng.randrange(2, 30)
        # mixed gaps: mostly in-session, some > gap, some == gap (stay),
        # occasional long silence; plus a continuous run crossing buckets
        r = rng.random()
        if r < 0.6:
            t += rng.uniform(1, 50)
        elif r < 0.75:
            t += 60.0  # exactly the gap -> same session
        elif r < 0.95:
            t += rng.uniform(61, 400)
        else:
            t += rng.uniform(1000, 3000)
        rows.append((key, t, i))
    # duplicate-ts pair (tie broken by order_col)
    rows.append((1, rows[10][1], 99991))
    df = spark.createDataFrame(rows, "k int, e double, seq long")
    got = sessionize_scalable(
        df, ["k"], ts_col="e", order_col="seq", gap_seconds=60.0, bucket_seconds=500.0
    )
    w = Window.partitionBy("k").orderBy(F.col("e").asc(), F.col("seq").asc())
    prev = F.lag("e").over(w)
    is_new = F.when(prev.isNull() | (F.col("e") - prev > 60.0), 1).otherwise(0)
    naive = (
        df.withColumn("sq", F.sum(is_new).over(w))
        .groupBy("k", "sq")
        .agg(
            F.min("e").alias("session_start"),
            F.max("e").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    key = lambda r: (r["k"], r["session_start"], r["session_end"], r["n_events"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))


def test_sessionize_scalable_null_ts_and_validation(spark):
    from cdc_connector_spark.ops.timeseries import sessionize_scalable

    import pytest as _pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (1, None), (1, 20.0)], "k int, e double"
    )
    out = sessionize_scalable(df, ["k"], ts_col="e", gap_seconds=60.0, bucket_seconds=100.0)
    r = out.collect()
    assert len(r) == 1 and r[0]["n_events"] == 2  # NULL ts excluded
    with _pytest.raises(ValueError, match="must exceed gap_seconds"):
        sessionize_scalable(df, ["k"], ts_col="e", gap_seconds=60.0, bucket_seconds=60.0)
    with _pytest.raises(ValueError, match="at least one key"):
        sessionize_scalable(df, [], ts_col="e")
    # timestamp ts rides unix_micros
    ts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00")], "k int, s string"
    ).select("k", F.col("s").cast("timestamp").alias("ts"))
    out2 = sessionize_scalable(ts, ["k"], ts_col="ts", gap_seconds=1800.0).collect()
    assert len(out2) == 1 and out2[0]["n_events"] == 2


def test_sessionize_scalable_hybrid_routing(spark):
    """hot_threshold routes only hot keys through the bucketed path; the
    result is identical to the all-bucketed and the naive forms."""
    import random

    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.timeseries import sessionize_scalable

    rng = random.Random(7)
    rows, t = [], 0.0
    for i in range(2000):
        key = 1 if rng.random() < 0.5 else rng.randrange(2, 20)
        t += rng.uniform(1, 200)
        rows.append((key, t, i))
    df = spark.createDataFrame(rows, "k int, e double, seq long")
    kw = dict(ts_col="e", order_col="seq", gap_seconds=60.0, bucket_seconds=700.0)
    full = sessionize_scalable(df, ["k"], **kw)
    hybrid = sessionize_scalable(df, ["k"], hot_threshold=300, **kw)
    # threshold above every key count -> pure cold path
    all_cold = sessionize_scalable(df, ["k"], hot_threshold=10_000_000, **kw)
    key = lambda r: (r["k"], r["session_start"], r["session_end"], r["n_events"])  # noqa: E731
    want = sorted(map(key, full.collect()))
    assert sorted(map(key, hybrid.collect())) == want
    assert sorted(map(key, all_cold.collect())) == want
