"""Mann-Kendall + Theil-Sen, KS drift, association strength, weighted
shortest paths, HLL merge — the round-10 op batch. Each op is pinned
against a brute-force in-test reference on randomized or hand-built
inputs (the value-portability contract is separately enforced by the
driver oracle entries)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.graph import shortest_paths
from cdc_connector_spark.ops.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
)
from cdc_connector_spark.ops.timeseries import ks_drift, mann_kendall_trend
from cdc_connector_spark.validation.checks import (
    association_strength,
    chi_square_independence,
)


# ---------------------------------------------------------------- mann-kendall

def _mk_brute(series):
    s = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            d = series[j] - series[i]
            s += (d > 0) - (d < 0)
    return s


def _theil_sen_brute(series):
    slopes = sorted(
        (
            ((series[j] - series[i]) / (j - i), series[j] - series[i], j - i)
            for i in range(len(series))
            for j in range(i + 1, len(series))
        )
    )
    return slopes[(len(slopes) + 1) // 2 - 1][0]


def _events_from_daily(spark, counts):
    rows = []
    eid = 0
    for d, n in enumerate(counts):
        for _ in range(n):
            rows.append(("t", f"2024-01-{d+1:02d} 12:00:00"))
            eid += 1
    return spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )


def test_mann_kendall_matches_brute_force(spark):
    rng = random.Random(11)
    counts = [rng.randint(1, 6) + (d // 7) for d in range(25)]  # drift + ties
    df = _events_from_daily(spark, counts)
    row = mann_kendall_trend(df).collect()[0]
    assert row["n_days"] == 25
    assert row["s_stat"] == _mk_brute(counts)
    assert row["theil_sen_slope"] == pytest.approx(
        round(_theil_sen_brute(counts), 6), abs=1e-9
    )
    # tie-corrected variance: brute formula
    n = 25
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(counts).values() if t > 1)
    assert row["var18"] == n * (n - 1) * (2 * n + 5) - tie
    s = row["s_stat"]
    zexp = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(row["var18"] / 18.0)
    assert row["z"] == pytest.approx(round(zexp, 6), abs=1e-9)


def test_mann_kendall_even_pairs_and_flat_series(spark):
    # 4 days -> 6 pairs (even): the lower-median rank must still pick a row
    df = _events_from_daily(spark, [2, 2, 2, 2])
    row = mann_kendall_trend(df).collect()[0]
    assert row["s_stat"] == 0 and row["theil_sen_slope"] == 0.0 and row["z"] == 0.0


def test_mann_kendall_monotone_series(spark):
    counts = list(range(1, 11))
    df = _events_from_daily(spark, counts)
    row = mann_kendall_trend(df).collect()[0]
    assert row["s_stat"] == 45  # all 45 pairs increasing
    assert row["theil_sen_slope"] == 1.0 and row["z"] > 3


# ---------------------------------------------------------------------- ks

def _ks_brute(xs, ys):
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best = (0, None)
    for v in vals:
        num = abs(sum(x <= v for x in xs) * nb - sum(y <= v for y in ys) * na)
        if num > best[0]:
            best = (num, v)
    return best


def test_ks_drift_matches_brute_force(spark):
    rng = random.Random(5)
    xs = [rng.randint(0, 50) for _ in range(200)]
    ys = [rng.randint(10, 60) for _ in range(150)]  # shifted distribution
    a = spark.createDataFrame([(v,) for v in xs], "val int")
    b = spark.createDataFrame([(v,) for v in ys], "val int")
    row = ks_drift(a, b, "val").collect()[0]
    num, at = _ks_brute(xs, ys)
    assert (row["gap_numerator"], row["ks_at_value"]) == (num, at)
    assert row["n_a"] == 200 and row["n_b"] == 150
    assert row["d_stat"] == pytest.approx(round(num / (200 * 150), 6), abs=1e-9)


def test_ks_identical_samples_zero(spark):
    a = spark.createDataFrame([(v,) for v in range(30)], "val int")
    row = ks_drift(a, a, "val").collect()[0]
    assert row["gap_numerator"] == 0 and row["d_stat"] == 0.0


def test_ks_drift_quantize_error_bound(spark):
    """quantize_to (r10 verdict #4): on a NEAR-UNIQUE column the window
    input collapses to <= range/q grid cells, and the pinned error bound
    holds: the quantized ECDF at a grid point equals the true ECDF at
    that cell's upper boundary, so D_q <= D_true <= D_q + max cell mass
    (mass_a/n_a + mass_b/n_b)."""
    rng = random.Random(11)
    xs = [rng.uniform(0, 100) for _ in range(400)]  # near-unique doubles
    ys = [rng.uniform(15, 115) for _ in range(300)]
    a = spark.createDataFrame([(v,) for v in xs], "val double")
    b = spark.createDataFrame([(v,) for v in ys], "val double")
    exact = ks_drift(a, b, "val").collect()[0]
    q = 5.0
    quant = ks_drift(a, b, "val", quantize_to=q).collect()[0]
    d_true = exact["gap_numerator"] / (exact["n_a"] * exact["n_b"])
    d_q = quant["gap_numerator"] / (quant["n_a"] * quant["n_b"])
    # brute max cell mass over the grid
    import math as _m

    cells = {}
    for v in xs:
        cells.setdefault(_m.floor(v / q), [0, 0])[0] += 1
    for v in ys:
        cells.setdefault(_m.floor(v / q), [0, 0])[1] += 1
    max_mass = max(ca / len(xs) + cb / len(ys) for ca, cb in cells.values())
    assert d_q <= d_true + 1e-12
    assert d_true <= d_q + max_mass + 1e-12
    # the quantized statistic is the brute KS over the snapped values
    num, at = _ks_brute(
        [_m.floor(v / q) * q for v in xs], [_m.floor(v / q) * q for v in ys]
    )
    assert (quant["gap_numerator"], quant["ks_at_value"]) == (num, at)
    with pytest.raises(ValueError):
        ks_drift(a, b, "val", quantize_to=0)


# ------------------------------------------------------------- association

def test_association_matches_chi_square_and_brute_mi(spark):
    rows = [("A", "x")] * 30 + [("A", "y")] * 10 + [("B", "x")] * 5 + [("B", "y")] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    out = association_strength(df, "a", "b").collect()[0]
    chi = chi_square_independence(df, "a", "b").collect()[0]
    assert (out["n"], out["n_a"], out["n_b"], out["dof"]) == (
        chi["n"],
        chi["n_a"],
        chi["n_b"],
        chi["dof"],
    )
    assert out["chi2"] == chi["chi2"]
    # brute MI over the contingency table
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    mi = sum(
        (o / n) * math.log(o * n / (ra[a] * cb[b])) for (a, b), o in c.items()
    )
    assert out["mi_nats"] == pytest.approx(round(mi, 6), abs=1e-6)
    v = math.sqrt(chi["chi2"] / (n * 1))
    assert out["cramers_v"] == pytest.approx(round(v, 6), abs=1e-5)


def test_association_independent_columns_near_zero(spark):
    rows = [(a, b) for a in "AB" for b in "xy" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = association_strength(df, "a", "b").collect()[0]
    assert out["chi2"] == 0.0 and out["cramers_v"] == 0.0 and out["mi_nats"] == 0.0


def test_association_structural_zeros_full_grid_chi2(spark):
    """Empty contingency cells each contribute e = rt*ct/n to Pearson
    chi2 — the fold over OBSERVED cells alone understates it (r10
    ADVICE). Pin against the brute full-grid computation on a table
    with two structural zeros: (A,y) and (B,x) never co-occur."""
    rows = [("A", "x")] * 30 + [("B", "y")] * 10 + [("C", "x")] * 5 + [("C", "y")] * 15
    df = spark.createDataFrame(rows, "a string, b string")
    out = association_strength(df, "a", "b").collect()[0]
    chi = chi_square_independence(df, "a", "b").collect()[0]
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    want = sum(
        (c.get((a, b), 0) - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for a in ra
        for b in cb
    )
    observed_only = sum(
        (o - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for (a, b), o in c.items()
    )
    assert want > observed_only  # the fixture really has missing mass
    assert out["chi2"] == pytest.approx(round(want, 6), abs=1e-6)
    assert chi["chi2"] == pytest.approx(round(want, 6), abs=1e-6)
    assert out["cramers_v"] == pytest.approx(
        round(math.sqrt(want / (n * 1)), 6), abs=1e-5
    )
    # MI unchanged by empty cells: lim o->0 of (o/n)ln(o n/(rt ct)) = 0
    mi = sum(
        (o / n) * math.log(o * n / (ra[a] * cb[b])) for (a, b), o in c.items()
    )
    assert out["mi_nats"] == pytest.approx(round(mi, 6), abs=1e-6)


# ---------------------------------------------------------- shortest paths

def _dijkstra_brute(edges, sources, max_hops):
    # bounded Bellman-Ford on a dict graph
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {s: 0 for s in sources}
    for _ in range(max_hops):
        new = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if d + w < new.get(v, float("inf")):
                    new[v] = d + w
        dist = new
    return dist


def test_shortest_paths_matches_brute_force(spark):
    rng = random.Random(3)
    edges = [
        (rng.randint(0, 30), rng.randint(0, 30), rng.randint(1, 100) * 1000)
        for _ in range(120)
    ]
    edges = [(a, b, w) for a, b, w in edges if a != b]
    e = spark.createDataFrame(edges, "src int, dst int, w long")
    srcs = spark.createDataFrame([(0,), (7,)], "node int")
    got = {r["node"]: r["dist"] for r in shortest_paths(e, srcs, max_hops=3).collect()}
    exp = _dijkstra_brute(edges, [0, 7], 3)
    assert got == exp


def test_shortest_paths_bounded_horizon_and_early_exit(spark):
    # path graph 0-1-2-3-4, unit weights: max_hops=2 reaches node 2 only
    e = spark.createDataFrame(
        [(i, i + 1, 10) for i in range(4)], "src int, dst int, w long"
    )
    srcs = spark.createDataFrame([(0,)], "node int")
    got = {r["node"]: r["dist"] for r in shortest_paths(e, srcs, max_hops=2).collect()}
    assert got == {0: 0, 1: 10, 2: 20}
    # max_hops larger than the diameter: early-exit still yields full answer
    got4 = {r["node"]: r["dist"] for r in shortest_paths(e, srcs, max_hops=9).collect()}
    assert got4 == {0: 0, 1: 10, 2: 20, 3: 30, 4: 40}


def test_shortest_paths_picks_cheaper_multi_edge_and_longer_path(spark):
    # direct expensive edge vs 2-hop cheap path; parallel edge collapse
    e = spark.createDataFrame(
        [(0, 1, 100), (0, 1, 60), (0, 2, 10), (2, 1, 20)],
        "src int, dst int, w long",
    )
    srcs = spark.createDataFrame([(0,)], "node int")
    got = {r["node"]: r["dist"] for r in shortest_paths(e, srcs, max_hops=4).collect()}
    assert got == {0: 0, 1: 30, 2: 10}


# ------------------------------------------------------------------ hll merge

def test_hll_merge_equals_union_registers(spark):
    A = spark.createDataFrame([("g", i) for i in range(200)], "grp_col string, key long")
    B = spark.createDataFrame(
        [("g", i) for i in range(150, 400)] + [("h", 1)], "grp_col string, key long"
    )
    ra = hll_registers(A, "key", "grp_col", p=8)
    rb = hll_registers(B, "key", "grp_col", p=8)
    merged = {
        (r["grp"], r["bucket"], r["mreg"]) for r in hll_merge([ra, rb]).collect()
    }
    direct = {
        (r["grp"], r["bucket"], r["mreg"])
        for r in hll_registers(A.unionByName(B), "key", "grp_col", p=8).collect()
    }
    assert merged == direct
    est = {r["grp"]: r["est"] for r in hll_estimate(hll_merge([ra, rb]), p=8).collect()}
    # 400 distinct keys in g; HLL p=8 keeps relative error well within 20%
    assert 300 <= est["g"] <= 500 and est["h"] == pytest.approx(1.0, abs=0.1)


def test_chi_square_and_association_empty_input_zero_not_null(spark):
    """Empty input keeps the chi2 = 0.0 contract (r11 review): the
    structural-zeros missing-mass term is a SUM over zero rows (NULL)
    and must not null the statistic."""
    df = spark.createDataFrame([], "a string, b string")
    [r] = chi_square_independence(df, "a", "b").collect()
    assert r["chi2"] == 0.0
    [o] = association_strength(df, "a", "b").collect()
    assert o["chi2"] == 0.0
