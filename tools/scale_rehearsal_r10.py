#!/usr/bin/env python
"""10x scale rehearsal for the round-9 ops (SCALING.md 4m protocol):

- HLL / KMV distinct sketches with 10x DISTINCT KEYS PER GROUP (orders
  replicated with shifted o_custkey, same groups) — the claim under
  test is that the sketch tables stay CONSTANT-SIZE (2^p registers / k
  rows per group) while the exact twin's shuffle grows 10x.
- kmv_merge streaming-state maintenance at 1x vs 10x batch volume —
  state is |groups| x k rows either way.
- Pettitt change-point and seasonal anomalies with 10x DAYS per type
  (events replicated with ts shifted +400 days per copy) — the daily
  collapse is the only corpus shuffle; the per-type series grows 10x.
- link_prediction with the degree cap binding vs effectively-off on the
  same graph: wedge count must equal the cap formula
  sum_{z: deg(z) <= cap} C(deg(z), 2) exactly (pinned here), and the
  binding run must be faster.

Usage: python tools/scale_rehearsal_r10.py [sf_dir]
Prints one markdown table row per (op, scale).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cdc_connector_spark.session import get_spark  # noqa: E402
from cdc_connector_spark.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPL = 10


def timed(label, fn):
    fn()  # warm-up (plan compile + shuffle files)
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"| {label} | {dt:.2f}s | {n} rows |")
    return dt, n


def main() -> None:
    spark = get_spark("scale-rehearsal-r10")
    orders = load_table(spark, SF_DIR, "orders")
    events = load_table(spark, SF_DIR, "events")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    copies = spark.range(REPL).select(F.col("id").alias("__copy"))

    # --- HLL / KMV: 10x distinct keys per group (shifted custkeys) --------
    from cdc_connector_spark.ops.sketch import (
        hll_distinct,
        kmv_distinct,
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    orders10 = orders.crossJoin(copies).select(
        (F.col("o_custkey") + F.col("__copy") * 10_000_000).alias("o_custkey"),
        "o_orderpriority",
    )
    print("| op | steady-state | output |")
    print("|---|---|---|")
    timed("hll_distinct 1x", lambda: hll_distinct(orders, "o_custkey", "o_orderpriority", p=8).count())
    timed("hll_distinct 10x keys", lambda: hll_distinct(orders10, "o_custkey", "o_orderpriority", p=8).count())
    # register-table boundedness: 2^p rows per group at ANY key volume
    from cdc_connector_spark.ops.sketch import hll_registers

    r1 = hll_registers(orders, "o_custkey", "o_orderpriority", p=8).count()
    r10 = hll_registers(orders10, "o_custkey", "o_orderpriority", p=8).count()
    print(f"|   register rows | {r1} -> {r10} | bound 5*256={5*256} |")
    assert r10 <= 5 * 256, "HLL register table exceeded 2^p per group"

    timed("kmv_distinct 1x", lambda: kmv_distinct(orders, "o_custkey", "o_orderpriority", k=64).count())
    timed("kmv_distinct 10x keys", lambda: kmv_distinct(orders10, "o_custkey", "o_orderpriority", k=64).count())
    s1 = kmv_sketch(orders, "o_custkey", "o_orderpriority", k=64).count()
    s10 = kmv_sketch(orders10, "o_custkey", "o_orderpriority", k=64).count()
    print(f"|   sketch rows | {s1} -> {s10} | bound 5*64={5*64} |")
    assert s10 <= 5 * 64, "KMV sketch exceeded k per group"

    # --- kmv_merge: streaming-state maintenance, estimate-only path ------
    def merge_run(src):
        parts = [
            kmv_sketch(src.filter(F.col("o_custkey") % 3 == i), "o_custkey", "o_orderpriority", k=64)
            for i in range(3)
        ]
        state = kmv_merge([kmv_merge(parts[:2], k=64), parts[2]], k=64)
        return kmv_estimate(state, k=64).count()

    timed("kmv 3-batch merge+estimate 1x", lambda: merge_run(orders))
    timed("kmv 3-batch merge+estimate 10x", lambda: merge_run(orders10))

    # --- Pettitt / seasonal: 10x days per type (shifted timestamps) ------
    from cdc_connector_spark.ops.timeseries import pettitt_changepoint, seasonal_anomalies

    ev = events.select("event_type", "ts")
    ev10 = ev.crossJoin(copies).select(
        "event_type",
        (F.col("ts") + F.make_interval(days=F.col("__copy").cast("int") * 400)).alias("ts"),
    )
    timed("pettitt 1x", lambda: pettitt_changepoint(ev).count())
    timed("pettitt 10x days", lambda: pettitt_changepoint(ev10).count())
    timed("seasonal_anomalies 1x", lambda: seasonal_anomalies(ev).count())
    timed("seasonal_anomalies 10x days", lambda: seasonal_anomalies(ev10).count())

    # --- link_prediction: degree cap binding vs off ----------------------
    from cdc_connector_spark.ops.graph import link_prediction

    co = lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    l, r = co.alias("l"), co.alias("r")
    edges = (
        l.join(r, on=[F.col("l.o") == F.col("r.o"), F.col("l.p") < F.col("r.p")])
        .groupBy(F.col("l.p").alias("src"), F.col("r.p").alias("dst"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # rehearsal isolates the op, not the edge derivation
    )
    sym = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("z")).agg(F.count(F.lit(1)).alias("deg"))

    for cap in (40, 1_000_000):
        label = f"link_prediction cap={cap}"
        timed(label, lambda: link_prediction(edges, top=50, max_center_degree=cap).count())
        # wedge count == cap formula: sum over kept centers of C(deg, 2)
        formula = (
            deg.filter(F.col("deg") <= cap)
            .select(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("w"))
            .collect()[0]["w"]
        ) or 0
        # actual wedges: rebuild the generator exactly as the op does
        centers = deg.filter(F.col("deg") <= cap)
        adj = sym.select(F.col("b").alias("z"), F.col("a").alias("x")).join(centers, "z")
        la, ra = adj.alias("l"), adj.alias("r")
        actual = la.join(
            ra, on=[F.col("l.z") == F.col("r.z"), F.col("l.x") < F.col("r.x")]
        ).count()
        print(f"|   wedges cap={cap} | {actual} | formula {formula} |")
        assert actual == formula, f"wedge count {actual} != cap formula {formula}"

    spark.stop()


if __name__ == "__main__":
    main()
