#!/usr/bin/env python
"""10x scale rehearsal for the round-10 ops (SCALING.md 4n protocol).

Axes chosen per claim:
- mann_kendall / streaks / pettitt-family: 10x DAYS per type (ts shifted
  +400 d per copy) — the day-pair self-join is the quadratic suspect:
  measure that calendar-bounded means it stays trivial.
- ks_drift / daily_percentiles / twap / retry_dedup / watermark_sizing:
  10x EVENTS (shifted users/ids keep per-key density; values shifted for
  KS so distinct values grow 10x too — the window's worst case).
- column_profile_diff / equidepth / fk chain: 10x ROWS (shifted keys).
- label_propagation / shortest_paths: 10x GRAPH (10 disjoint shifted
  copies — per-round joins must scale linearly in edges).
- mmr_topk: 10x CORPUS (shifted ids) — the pool stays 50, so stage 2 is
  constant; only the one corpus scan grows.

Usage: python tools/scale_rehearsal_r10b.py [sf_dir]
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
    fn()
    t0 = time.time()
    n = fn()
    print(f"| {label} | {time.time() - t0:.2f}s | {n} rows |")


def main() -> None:
    from cdc_connector_spark.ops.ann import mmr_topk
    from cdc_connector_spark.ops.graph import label_propagation, shortest_paths
    from cdc_connector_spark.ops.timeseries import (
        count_streaks,
        daily_percentiles,
        equidepth_histogram,
        ks_drift,
        mann_kendall_trend,
        retry_dedup,
        twap,
    )
    from cdc_connector_spark.validation.checks import column_profile_diff

    spark = get_spark("scale-rehearsal-r10b")
    events = load_table(spark, SF_DIR, "events")
    orders = load_table(spark, SF_DIR, "orders")
    emb = load_table(spark, SF_DIR, "embeddings")
    copies = spark.range(REPL).select(F.col("id").alias("__copy"))

    ev = events.select("event_id", "user_id", "event_type", "ts", "value")
    ev10_days = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("__copy") * 100_000_000).alias("event_id"),
        "user_id",
        "event_type",
        (F.col("ts") + F.make_interval(days=F.col("__copy").cast("int") * 400)).alias("ts"),
        "value",
    )
    ev10_vol = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("__copy") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("__copy") * 10_000_000).alias("user_id"),
        "event_type",
        "ts",
        "value",
    )
    print("| op | steady-state | output |")
    print("|---|---|---|")
    timed("mann_kendall 1x", lambda: mann_kendall_trend(ev).count())
    timed("mann_kendall 10x days", lambda: mann_kendall_trend(ev10_days).count())
    timed("streaks 1x", lambda: count_streaks(ev).count())
    timed("streaks 10x days", lambda: count_streaks(ev10_days).count())
    timed("daily_percentiles 1x", lambda: daily_percentiles(ev).count())
    timed("daily_percentiles 10x events", lambda: daily_percentiles(ev10_vol).count())
    timed("twap 1x", lambda: twap(ev).count())
    timed("twap 10x events", lambda: twap(ev10_vol).count())
    timed("retry_dedup 1x", lambda: retry_dedup(ev).count())
    timed("retry_dedup 10x events", lambda: retry_dedup(ev10_vol).count())

    o = orders.select("o_orderkey", "o_totalprice")
    o10 = o.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("__copy") * 100_000_000).alias("o_orderkey"),
        (F.col("o_totalprice") + F.col("__copy").cast("double") * 1e7).alias("o_totalprice"),
    )

    def ks_run(src):
        return ks_drift(
            src.filter(F.col("o_orderkey") % 2 == 0),
            src.filter(F.col("o_orderkey") % 2 == 1),
            "o_totalprice",
        ).count()

    timed("ks_drift 1x", lambda: ks_run(o))
    timed("ks_drift 10x rows+values", lambda: ks_run(o10))
    timed("equidepth 1x", lambda: equidepth_histogram(o, "o_totalprice", 8).count())
    timed("equidepth 10x", lambda: equidepth_histogram(o10, "o_totalprice", 8).count())

    ofull = load_table(spark, SF_DIR, "orders")
    ofull10 = ofull.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("__copy") * 100_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("__copy") * 10_000_000).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    cols = ["o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"]
    timed(
        "column_profile_diff 1x",
        lambda: column_profile_diff(ofull, ofull.filter(F.col("o_orderkey") % 97 != 0), cols).count(),
    )
    timed(
        "column_profile_diff 10x",
        lambda: column_profile_diff(ofull10, ofull10.filter(F.col("o_orderkey") % 97 != 0), cols).count(),
    )

    li = load_table(spark, SF_DIR, "lineitem")
    co = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    l, r = co.alias("l"), co.alias("r")
    edges = (
        l.join(r, on=[F.col("l.o") == F.col("r.o"), F.col("l.p") < F.col("r.p")])
        .groupBy(F.col("l.p").alias("src"), F.col("r.p").alias("dst"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("src", "dst", F.expr("CAST(1000000 div __n AS BIGINT)").alias("w"))
        .localCheckpoint(eager=True)
    )
    edges10 = (
        edges.crossJoin(copies)
        .select(
            (F.col("src") + F.col("__copy") * 10_000_000).alias("src"),
            (F.col("dst") + F.col("__copy") * 10_000_000).alias("dst"),
            "w",
        )
        .localCheckpoint(eager=True)
    )
    timed("label_prop 1x", lambda: label_propagation(edges, rounds=3).count())
    timed("label_prop 10x graph", lambda: label_propagation(edges10, rounds=3).count())
    srcs = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .orderBy("node")
        .limit(3)
    )
    timed("shortest_paths 1x", lambda: shortest_paths(edges, srcs, max_hops=3).count())
    timed("shortest_paths 10x graph", lambda: shortest_paths(edges10, srcs, max_hops=3).count())

    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    emb10 = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("__copy") * 10_000_000).alias("vec_id"), "embedding"
    )
    timed("mmr_topk 1x", lambda: mmr_topk(emb, q, k=5, fetch=50).count())
    timed("mmr_topk 10x corpus", lambda: mmr_topk(emb10, q, k=5, fetch=50).count())
    spark.stop()


if __name__ == "__main__":
    main()
