#!/usr/bin/env python
"""Round-14 rehearsal (SCALING.md §4s, verdict #6): verify the r13
validation-fuse trade at 10× — and fix what it found.

The 02c328f fuse replaced the sweep's per-check jobs (8 scalar-stat
table scans per sweep) with ONE aggregate per side (2 scans), pricing a
larger aggregate shuffle against 6 saved scans. Measured here at 10×
lineitem on REAL parquet: the r13 single-agg shape put two exact
distincts in one aggregate, which Spark plans via Expand — every input
row shuffles ×3 (134.6 → 269 MB) — and on a page-cached local box that
made the fuse a WALL REGRESSION at 10× (17.3 → 23.9 s vs sequential).
The r14 answer (shipped in checks.py::_side_stats): group by the PK
first, then aggregate the tiny grouped frame — same 2-scan structure,
ONE narrow map-side-combined shuffle, no Expand. All three variants are
metered below with in-run equality asserts on the side statistics.

Method: replicate lineitem 10× (PKs remapped so distinct-count
semantics hold: l_orderkey' = l_orderkey·10 + rep), write REAL parquet
to /tmp, run each sweep shape in its own metered app (event-log jobs /
shuffle bytes — the r12 methodology; page cache hides scan wall, so
shuffle bytes + jobs are the honest units).

Usage: python tools/scale_rehearsal_r14.py [sf_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cdc_connector_spark.session import get_spark  # noqa: E402

SF_DIR = next((a for a in sys.argv[1:] if not a.startswith("--")), "/root/testdata/sf0.1")
LOGS = "/tmp/r14_rehearsal_eventlogs"
DATA = "/tmp/r14_rehearsal_data"


def metered_app(tag: str, fn):
    logdir = os.path.join(LOGS, tag)
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    spark = get_spark(
        f"r14-rehearsal-{tag}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    result = fn(spark)
    wall = time.time() - t0
    spark.stop()
    shuffle = read = jobs = 0
    paths = [
        f
        for f in glob.glob(os.path.join(logdir, "**"), recursive=True)
        if os.path.isfile(f) and "appstatus" not in os.path.basename(f)
    ]
    for f in paths:
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    tm = ev.get("Task Metrics") or {}
                    shuffle += int((tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0))
                    read += int((tm.get("Input Metrics") or {}).get("Bytes Read", 0))
                elif ev.get("Event") == "SparkListenerJobStart":
                    jobs += 1
    return wall, result, {"shuffle_mb": shuffle / 1e6, "read_mb": read / 1e6, "jobs": jobs}


def build_tables() -> tuple[str, str]:
    """Write 1× and 10× lineitem copies as REAL parquet under /tmp."""
    spark = get_spark("r14-rehearsal-build")
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_connector_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    p1 = os.path.join(DATA, "li_1x")
    p10 = os.path.join(DATA, "li_10x")
    if not os.path.isdir(p1):
        li.write.mode("overwrite").parquet(p1)
    if not os.path.isdir(p10):
        (
            li.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(9))))
            .withColumn("l_orderkey", F.col("l_orderkey") * 10 + F.col("__rep"))
            .drop("__rep")
            .write.mode("overwrite")
            .parquet(p10)
        )
    spark.stop()
    return p1, p10


def sweep(path: str, variant: str):
    """variant: 'seq' = pre-r13 per-check jobs; 'r13' = single-agg fuse
    (two exact distincts -> Expand x3); 'r14' = groupBy-PK two-stage
    fuse (one narrow shuffle). All three return the same scalar stats
    per side (asserted) plus the orphan check."""

    def run(spark):
        from functools import reduce
        from operator import or_

        from cdc_connector_spark.validation.checks import (
            _side_stats,
            check_distinct_pk,
            check_duplication,
            check_freshness,
            check_orphans,
            check_rowcount,
        )

        src = spark.read.parquet(path)
        snk = spark.read.parquet(path)
        pk = ["l_orderkey", "l_linenumber"]
        if variant == "seq":
            rs = [
                check_rowcount(src, snk),
                check_distinct_pk(src, snk, pk),
                check_duplication(snk, pk),
                check_orphans(src, snk, pk),
                check_freshness(src, snk, "l_shipdate"),
            ]
            return tuple(r.status for r in rs)
        if variant == "r13":
            # reconstruction of the pre-r14 single-agg fuse: count + TWO
            # exact distincts in one aggregate -> Expand x3
            def stats(df):
                any_null = reduce(or_, [F.col(c).isNull() for c in pk])
                row = df.agg(
                    F.count(F.lit(1)).alias("total"),
                    F.count_distinct(F.struct(*pk)).alias("dist_all"),
                    F.count_distinct(*[F.col(c) for c in pk]).alias("dist_nonnull"),
                    F.sum(F.when(any_null, 1).otherwise(0)).alias("null_pk"),
                    F.max("l_shipdate").alias("ts_max"),
                ).collect()[0]
                return dict(row.asDict())

            a, b = stats(src), stats(snk)
            check_orphans(src, snk, pk)
            return (a, b)
        # r14: the shipped two-stage groupBy-PK path
        a = _side_stats(src, pk, "l_shipdate", False, 0.01)
        b = _side_stats(snk, pk, "l_shipdate", False, 0.01)
        check_orphans(src, snk, pk)
        return (a, b)

    return run


def main() -> None:
    p1, p10 = build_tables()
    print("| experiment | wall | jobs | shuffle written |")
    print("|---|---|---|---|")
    for label, path in (("1x", p1), ("10x", p10)):
        w_seq, v_seq, m_seq = metered_app(f"val-seq-{label}", sweep(path, "seq"))
        w_13, v_13, m_13 = metered_app(f"val-r13-{label}", sweep(path, "r13"))
        w_14, v_14, m_14 = metered_app(f"val-r14-{label}", sweep(path, "r14"))
        # the two fused variants must compute IDENTICAL side statistics
        n13 = tuple(tuple(sorted(d.items(), key=lambda kv: kv[0])) for d in v_13)
        n14 = tuple(tuple(sorted(d.items(), key=lambda kv: kv[0])) for d in v_14)
        assert n13 == n14, (label, v_13, v_14)
        print(
            f"| {label} per-check jobs (pre-r13) | {w_seq:.2f}s | {m_seq['jobs']} | "
            f"{m_seq['shuffle_mb']:.1f} MB |"
        )
        print(
            f"| {label} single-agg fuse, Expand x3 (r13) | {w_13:.2f}s | {m_13['jobs']} | "
            f"{m_13['shuffle_mb']:.1f} MB |"
        )
        print(
            f"| {label} groupBy-PK two-stage fuse (r14) | {w_14:.2f}s | {m_14['jobs']} | "
            f"{m_14['shuffle_mb']:.1f} MB |"
        )
        print(
            f"# {label}: r14 keeps the 2-scan structure and cuts the fused "
            f"shuffle {m_13['shuffle_mb']:.0f} -> {m_14['shuffle_mb']:.0f} MB "
            f"({m_13['shuffle_mb'] / max(m_14['shuffle_mb'], 0.001):.1f}x), "
            f"wall {w_13:.2f} -> {w_14:.2f}s (seq {w_seq:.2f}s), identical stats",
            flush=True,
        )


if __name__ == "__main__":
    main()
