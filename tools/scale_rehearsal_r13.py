#!/usr/bin/env python
"""Round-13 fix rehearsal (SCALING.md 4r): measure the review-pass fixes
against reconstructions of their pre-fix shapes, asserting value
equality in-run. Wall is reported where the fix is compute-bound; where
the fix is an I/O-shape fix that page-cached local parquet hides
(bytes shuffled / bytes scanned), the event log supplies the bytes —
the r12 hll-shuffle methodology.

1. merge_islands two-phase vs the single global fold (streaming/gaps.py):
   a DENSE 5M-id batch (the healthy-monitor shape: contiguous ids, 3
   holes) — the old shape folds all 5M rows through ONE no-partition
   WindowExec task; the pre-fold collapses each 2^20-block in parallel
   first. The SPARSE worst case (every id its own island) is also
   measured: there the pre-fold cannot collapse anything and must be
   wall-neutral, not a regression.
2. standardize_embeddings id-keyed cells vs payload-through-explode
   (ops/features.py): embeddings + a 200-char payload column; the old
   shape replicated the payload x dims through the explode shuffle.
   Metric: Shuffle Bytes Written summed over tasks.
3. run_all_checks fused side-stats vs per-check jobs
   (validation/checks.py) on parquet-backed lineitem. Honest metric
   pair: Spark JOBS (one per action; each action re-scans its tables)
   and Shuffle Bytes Written — the fuse trades 6 saved table scans per
   sweep for a WIDER aggregate shuffle (two distinct aggregates expand
   the input 2x with narrow projections). Table-scan counts are
   structural (8 scans sequential vs 2 + the orphan join's 2), the
   event log prices the shuffle side of the trade.

Usage: python tools/scale_rehearsal_r13.py [sf_dir]
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
LOGS = "/tmp/r13_rehearsal_eventlogs"


def metered_app(tag: str, fn):
    """Run ``fn(spark)`` in its own app with event logging; return
    (wall_s, result, metrics dict with shuffle/read bytes + jobs)."""
    logdir = os.path.join(LOGS, tag)
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    spark = get_spark(
        f"r13-rehearsal-{tag}",
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


def timed(spark_df_count_fn, label):
    spark_df_count_fn()  # warm-up
    t0 = time.time()
    n = spark_df_count_fn()
    dt = time.time() - t0
    print(f"| {label} | {dt:.2f}s | {n} |", flush=True)
    return dt, n


# ---------------------------------------------------------------------------
def islands_experiment() -> None:
    from cdc_connector_spark.streaming.gaps import _fold_islands, merge_islands

    spark = get_spark("r13-rehearsal-islands")
    spark.sparkContext.setLogLevel("ERROR")
    print("| experiment | steady-state | output |")
    print("|---|---|---|")
    # DENSE healthy stream: contiguous ids with 3 holes -> 4 islands
    dense = (
        spark.range(5_000_000)
        .select(
            F.when(F.col("id") < 1_000_000, F.col("id"))
            .when(F.col("id") < 2_500_000, F.col("id") + 10)
            .when(F.col("id") < 4_000_000, F.col("id") + 20)
            .otherwise(F.col("id") + 30)
            .alias("lo")
        )
        .withColumn("hi", F.col("lo"))
        .localCheckpoint(eager=True)
    )
    d_old, n_old = timed(lambda: _fold_islands(dense, []).count(), "islands DENSE 5M: single global fold (pre-r13)")
    d_new, n_new = timed(lambda: merge_islands(dense).count(), "islands DENSE 5M: two-phase pre-fold (r13)")
    assert n_old == n_new == 4, (n_old, n_new)
    print(f"# dense speedup: {d_old / d_new:.1f}x at identical islands", flush=True)
    # SPARSE adversarial: stride-3, every id its own island — the
    # pre-fold collapses nothing; must be ~wall-neutral
    sparse = (
        spark.range(5_000_000)
        .select((F.col("id") * 3).alias("lo"))
        .withColumn("hi", F.col("lo"))
        .localCheckpoint(eager=True)
    )
    s_old, m_old = timed(lambda: _fold_islands(sparse, []).count(), "islands SPARSE 5M: single global fold")
    s_new, m_new = timed(lambda: merge_islands(sparse).count(), "islands SPARSE 5M: two-phase pre-fold")
    assert m_old == m_new == 5_000_000
    print(f"# sparse ratio (must be ~1): {s_new / s_old:.2f}x", flush=True)
    spark.stop()


# ---------------------------------------------------------------------------
def standardize_experiment() -> None:
    from cdc_connector_spark.tables import load_table

    fixture = "/tmp/r13_std_fixture"
    if not os.path.isdir(fixture):
        spark = get_spark("r13-rehearsal-stdfix")
        emb = load_table(spark, SF_DIR, "embeddings").withColumn(
            "payload", F.repeat(F.lit("x"), 200)
        )
        # 100x the rows so the shuffle is not noise-level
        reps = spark.range(100).select(F.col("id").alias("__r"))
        big = emb.crossJoin(reps).select(
            (F.col("vec_id") + F.col("__r") * 10_000_000).alias("vec_id"),
            "embedding",
            "payload",
        )
        big.write.mode("overwrite").parquet(fixture)
        spark.stop()

    def old_shape(spark):
        emb = spark.read.parquet(fixture)
        keep = [c for c in emb.columns if c != "embedding"]
        x = F.col("__x")
        cells = emb.select(
            *keep, F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "__x")
        )
        sums = (
            emb.filter(F.col("embedding").isNotNull())
            .select(F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "__v"))
            .groupBy("dim")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.sum(F.round(F.col("__v"), 12).cast("decimal(38,12)")).alias("__sx"),
                F.sum(F.round(F.col("__v") * F.col("__v"), 12).cast("decimal(38,12)")).alias("__sxx"),
            )
        )
        n_d = F.col("__n").cast("double")
        mean = F.col("__sx").cast("double") / n_d
        var = F.col("__sxx").cast("double") / n_d - mean * mean
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        z = F.when(std > 0, F.round((x - mean) / std, 6)).otherwise(F.lit(0.0))
        scored = cells.join(F.broadcast(sums), "dim").select(*keep, "dim", z.alias("__z"))
        return (
            scored.groupBy(*keep)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "__z"))), lambda s: s["__z"]
                ).alias("z")
            )
            .count()
        )

    def new_shape(spark):
        from cdc_connector_spark.ops.features import standardize_embeddings

        return standardize_embeddings(spark.read.parquet(fixture)).count()

    w_old, n_old, m_old = metered_app("std-old", old_shape)
    w_new, n_new, m_new = metered_app("std-new", new_shape)
    assert n_old == n_new, (n_old, n_new)
    print(
        f"| standardize payload-through-explode (pre-r13) | {w_old:.2f}s | "
        f"{m_old['shuffle_mb']:.1f} MB shuffled |"
    )
    print(
        f"| standardize id-keyed cells + join-back (r13) | {w_new:.2f}s | "
        f"{m_new['shuffle_mb']:.1f} MB shuffled |"
    )
    print(
        f"# standardize shuffle bytes: {m_old['shuffle_mb'] / max(m_new['shuffle_mb'], 0.001):.1f}x fewer, "
        f"identical row count ({n_new})",
        flush=True,
    )


# ---------------------------------------------------------------------------
def validation_experiment() -> None:
    def sequential(spark):
        from cdc_connector_spark.tables import load_table
        from cdc_connector_spark.validation.checks import (
            check_distinct_pk,
            check_duplication,
            check_freshness,
            check_orphans,
            check_rowcount,
        )

        li = load_table(spark, SF_DIR, "lineitem")
        snk = load_table(spark, SF_DIR, "lineitem")
        rs = [
            check_rowcount(li, snk),
            check_distinct_pk(li, snk, ["l_orderkey", "l_linenumber"]),
            check_duplication(snk, ["l_orderkey", "l_linenumber"]),
            check_orphans(li, snk, ["l_orderkey", "l_linenumber"]),
            check_freshness(li, snk, "l_shipdate"),
        ]
        return tuple(r.status for r in rs)

    def fused(spark):
        from cdc_connector_spark.tables import load_table
        from cdc_connector_spark.validation.checks import run_all_checks

        li = load_table(spark, SF_DIR, "lineitem")
        snk = load_table(spark, SF_DIR, "lineitem")
        rep = run_all_checks("li", li, snk, ["l_orderkey", "l_linenumber"], ts_col="l_shipdate")
        return tuple(r.status for r in rep.results if r.check != "exists")

    w_old, v_old, m_old = metered_app("val-seq", sequential)
    w_new, v_new, m_new = metered_app("val-fused", fused)
    assert v_old == v_new, (v_old, v_new)
    print(
        f"| validation sweep per-check jobs (pre-r13) | {w_old:.2f}s | "
        f"{m_old['jobs']} jobs, {m_old['shuffle_mb']:.1f} MB shuffled |"
    )
    print(
        f"| validation sweep fused side-stats (r13) | {w_new:.2f}s | "
        f"{m_new['jobs']} jobs, {m_new['shuffle_mb']:.1f} MB shuffled |"
    )
    print(
        f"# validation sweep: {m_old['jobs']} -> {m_new['jobs']} jobs "
        f"(8 -> 2 scalar-stat table scans), shuffle "
        f"{m_old['shuffle_mb']:.1f} -> {m_new['shuffle_mb']:.1f} MB "
        f"(the two-distinct Expand: the priced cost of the scan savings), "
        f"identical verdicts",
        flush=True,
    )


def main() -> None:
    islands_experiment()
    standardize_experiment()
    validation_experiment()


if __name__ == "__main__":
    main()
