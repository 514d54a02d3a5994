#!/usr/bin/env python
"""Round-15 skew-adversarial rehearsal (verdict #3): the CDC core's
fixtures are all near-uniform, so the claim "AQE handles key skew" was
never tested where it can fail — WINDOW-based per-key operators, whose
hot key is ONE task by construction (AQE skew-join splitting never
applies to window partitions).

Fixture: 2M events (sf0.1 events ×20, keys shifted), user_id remapped
two ways over the SAME rows:
- skew:    Zipf-like via inverse-CDF power law user = min(x^-5, 10^7)
           (x uniform from xxhash64) — P(user=1) ≈ 13%, s ≈ 1.2 tail.
- uniform: user = pmod(xxhash64(event_id), n_users) with n_users chosen
           to match the skewed fixture's distinct-user count.

Ops measured (wall + heaviest-stage task histogram from event logs):
1. latest_per_key      (changelog dedup window — W5/ST2 core)
2. latest_per_key_agg  (two-stage groupBy max_by candidate: partial
   aggregation splits the hot key MAP-SIDE; measured as the fix)
3. asof_join keyed     (purchases←clicks by user_id — union window)
4. sessionize          (lag + cumsum window + groupBy)

Straggler metric: max_task / median_task duration within the app's
slowest stage, plus wall ratio skew/uniform. The pin that lands in
tests/test_plan_invariants.py derives from what this measures.

Usage:
    python tools/skew_rehearsal_r15.py build
    python tools/skew_rehearsal_r15.py run OP FIXTURE   # e.g. run latest skew
    python tools/skew_rehearsal_r15.py report
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
ROOT = "/tmp/r15_skew"
RESULTS = os.path.join(ROOT, "results.jsonl")
LOGS = os.path.join(ROOT, "eventlogs")
REPS = int(os.environ.get("SKEW_REPS", "20"))  # 100k x REPS rows
TAG = os.environ.get("SKEW_TAG", "")  # fixture-name suffix for sized variants


def build(spark) -> None:
    from cdc_connector_spark.tables import load_table

    os.makedirs(ROOT, exist_ok=True)
    r = spark.range(REPS).select(F.col("id").alias("rep"))
    ev = load_table(spark, BASE_SF, "events").crossJoin(r)
    base = ev.select(
        (F.col("event_id") + F.col("rep") * 1_000_000_000).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("rep").cast("double"))).alias("ts"),
        "event_type",
        "value",
    )
    x = (F.pmod(F.xxhash64("event_id"), F.lit(1_000_000)).cast("double") + 0.5) / 1_000_000.0
    skew_user = F.least(F.pow(x, F.lit(-5.0)), F.lit(1e7)).cast("long")
    skewed = base.withColumn("user_id", skew_user)
    skewed.repartition(32).write.mode("overwrite").parquet(f"{ROOT}/events_skew{TAG}.parquet")
    n_users = skewed.select("user_id").distinct().count()
    uni = base.withColumn("user_id", F.pmod(F.xxhash64("event_id"), F.lit(n_users)))
    uni.repartition(32).write.mode("overwrite").parquet(f"{ROOT}/events_uniform{TAG}.parquet")
    hot = (
        skewed.groupBy("user_id").count().orderBy(F.col("count").desc()).limit(3).collect()
    )
    total = skewed.count()
    print(
        json.dumps(
            {
                "rows": total,
                "distinct_users_skew": n_users,
                "hot_users": [(r["user_id"], r["count"], round(r["count"] / total, 4)) for r in hot],
            }
        ),
        flush=True,
    )


def _events(spark, fixture: str):
    return spark.read.parquet(f"{ROOT}/events_{fixture}{TAG}.parquet")


def op_latest(spark, fixture):
    """Current W5 core: row_number window."""
    from cdc_connector_spark.changelog.apply import latest_per_key

    ch = _events(spark, fixture).select(
        "user_id",
        "event_type",
        "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("__ts_ms"),
        F.col("event_id").alias("__seq"),
    )
    return latest_per_key(ch, ["user_id"]).count()


def op_latest_agg(spark, fixture):
    """Candidate fix: two-stage max_by aggregate (map-side combine splits
    the hot key before the exchange)."""
    ch = _events(spark, fixture).select(
        "user_id",
        "event_type",
        "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("__ts_ms"),
        F.col("event_id").alias("__seq"),
    )
    payload = [c for c in ch.columns if c != "user_id"]
    out = ch.groupBy("user_id").agg(
        F.max_by(F.struct(*payload), F.struct("__ts_ms", "__seq")).alias("__r")
    )
    return out.select("user_id", *[F.col(f"__r.{c}").alias(c) for c in payload]).count()


def op_asof(spark, fixture):
    from cdc_connector_spark.ops.asof import asof_join

    ev = _events(spark, fixture)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("value").alias("click_value"),
        F.col("event_id").alias("click_seq"),
    )
    return asof_join(
        purchases, clicks, on="ts", by="user_id", seq_col="click_seq"
    ).count()


def op_sessionize(spark, fixture):
    ev = _events(spark, fixture)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_s = 30 * 60
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > gap_s), 1
    ).otherwise(0)
    with_sess = ev.withColumn("session_seq", F.sum(is_new).over(w))
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("s"), F.max("ts").alias("e"))
        .count()
    )


def op_sessionize_scalable(spark, fixture):
    from cdc_connector_spark.ops.timeseries import sessionize_scalable

    ev = _events(spark, fixture)
    return sessionize_scalable(
        ev, ["user_id"], ts_col="ts", order_col="event_id",
        gap_seconds=1800.0, bucket_seconds=86_400.0,
    ).count()


def op_sessionize_hybrid(spark, fixture):
    from cdc_connector_spark.ops.timeseries import sessionize_scalable

    ev = _events(spark, fixture)
    return sessionize_scalable(
        ev, ["user_id"], ts_col="ts", order_col="event_id",
        gap_seconds=1800.0, bucket_seconds=86_400.0, hot_threshold=200_000,
    ).count()


OPS = {
    "latest": op_latest,
    "latest_agg": op_latest_agg,
    "asof": op_asof,
    "sessionize": op_sessionize,
    "sessionize_scalable": op_sessionize_scalable,
    "sessionize_hybrid": op_sessionize_hybrid,
}


def _task_stats(logdir: str) -> dict:
    """Per-stage task-duration histogram from the event log; returns the
    stage with the largest max-task duration (the straggler candidate)."""
    stages: dict[int, list[float]] = {}
    for f in glob.glob(os.path.join(logdir, "**"), recursive=True):
        if not os.path.isfile(f) or "appstatus" in os.path.basename(f):
            continue
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev.get("Stage ID")
                    info = ev.get("Task Info") or {}
                    dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1000.0
                    stages.setdefault(sid, []).append(dur)
    if not stages:
        return {}
    sid, durs = max(stages.items(), key=lambda kv: max(kv[1]))
    med = statistics.median(durs)
    return {
        "stage": sid,
        "n_tasks": len(durs),
        "max_task_sec": round(max(durs), 3),
        "median_task_sec": round(med, 3),
        "straggler_ratio": round(max(durs) / med, 2) if med > 0 else None,
    }


def run_cell(op: str, fixture: str) -> dict:
    from cdc_connector_spark.session import get_spark

    logdir = os.path.join(LOGS, f"{op}_{fixture}")
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    spark = get_spark(
        f"r15-skew-{op}-{fixture}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = OPS[op]
    fn(spark, fixture)  # warm (codegen + page cache)
    t0 = time.time()
    rows = fn(spark, fixture)
    wall = time.time() - t0
    spark.stop()
    time.sleep(1.0)  # let the event log flush
    rec = {"op": op, "fixture": fixture + TAG, "wall_sec": round(wall, 2), "rows": rows}
    rec.update(_task_stats(logdir))
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def report() -> None:
    cells = {}
    for line in open(RESULTS):
        r = json.loads(line)
        cells[(r["op"], r["fixture"])] = r
    print(f"{'op':<12}{'uniform s':>10}{'skew s':>9}{'ratio':>7}"
          f"{'strag(uni)':>11}{'strag(skew)':>12}{'maxtask(skew)':>14}")
    for op in OPS:
        u, s = cells.get((op, "uniform")), cells.get((op, "skew"))
        if not (u and s):
            continue
        print(
            f"{op:<12}{u['wall_sec']:>10.2f}{s['wall_sec']:>9.2f}"
            f"{s['wall_sec'] / u['wall_sec']:>7.2f}"
            f"{u.get('straggler_ratio') or 0:>11.2f}{s.get('straggler_ratio') or 0:>12.2f}"
            f"{s.get('max_task_sec') or 0:>14.2f}"
        )


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "report"
    if cmd == "build":
        from cdc_connector_spark.session import get_spark

        spark = get_spark("r15-skew-build")
        spark.sparkContext.setLogLevel("ERROR")
        build(spark)
        spark.stop()
    elif cmd == "run":
        run_cell(sys.argv[2], sys.argv[3])
    elif cmd == "report":
        report()
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
