#!/usr/bin/env python
"""SHUFFLE-BYTES rehearsal for column_profile_diff's hll mode (r12,
SCALING 4n-addendum follow-up).

The 4n-addendum measured WALL clock and honestly reported that on the
4-column fixture the per-row md5 fingerprint dominates locally, so hll
and exact tie — the hll win is the bounded SHUFFLE (<= |cols|*2^p
register rows vs every distinct (col, value)), which is the 100 TB
term. This script MEASURES that term: a 16-column near-unique STRING
fixture (the worst case for exact distincts — every column's values
shuffle), profiled exact vs hll in separate Spark apps with event
logging on, summing Shuffle Bytes Written across all tasks from the
event log (ground truth — not a plan estimate).

Usage: python tools/hll_shuffle_rehearsal_r12.py [rows] [rows_10x]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ROWS10 = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
N_COLS = 16
FIX = "/tmp/hll_shuffle_fixture"
LOGS = "/tmp/hll_shuffle_eventlogs"


def build_fixture(rows: int, path: str) -> None:
    from pyspark.sql import functions as F

    from cdc_connector_spark.session import get_spark

    spark = get_spark("hll-fixture")
    df = spark.range(rows)
    for i in range(N_COLS):
        # near-unique strings per column (distinct ~= rows): the exact
        # mode must shuffle every (col, value); salts differ per column
        df = df.withColumn(
            f"c{i:02d}", F.concat(F.lit(f"v{i}-"), F.md5((F.col("id") + i * rows).cast("string")))
        )
    df.drop("id").write.mode("overwrite").parquet(path)
    spark.stop()


def profile_run(mode: str, path: str, tag: str) -> tuple[float, int]:
    """One Spark app: column_profile_diff(src=snk=fixture) in `mode`;
    returns (wall_s, shuffle_bytes_written summed from the event log)."""
    logdir = os.path.join(LOGS, tag)
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    from cdc_connector_spark.session import get_spark

    spark = get_spark(
        f"hll-shuffle-{tag}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    from cdc_connector_spark.validation.checks import column_profile_diff

    src = spark.read.parquet(path)
    cols = [f"c{i:02d}" for i in range(N_COLS)]
    # warm-up run would double-count shuffle in the log; a single cold
    # run is fine — we compare BYTES (deterministic), wall is secondary
    t0 = time.time()
    column_profile_diff(src, src, cols, distinct_mode=mode).collect()
    wall = time.time() - t0
    spark.stop()
    total = 0
    # Spark 4 event log v2 writes a DIRECTORY per app with events_* files
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
                    m = (ev.get("Task Metrics") or {}).get("Shuffle Write Metrics") or {}
                    total += int(m.get("Shuffle Bytes Written", 0))
    return wall, total


def main() -> None:
    print(f"| fixture | mode | wall | shuffle bytes written |")
    print("|---|---|---|---|")
    for label, rows in (("1x", ROWS), ("10x", ROWS10)):
        path = f"{FIX}_{label}"
        build_fixture(rows, path)
        for mode in ("exact", "hll"):
            wall, sb = profile_run(mode, path, f"{label}-{mode}")
            print(
                f"| {N_COLS}-col near-unique strings, {rows} rows ({label}) "
                f"| {mode} | {wall:.2f}s | {sb:,} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
