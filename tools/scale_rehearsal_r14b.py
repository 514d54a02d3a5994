#!/usr/bin/env python
"""Round-14 rehearsal part B (SCALING.md §4t): the length-aware fuzzy
string-carry branch at 10×.

Question: does carrying the normalized strings through the candidate
join (the r14 short-string branch) stay the right choice when the
short-name corpus grows 10×, or does the carried-byte cost overtake the
two saved id-keyed re-attach joins? Both branches produce the identical
pair set (asserted in-run); the metered units are wall, shuffle bytes,
and job count per the r12 methodology.

Corpus: TPC-H customer names replicated 10× with remapped ids and a
per-replica name suffix (so near-dup structure per name family is
preserved but ids stay unique). Modes measured: gated qgram/cap (the
driver entries' shape — fuzzy_gated/golden_record) and token/cap.

Usage: python tools/scale_rehearsal_r14b.py [sf_dir]
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
LOGS = "/tmp/r14b_rehearsal_eventlogs"
DATA = "/tmp/r14b_rehearsal_data"


def metered_app(tag: str, fn):
    logdir = os.path.join(LOGS, tag)
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    spark = get_spark(
        f"r14b-{tag}",
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
    shuffle = jobs = 0
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
                    tm = ev.get("Task Metrics") or {}
                    shuffle += int(
                        (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
                    )
                elif ev.get("Event") == "SparkListenerJobStart":
                    jobs += 1
    return wall, result, {"shuffle_mb": shuffle / 1e6, "jobs": jobs}


def build_10x() -> str:
    p = os.path.join(DATA, "cust_10x")
    if os.path.isdir(p):
        return p
    spark = get_spark("r14b-build")
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_connector_spark.tables import load_table

    cust = load_table(spark, SF_DIR, "customer")
    (
        cust.select("c_custkey", "c_name", "c_nationkey")
        .withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .select(
            (F.col("c_custkey") * 10 + F.col("__rep")).alias("c_custkey"),
            F.concat(F.col("c_name"), F.lit(" r"), F.col("__rep")).alias("c_name"),
            "c_nationkey",
        )
        .write.mode("overwrite")
        .parquet(p)
    )
    spark.stop()
    return p


def run_mode(path: str, carry: bool, gated: bool):
    def fn(spark):
        from cdc_connector_spark.ops.fuzzy import fuzzy_pairs

        df = spark.read.parquet(path)
        kw = dict(text_col="c_name", id_col="c_custkey", max_dist=1, carry_strings=carry)
        if gated:
            kw.update(block="qgram", extra_block_cols=("c_nationkey",))
        else:
            kw.update(block="token")
        return fuzzy_pairs(df, **kw).count()

    return fn


def main() -> None:
    p10 = build_10x()
    print("| experiment (10x customers, 1.5M names) | wall | jobs | shuffle |")
    print("|---|---|---|---|")
    for label, gated in (("gated qgram/cap", True), ("token/cap", False)):
        w_c, n_c, m_c = metered_app(f"{'g' if gated else 't'}-carry", run_mode(p10, True, gated))
        w_r, n_r, m_r = metered_app(f"{'g' if gated else 't'}-reattach", run_mode(p10, False, gated))
        assert n_c == n_r, (label, n_c, n_r)
        print(f"| {label}, carry (r14 short branch) | {w_c:.2f}s | {m_c['jobs']} | {m_c['shuffle_mb']:.1f} MB |")
        print(f"| {label}, id-only re-attach (r13) | {w_r:.2f}s | {m_r['jobs']} | {m_r['shuffle_mb']:.1f} MB |")
        print(
            f"# {label}: identical {n_c} pairs; carry wall {w_c / w_r:.2f}x, "
            f"shuffle {m_c['shuffle_mb'] / max(m_r['shuffle_mb'], 0.001):.2f}x of re-attach",
            flush=True,
        )


if __name__ == "__main__":
    main()
