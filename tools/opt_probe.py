#!/usr/bin/env python
"""Focused optimization probe (r15): time selected queries() entries with
the bench's protocol-v2 methodology (noop-sink materialization, warm-up run
discarded, median of N) and optionally dump .explain("formatted") plans.

Usage:
  python tools/opt_probe.py [--sf DIR] [--runs N] [--plans OUTDIR --suffix before] q1 q2 ...

Prints one line per query: name, median seconds, all run times. Writes
plans to OUTDIR/<query>_<suffix>.txt when --plans is given. Never touches
BENCH_FULL.json; this is an iteration tool, not the official bench.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from cdc_connector_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    plans_dir = None
    suffix = "before"
    names = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(argv[i + 1])
            i += 2
        elif a == "--plans":
            plans_dir = argv[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    os.environ["SPARK_GRAFT_SKIP_RECALL_GATE"] = "1"  # bench parity
    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_connector_spark.tables import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = qs[name]
        if plans_dir:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(plans_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
        timed = []
        for r in range(runs + 1):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}:{r}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if r > 0:  # run 0 pays codegen — bench protocol parity
                timed.append(dt)
        med = statistics.median(timed)
        print(
            f"{name}: {med:.3f}s  runs={[round(t, 3) for t in timed]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
