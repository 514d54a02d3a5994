#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from cdc_connector_spark.session import get_spark

# headline set: CDC/reconciliation plane + analytics + LLM ops
HEADLINE = [
    "q1_pricing_summary",
    "rowcounts",
    "distinct_pk_lineitem",
    "dup_groups_topk",
    "anti_join_orphans",
    "changelog_latest_per_key",
    "segment_revenue",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "window_user_sequence",
    "dedup_exact_documents",
    "text_stats_documents",
    "ann_cosine_topk",
    "minhash_neardup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("cdc-connector-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listings once (steady-state timing; a cluster at
    # 100 TB doesn't pay local JVM startup per query)
    from cdc_connector_spark.tables import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
