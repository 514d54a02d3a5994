#!/usr/bin/env python
"""Enumerate bench entries whose plan Catalyst can partially ELIMINATE
under a ``.count()`` action — the measurement hazard that motivated the
r15 bench protocol v2 (noop-write materialization; see SCALING §4v).

For every ``queries()`` entry, compares node counts (joins, windows,
generates) between the full optimized plan and the plan of its
``groupBy().count()`` twin. An entry appearing here means a count-based
timing does NOT measure the work the correctness gate verifies. This
catches NODE-level elimination only; count() additionally prunes scan
columns and aggregate expressions on most aggregate-shaped entries, so
the absence of an entry here does NOT make count-timing safe — it is a
lower bound, which is why bench.py materializes via noop write instead.

Usage: python tools/count_prune_audit.py [sf_dir] [--json OUT.json]
"""
from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from cdc_connector_spark.session import get_spark  # noqa: E402


def node_counts(df) -> dict:
    p = df._jdf.queryExecution().optimizedPlan().toString()
    return {
        "join": p.count("Join "),
        "win": p.count("Window "),
        "gen": p.count("Generate "),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != out_path]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = {}
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            full = node_counts(df)
            pruned = node_counts(df.groupBy().count())
            diff = {k: full[k] - pruned[k] for k in full if full[k] != pruned[k]}
            if diff:
                flagged[name] = {"full": full, "under_count": pruned}
                print(f"{name:45s} eliminated-under-count: {diff}")
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"{name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
    print(f"flagged {len(flagged)} entries")
    if out_path:
        json.dump(flagged, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
