"""Drift root-cause CLI — the `tests/drift_analysis.py` entry-point analogue.

Runs the three drilldowns for one table pair and prints a JSON report with
the reference's verdict logic (drift_analysis.py:417-454): duplicate-key
groups (top-K), orphan sample, and replay-window classification.

    python -m cdc_connector_spark.validation.drift_cli \
        --source-root /data/src --sink-root /data/sink \
        --table orders --pk o_orderkey [--ts-col o_orderdate] [--top-k 100]

Exit 0 when the verdict is clean (aligned, no dupes, no orphans), 1 otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys

from cdc_connector_spark.session import get_spark
from cdc_connector_spark.tables import find_ts_column
from cdc_connector_spark.validation.drift import duplicate_groups, orphan_sample, replay_window


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-root", required=True)
    ap.add_argument("--sink-root", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--pk", required=True, help="pk col, '+'-separated for composite")
    ap.add_argument("--ts-col", default=None)
    ap.add_argument("--top-k", type=int, default=100)
    args = ap.parse_args(argv)

    spark = get_spark("cdc-drift")
    pk_cols = [c for c in args.pk.split("+") if c]
    source = spark.read.parquet(f"{args.source_root}/{args.table}")
    sink = spark.read.parquet(f"{args.sink_root}/{args.table}")
    ts_col = args.ts_col or find_ts_column(source.columns)

    dupes = duplicate_groups(sink, pk_cols, args.top_k).collect()
    orphans = orphan_sample(source, sink, pk_cols, limit=10).collect()
    window = replay_window(source, sink, ts_col) if ts_col else {"verdict": "no_ts_column"}

    report = {
        "table": args.table,
        "duplicate_groups": [r.asDict() for r in dupes],
        "orphan_examples": [r.asDict(recursive=True) for r in orphans],
        "replay_window": window,
    }
    print(json.dumps(report, default=str, indent=2))
    clean = not dupes and not orphans and window.get("verdict") in ("aligned", "no_ts_column")
    return 0 if clean else 1


if __name__ == "__main__":
    sys.exit(main())
