"""Snapshot/migration CLI — the `migrate_v3.py` entry-point analogue.

Reference trace (SURVEY.md §3.1): ``python3 migrate_v3.py --database trading
--tables all`` → discover tables → 3-phase per-table migrate with thread
pools. Here: discover parquet tables (or a JDBC source) → parallel
``snapshot_table`` jobs (read → normalize → partitioned write), flags
mirroring migrate_v3.py:960-1015:

    python -m cdc_connector_spark.snapshot.cli \
        --source-root /root/testdata/sf0.001 --database tpch --tables all \
        --sink-root /tmp/sink [--max-workers 8] [--rows-per-partition 1000000] \
        [--overwrite] [--pk table=col1,col2 ...]

The reference's ``--batch-size`` / ``--threshold`` collapse into
``--rows-per-partition`` (partition-count planning replaces both, SURVEY.md
§4). Exit 0 on success; 1 if any table fails.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from cdc_connector_spark.session import get_spark
from cdc_connector_spark.snapshot.engine import snapshot_database
from cdc_connector_spark.tables import meta_from_df

# default PK registry for the driver testdata; --pk overrides/extends (S4/S6)
DEFAULT_PKS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def discover_tables(source_root: str, pattern: str = "*") -> list[str]:
    """S5: table discovery — parquet files/dirs under the source root."""
    names = []
    for p in sorted(glob.glob(os.path.join(source_root, f"{pattern}.parquet"))):
        names.append(os.path.basename(p)[: -len(".parquet")])
    return names


def parse_pk_overrides(specs: list[str]) -> dict[str, list[str]]:
    out = {}
    for spec in specs:
        table, _, cols = spec.partition("=")
        out[table] = [c for c in cols.split(",") if c]
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--source-root", help="directory of <table>.parquet sources")
    ap.add_argument("--pg-host", help="LIVE source: PostgreSQL host or unix-socket dir (S1/S2 executed)")
    ap.add_argument("--pg-dbname", default="postgres")
    ap.add_argument("--pg-user", default="postgres")
    ap.add_argument("--pg-port", type=int, default=5432)
    ap.add_argument("--database", default="db", help="logical database name (sink prefix)")
    ap.add_argument("--tables", default="all", help="'all' or comma-separated table list")
    ap.add_argument("--sink-root", required=True)
    ap.add_argument("--max-workers", type=int, default=8, help="parallel tables (O1)")
    ap.add_argument("--rows-per-partition", type=int, default=1_000_000)
    ap.add_argument("--overwrite", action="store_true", help="re-load existing sinks (default: idempotent skip)")
    ap.add_argument("--pk", action="append", default=[], metavar="TABLE=COL[,COL]", help="primary-key override")
    args = ap.parse_args(argv)
    if not args.source_root and not args.pg_host:
        ap.error("one of --source-root or --pg-host is required")

    spark = get_spark("cdc-connector-spark-migrate")
    pks = dict(DEFAULT_PKS)
    pks.update(parse_pk_overrides(args.pk))

    pg = None
    if args.pg_host:
        from cdc_connector_spark.sources.pg_copy import (
            PgConn,
            PostgresCopyDataSource,
            run_sql,
        )

        pg = PgConn(host=args.pg_host, dbname=args.pg_dbname, user=args.pg_user, port=args.pg_port)
        spark.dataSource.register(PostgresCopyDataSource)

    if args.tables != "all":
        names = [t.strip() for t in args.tables.split(",") if t.strip()]
    elif pg is not None:
        names = run_sql(pg, "SELECT tablename FROM pg_tables WHERE schemaname = 'public' ORDER BY 1").split()
    else:
        names = discover_tables(args.source_root)
    if not names:
        print("no tables found", file=sys.stderr)
        return 1

    import json
    from concurrent.futures import ThreadPoolExecutor

    from cdc_connector_spark.snapshot.engine import snapshot_table
    from cdc_connector_spark.snapshot.planner import choose_partition_column
    from cdc_connector_spark.tables import load_table

    mode = "overwrite" if args.overwrite else "ignore"

    def read_live(name: str):
        """Partitioned live read (S1/S2): range-planned by the source's own
        stats; index/FK metadata captured for the migration report. The
        row count comes back as a SERVER-SIDE aggregate (no rows ship) so
        snapshot_table can size its output partitioning without a second
        full COPY read of the source (r13 review)."""
        from cdc_connector_spark.sources.pg_copy import (
            pg_foreign_keys,
            pg_table_indexes,
            pg_table_schema,
            run_sql,
        )

        schema = pg_table_schema(pg, name)
        pk = pks.get(name, [])
        pcol = choose_partition_column(pk, schema)
        opts = dict(pg.options(), table=name, rows_per_partition=str(args.rows_per_partition))
        if pcol:
            opts["partition_column"] = pcol
        df = spark.read.format("pgcopy").options(**opts).load()
        # sizing-only count: its OWN statement (no shared snapshot with
        # the COPY read), so on a live table it can drift from the rows
        # actually copied — benign partition-size skew, never a
        # correctness input. Identifier quoting escapes embedded quotes.
        qname = name.replace('"', '""')
        n = int(run_sql(pg, f'SELECT count(*) FROM "{qname}"').strip())
        return df, n, pg_table_indexes(pg, name), pg_foreign_keys(pg, name)

    def one(name: str) -> tuple[str, str | None, str | None]:
        try:
            if pg is not None:
                df, n_rows, indexes, fks = read_live(name)
            else:
                df, n_rows, indexes, fks = (
                    load_table(spark, args.source_root, name), None, [], [],
                )
            meta = meta_from_df(
                args.database, name, df, pks.get(name, []),
                indexes=indexes, foreign_keys=fks,
            )
            path = snapshot_table(
                spark, df, meta, args.sink_root, mode=mode, row_count=n_rows
            )
            # migration report: what physical metadata existed at the source
            with open(os.path.join(args.sink_root, f"{meta.sink_name}.meta.json"), "w") as f:
                json.dump(meta.to_dict(), f, default=str)
            return name, path, None
        except Exception as e:  # noqa: BLE001 — per-table isolation (O1)
            return name, None, f"{type(e).__name__}: {e}"

    failed = False
    with ThreadPoolExecutor(max_workers=args.max_workers) as ex:
        for name, path, err in sorted(ex.map(one, names)):
            if err:
                failed = True
                print(f"[FAIL] {name}: {err}", file=sys.stderr)
            else:
                n = spark.read.parquet(path).count()
                print(f"[OK] {name}: {n} rows -> {path}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
