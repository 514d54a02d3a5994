"""Batch snapshot/migration engine.

The reference's 3-phase per-table pipeline (DDL → chunked load → indexes,
migrate_v3.py:860-911) collapses to: read (partitioned) → normalize
(expression library) → write parquet — one Spark job per table, idempotent
skip-if-exists (migrate_v3.py:376-389 analogue). Cross-table parallelism is
a driver-side thread pool submitting independent jobs (scheduler handles
core sharing), matching O1 (8 workers, migrate_v3.py:49,944-954).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

from cdc_connector_spark.functions.normalize import normalize_row
from cdc_connector_spark.snapshot.planner import plan_num_partitions
from cdc_connector_spark.tables import TableMeta

DEFAULT_TABLE_WORKERS = 8  # reference MIGRATION_WORKERS default


def snapshot_table(
    spark: SparkSession,
    source: DataFrame,
    meta: TableMeta,
    sink_root: str,
    rows_per_partition: int = 1_000_000,
    mode: str = "ignore",
    zorder_cols: list[str] | None = None,
    row_count: int | None = None,
) -> str:
    """Snapshot one table: normalize → write parquet at
    ``<sink_root>/<db>_<table>``. ``mode='ignore'`` = idempotent skip when
    the sink already exists; 'overwrite' forces a re-load.

    ``row_count`` sizes the output partitioning WITHOUT a counting pass
    when the caller already knows it (r13 review: ``source.count()`` on
    a live pgcopy/JDBC frame is a SECOND full read of the table through
    the COPY pipes — the one thing a snapshot must never do; the live
    CLI passes the server-side ``SELECT count(*)`` the read planner
    already runs). Parquet sources may leave it None — their count is a
    cheap metadata-only job.

    ``zorder_cols`` is the phase-3 analogue of the reference's index
    re-creation (migrate_v3.py:430-511): instead of CREATE INDEX, cluster
    the layout so parquet row-group stats prune scans on those columns
    (ops/zorder.py)."""
    out_path = os.path.join(sink_root, meta.sink_name)
    if zorder_cols:
        from cdc_connector_spark.ops.zorder import zorder_write

        if mode == "ignore" and os.path.exists(out_path):
            return out_path
        df = normalize_row(
            source,
            bit_bool_cols=meta.bit_bool_cols,
            tinyint_bool_cols=meta.tinyint_bool_cols,
            zero_date_cols=meta.zero_date_cols,
            strip_nul_cols=meta.strip_nul_cols,
            casts=meta.casts,
        )
        n_z = row_count if row_count is not None else source.count()
        n = max(plan_num_partitions(n_z, rows_per_partition), 1)
        zorder_write(df, out_path, zorder_cols, num_files=n, mode="overwrite" if mode != "ignore" else "error")
        return out_path
    df = normalize_row(
        source,
        bit_bool_cols=meta.bit_bool_cols,
        tinyint_bool_cols=meta.tinyint_bool_cols,
        zero_date_cols=meta.zero_date_cols,
        strip_nul_cols=meta.strip_nul_cols,
        casts=meta.casts,
    )
    # size output files: one partition per ~rows_per_partition rows — but
    # never leave the cluster idle on a small table: use up to
    # defaultParallelism writers as long as each still gets ≥10k rows
    # (avoids both a serial write and a spray of tiny files)
    n_rows = row_count if row_count is not None else source.count()
    n = plan_num_partitions(n_rows, rows_per_partition)
    parallel_floor = min(spark.sparkContext.defaultParallelism, max(1, n_rows // 10_000))
    n = max(n, parallel_floor)
    writer = df.repartition(n, *meta.pk_cols) if meta.pk_cols else df.repartition(n)
    writer.write.mode(mode).parquet(out_path)
    return out_path


def snapshot_database(
    spark: SparkSession,
    tables: list[tuple[DataFrame, TableMeta]],
    sink_root: str,
    max_workers: int = DEFAULT_TABLE_WORKERS,
    mode: str = "ignore",
) -> dict[str, str]:
    """Parallel per-table snapshot (O1): independent Spark jobs submitted
    from a thread pool — executors multiplex across jobs."""
    results: dict[str, str] = {}

    def one(arg: tuple[DataFrame, TableMeta]) -> tuple[str, str]:
        df, meta = arg
        return meta.sink_name, snapshot_table(spark, df, meta, sink_root, mode=mode)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        for name, path in ex.map(one, tables):
            results[name] = path
    return results
