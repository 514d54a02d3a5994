"""Bucketed-table layout for exchange-free (co-located) joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides on the join key. Spark's Hive-style bucketing removes it: a table
written with ``bucketBy(n, key)`` records the bucketing in the catalog,
and a join of two tables bucketed on the SAME key with the SAME bucket
count reads co-located buckets directly — SortMergeJoin with ZERO
Exchange operators (sorting still happens unless ``sortBy`` pre-sorted
the buckets). This is the batch-layout twin of the txlog sink's
key-hash buckets (changelog/txlog.py): both pin a partitioning by key so
repeated keyed work never re-shuffles.

The trade: bucketed tables are catalog objects (``saveAsTable``), the
bucket count is fixed at write time, and both join sides must agree on
it — which is why ``save_bucketed`` defaults to one shared constant.
Guidance for choosing it is the same as the sink's ``num_buckets``
(SCALING.md §5: ≈ table size / 256 MB, stable across versions).

Reference anchor: the reference co-locates by routing each table's
changes through single-partition topics (ordering) and relies on the
target database for join locality; on Spark, bucketing is the native
equivalent for the heavy recurring joins (reconciliation's key-equality
compare, orphan checks) once tables outgrow broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table. Joining two tables
    bucketed on the same cols/count is exchange-free; adding
    ``sort_cols`` (usually = bucket_cols) also removes the per-task sort
    from SortMergeJoin."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def bucketed_tables_aligned(spark: SparkSession, a: str, b: str) -> bool:
    """True when tables ``a`` and ``b`` have identical bucket columns and
    counts — the precondition for an exchange-free join (a mismatch
    silently degrades to a full shuffle, so check loudly in pipelines)."""

    def spec(t: str) -> tuple:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        return info.get("Num Buckets"), info.get("Bucket Columns")

    sa, sb = spec(a), spec(b)
    return sa == sb and sa[0] is not None
