"""Snapshot read planning.

Replaces the reference's hand-rolled chunking (get_id_ranges
migrate_v3.py:527-554, 1M-row chunks ×10 workers, LIMIT/OFFSET pagination —
an O(n²) re-scan pathology, SURVEY.md §4) with Spark's native partitioned
JDBC read: ``column/lowerBound/upperBound/numPartitions`` makes every
executor read one closed range, no OFFSET ever.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference defaults (BASELINE.md): 1M-row chunks; we keep rows-per-partition
# as the planning unit but let the cluster's core count set a floor.
DEFAULT_ROWS_PER_PARTITION = 1_000_000
LARGE_TABLE_THRESHOLD = 1_000_000


@dataclass
class RangePlan:
    column: str | None
    lower: int | None
    upper: int | None
    num_partitions: int


def plan_num_partitions(
    row_count: int,
    rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION,
    min_partitions: int = 1,
    max_partitions: int = 10_000,
) -> int:
    """ceil(count/chunk), clamped. The reference's threshold switch
    (≥1M rows → chunked, migrate_v3.py:712) degenerates to 'partition count
    is 1 for small tables' — no special-case branch needed."""
    n = max(min_partitions, -(-row_count // max(rows_per_partition, 1)))
    return min(n, max_partitions)


def plan_range(df: DataFrame, pk_col: str, rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION) -> RangePlan:
    """min/max/count in ONE aggregate pass (the reference issues separate
    statements, migrate_v3.py:530-539)."""
    row = df.agg(
        F.min(pk_col).alias("lo"), F.max(pk_col).alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return RangePlan(
        column=pk_col,
        lower=row["lo"],
        upper=row["hi"],
        num_partitions=plan_num_partitions(row["n"], rows_per_partition),
    )


def choose_partition_column(pk_cols: list[str], schema) -> str | None:
    """First numeric PK column, else None → unpartitioned sequential read
    (the reference's fallback, migrate_v3.py:513-525,752-756)."""
    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "long", "short"}
    for c in pk_cols:
        try:
            t = schema[c].dataType.typeName()
        except KeyError:
            continue
        if any(t.startswith(n) for n in numeric):
            return c
    return None


def jdbc_read_options(
    url: str,
    table: str,
    plan: RangePlan,
    fetch_size: int = 100_000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options dict for ``spark.read.format("jdbc")`` — partitioned when the
    plan has a numeric range column. fetch_size mirrors the reference's
    100k batch (migrate_v3.py:48)."""
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if plan.column is not None and plan.lower is not None and plan.upper is not None and plan.num_partitions > 1:
        opts.update(
            {
                "partitionColumn": plan.column,
                "lowerBound": str(plan.lower),
                "upperBound": str(plan.upper),
                "numPartitions": str(plan.num_partitions),
            }
        )
    if properties:
        opts.update(properties)
    return opts
