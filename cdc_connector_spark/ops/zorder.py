"""Z-order clustering — the engine's analogue of the reference's secondary
indexes (migrate_v3.py:307-336 extracts them; SURVEY.md §1.1 maps indexes →
"Z-ORDER/partitioning as analogue").

Parquet has no indexes; what it has is row-group min/max statistics, and
Spark's scan skips row groups whose stats exclude the pushed filter. That
skipping only bites when values are CLUSTERED — a random layout gives every
file the full min..max range. ``zorder_by`` interleaves the bits of the
(rank-normalized) cluster columns into one z-value and range-partitions +
sorts by it, so each output file covers a small hyper-rectangle of the key
space and point/range predicates on ANY clustered column prune most files.

All expression-level (codegen); ranks come from ``percent_rank`` windows —
one pass per column, same cost family as any global sort. For one column
this degenerates to a plain range-sorted write (clustered index analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BITS = 16  # per-column rank resolution; 2 cols → 32-bit z-values


def _interleave(cols: list, bits: int = _BITS):
    """Bit-interleave k integer columns (each < 2^bits) into one long."""
    z = F.lit(0).cast("long")
    k = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("long"), b * k + i))
    return z


def zvalue(df: DataFrame, cluster_cols: list[str], bits: int = _BITS):
    """DataFrame + ``__z`` column: z-value over rank-normalized cluster cols.

    Rank normalization (percent_rank → fixed-width integer) makes the
    interleave robust to skewed/unbounded domains — raw values would let one
    hot range dominate the curve.
    """
    out = df
    ranked = []
    for c in cluster_cols:
        w = Window.orderBy(F.col(c))
        rc = f"__r_{c}"
        out = out.withColumn(rc, (F.percent_rank().over(w) * ((1 << bits) - 1)).cast("long"))
        ranked.append(F.col(rc))
    out = out.withColumn("__z", _interleave(ranked, bits))
    return out.drop(*[f"__r_{c}" for c in cluster_cols])


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` z-ordered by ``cluster_cols``: range-partition on the
    z-value then sort within partitions, so every file's min/max footprint
    on each cluster column is tight → row-group skipping works."""
    (
        zvalue(df, cluster_cols)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_stats(spark, path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footers — the evidence
    that clustering tightened the skipping bounds (for tests/inspection)."""
    import pyarrow.parquet as pq
    import os

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out
