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

Rank normalization defaults to the scalable quantile path: one
``approxQuantile`` sketch pass per column + vectorized ``searchsorted`` per
Arrow batch — no global sort anywhere. For one column this degenerates to a
plain range-clustered write (clustered index analogue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BITS = 16  # per-column rank resolution; 2 cols → 32-bit z-values


def _interleave(cols: list, bits: int = _BITS):
    """Bit-interleave k integer columns (each < 2^bits) into one long.

    k·bits must fit in the long's 63 value bits: one more and the top
    bit lands in the SIGN position, making the hottest z-range negative
    — range partitioning would then order it FIRST and break curve
    locality exactly where clustering matters most (r14 review). Raise
    instead of silently wrapping; callers lower ``bits`` (rank
    resolution above ~10 bits per column adds nothing once files hold
    millions of rows)."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(
            f"{k} columns x {bits} bits = {k * bits} bits exceeds the "
            "63 value bits of a long z-value; lower bits (e.g. "
            f"bits={63 // k}) or cluster fewer columns"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("long"), b * k + i))
    return z


def zvalue(df: DataFrame, cluster_cols: list[str], bits: int = _BITS, method: str = "quantile"):
    """DataFrame + ``__z`` column: z-value over rank-normalized cluster cols.

    Rank normalization makes the interleave robust to skewed/unbounded
    domains — raw values would let one hot range dominate the curve. Two
    normalizers:

    - ``quantile`` (default, the scale path): one ``approxQuantile`` pass
      per column computes ≤4095 boundaries on the driver, then ranks are a
      vectorized ``searchsorted`` per Arrow batch — no global sort, no
      single-partition window.
    - ``rank``: exact ``percent_rank`` over an UNPARTITIONED window — Spark
      funnels the whole table through one task per column; only for small
      tables / exactness checks.
    """
    out = df
    ranked = []
    if method == "rank":
        for c in cluster_cols:
            w = Window.orderBy(F.col(c))
            rc = f"__r_{c}"
            out = out.withColumn(rc, (F.percent_rank().over(w) * ((1 << bits) - 1)).cast("long"))
            ranked.append(F.col(rc))
    elif method == "quantile":
        from pyspark.sql.functions import pandas_udf

        qbits = min(bits, 12)  # 4095 boundaries is ample rank resolution
        scale = 1 << (bits - qbits)  # stretch back to the full bit width
        n_b = (1 << qbits) - 1
        probs = [i / n_b for i in range(1, n_b)]
        for c in cluster_cols:
            bounds = np.asarray(
                df.select(F.col(c).cast("double").alias("v")).approxQuantile("v", probs, 1e-4),
                dtype=np.float64,
            )

            def make_udf(b):
                @pandas_udf("long")
                def ranks(v: pd.Series) -> pd.Series:
                    arr = v.to_numpy(dtype=np.float64)
                    return pd.Series(np.searchsorted(b, arr, side="right").astype(np.int64))

                return ranks

            rc = f"__r_{c}"
            out = out.withColumn(rc, make_udf(bounds)(F.col(c).cast("double")) * scale)
            ranked.append(F.col(rc))
    else:
        raise ValueError("method must be 'quantile' or 'rank'")
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
