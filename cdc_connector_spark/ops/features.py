"""Feature preprocessing for embedding columns.

``standardize_embeddings`` is the z-score step distance-based ops
(k-means, IVF coarse quantizers, cosine re-ranking after PQ) assume when
dimensions carry heterogeneous scales — without it a single wide
dimension dominates every Euclidean decision.

Spark-first, value-portable shape: per-dimension sufficient statistics
(Σx, Σx²) are round-12 fixed IEEE terms accumulated as DECIMAL(38,12)
(order-independent exact summation — the pagerank discipline), mean/std
are each one fixed double expression, and each standardized coordinate is
one fixed expression rounded 6 — so the whole transform replays in SQL.
Zero-variance dimensions standardize to 0.0 (stated, not NULL/Inf).

Cost: two explodes of the vector column (stats pass + transform pass),
one ≤dims-row broadcast join, one per-id reassembly — all keyed shuffles;
nothing holds more than (dims) rows of state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(dim, n, mean, std) per vector dimension — exact-count, round-12 +
    DECIMAL-accumulated sums, fixed final expressions (population std)."""
    x = F.col("__x")
    cells = df.filter(F.col(vec_col).isNotNull()).select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "__x")
    )
    sums = cells.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(x, 12).cast("decimal(38,12)")).alias("__sx"),
        F.sum(F.round(x * x, 12).cast("decimal(38,12)")).alias("__sxx"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("__sx").cast("double") / n_d
    var = F.col("__sxx").cast("double") / n_d - mean * mean
    return sums.select(
        "dim",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std"),
    )


def standardize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All input columns except ``vec_col``, plus ``z``: the per-dimension
    z-scored vector as array<double> (each coordinate rounded 6; a
    zero-variance dimension contributes 0.0). Mean/std here are the RAW
    fixed expressions (not the display-rounded ``dimension_stats``
    values) so the transform loses no precision before the final round.
    Rows with a NULL vector are ABSENT from the output (posexplode drops
    them — there is nothing to standardize; left-join the result back if
    the caller needs the holes surfaced). ``id_col`` must be unique per
    row: the exploded cells carry ONLY (id, dim, x) — replicating every
    payload column ×dims through the explode shuffle was the pre-r13
    shape (384-dim vectors meant 384 copies of each non-vector column
    as groupBy keys); the other columns re-attach with one id-keyed
    join after the per-id reassembly."""
    keep = [c for c in df.columns if c != vec_col]
    x = F.col("__x")
    cells = df.select(
        id_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "__x")
    )
    sums = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "__v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.round(F.col("__v"), 12).cast("decimal(38,12)")).alias("__sx"),
            F.sum(
                F.round(F.col("__v") * F.col("__v"), 12).cast("decimal(38,12)")
            ).alias("__sxx"),
        )
    )
    n_d = F.col("__n").cast("double")
    mean = F.col("__sx").cast("double") / n_d
    var = F.col("__sxx").cast("double") / n_d - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std > 0, F.round((x - mean) / std, 6)).otherwise(F.lit(0.0))
    scored = cells.join(F.broadcast(sums), "dim").select(
        id_col, "dim", z.alias("__z")
    )
    zs = scored.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "__z"))),
            lambda s: s["__z"],
        ).alias("z")
    )
    # re-select in the ORIGINAL keep order plus z — the string-key join
    # moves id_col to the front, and callers consuming rows positionally
    # would see a silent ordering change (advisor, r14)
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(*keep)
        .join(zs, id_col)
        .select(*keep, "z")
    )
