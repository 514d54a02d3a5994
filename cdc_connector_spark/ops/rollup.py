"""Incremental time-window rollup (continuous-aggregate / IVM operator).

A hypertable-style rollup the reference lacks: maintain a per-(window, key)
aggregate table INCREMENTALLY from change batches instead of recomputing
from all history. Inserts add their contribution; deletes RETRACT the prior
contribution (op='d' rows must carry the before-image values, which the CDC
envelope provides — changelog/envelope.py flattens ``before`` for deletes).

Only additive aggregates (count, sum; avg = sum/count at read time) — the
standard IVM restriction. Merge is associative/commutative, so batches can
apply in any order and the result equals a full recompute over the surviving
events (proved by parity test + DuckDB oracle).

Scale: each batch touches only its own (window, key) groups — one partial
aggregation of the batch (map-side combine) + one co-partitioned merge with
the current rollup. At 100 TB the rollup table is orders of magnitude
smaller than the fact stream; this is the operator that turns "re-aggregate
a year of events" into "merge an hour's partials".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


def rollup_delta(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    op_col: str | None = None,
) -> DataFrame:
    """Partial rollup of ONE batch: signed contributions per (window, key).

    With ``op_col``, delete events contribute negatively (retraction);
    without it every row is an insert.
    """
    keys = key_cols or []
    sign = (
        F.when(F.col(op_col) == "d", F.lit(-1)).otherwise(F.lit(1))
        if op_col
        else F.lit(1)
    )
    win = F.window(F.col(ts_col), window)
    return (
        events.groupBy(win, *[F.col(k) for k in keys])
        .agg(
            F.sum(sign).alias("n_events"),
            F.sum((F.col(value_col) * sign).cast(_DEC)).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(k) for k in keys],
            "n_events",
            "sum_value",
        )
    )


def merge_rollup(current: DataFrame | None, delta: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Merge a batch's partial rollup into the current rollup state.

    Additive merge on (window, key). Only the ALL-ZERO group (count 0 AND
    sum 0 — the additive identity, i.e. a fully-retracted window) may be
    dropped: a zero count with a nonzero sum is legitimate transient state
    when a retraction lands in an earlier batch than its insert, and
    dropping it would break associativity (caught by property test).
    """
    keys = key_cols or []
    if current is None:
        merged = delta
    else:
        merged = (
            current.unionByName(delta)
            .groupBy("window_start", "window_end", *keys)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum(F.col("sum_value").cast(_DEC)).alias("sum_value"),
            )
        )
    return merged.filter((F.col("n_events") != 0) | (F.col("sum_value") != 0))


def rollup_read(rollup: DataFrame) -> DataFrame:
    """Read-time view: surface sums as DOUBLE + derived avg. A transient
    retract-before-insert group (count 0, nonzero sum — legitimate state,
    see merge_rollup) yields NULL avg, not IEEE Infinity (r14 review:
    double/0 is Inf under ANSI, and Inf poisons downstream aggregates)."""
    return rollup.select(
        "*",
        F.when(
            F.col("n_events") != 0,
            F.col("sum_value").cast("double") / F.col("n_events"),
        ).alias("avg_value"),
    ).withColumn("sum_value", F.col("sum_value").cast("double"))
