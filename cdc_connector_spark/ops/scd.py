"""Slowly-changing-dimension (SCD Type 2) interval building: turn a
per-key change stream into validity intervals — the warehouse-dimension
complement to the changelog plane (``changelog/apply.py`` keeps the
LATEST row per key; SCD2 keeps EVERY state with [from, to) bounds so
facts join to the state that was true at their time — the Kimball
dimension pattern; pairs with ``ops/asof.py`` for the point-in-time
join).

Spark-first shape: one per-key ordered window pass — lag() to compress
consecutive duplicate states (re-asserting the same state is a CDC echo,
not a new version), lead() to close each surviving interval; no joins,
no iteration. Cost: one key-hash shuffle of the change stream, then
codegen windows.

Portable by construction: interval bounds surface as unix MICROSECONDS
(exact BIGINTs — timestamp rendering differs across engines, integers
never do), and version numbers are row_numbers over the same total
order. Include a unique tiebreaker in ``order_cols``: with bare
duplicate timestamps the compression, and therefore the intervals,
would be nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Build SCD Type 2 validity intervals from a change stream.

    Returns one row per key STATE VERSION:
    (key, state, version, effective_from_us, effective_to_us, is_current)
    where version numbers from 1 in change order, ``effective_from_us``
    is the first event that asserted the state, ``effective_to_us`` is
    the next version's start (NULL on the open/current version — the
    half-open [from, to) convention), and consecutive re-assertions of
    the same state collapse into their first occurrence (the CDC-echo
    compression; an A→B→A history keeps three versions — state
    recurrence IS a new version, only adjacency compresses)."""
    from pyspark.sql import Window

    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    extra = [c for c in order_cols if c not in (ts_col, key_col, state_col)]
    base = df.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        ts_us.alias("__t"),
        *[F.col(c) for c in extra],
    )
    # both windows use the SAME total order (micros + tiebreakers) — the
    # compression filter and the interval lead must agree on adjacency
    order = [F.col("__t")] + [F.col(c) for c in extra]
    w = Window.partitionBy(key_col).orderBy(*order)
    changes = base.withColumn("__prev", F.lag("state").over(w)).filter(
        F.col("__prev").isNull() | (F.col("state") != F.col("__prev"))
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return changes.select(
        F.col(key_col),
        "state",
        F.row_number().over(w2).alias("version"),
        F.col("__t").alias("effective_from_us"),
        F.lead("__t").over(w2).alias("effective_to_us"),
        F.lead("__t").over(w2).isNull().alias("is_current"),
    )


def bitemporal_as_of(
    df: DataFrame,
    valid_at_us: int,
    known_at_us: int,
    key_col: str = "user_id",
    state_col: str = "event_type",
    valid_ts_col: str = "ts",
    recorded_ts_col: str = "recorded_ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Bitemporal point query over a change stream carrying BOTH time
    axes: "what state was valid at time V, according to what the system
    had RECORDED by time T" — the audit/backfill question one-axis SCD2
    cannot answer (a late-arriving correction changes the answer for T
    after its ingestion but not before; reproducing yesterday's report
    needs yesterday's T). The standard bitemporal semantics (Snodgrass):
    restrict to rows with recorded_ts <= T, then take the latest
    valid_ts <= V per key.

    Value-portable: both cutoffs compare as unix MICROSECOND BIGINTs
    (the scd2_intervals discipline — never timestamp rendering), the
    per-key pick is a row_number over (valid_us DESC, recorded_us DESC,
    tiebreakers DESC): among rows with EQUAL valid time the
    latest-RECORDED version wins — the canonical bitemporal case of a
    late-arriving correction carrying the same valid timestamp
    (Snodgrass; r10 ADVICE) — with order_cols only breaking exact
    (valid, recorded) ties deterministically.

    Returns (key, state, valid_from_us, recorded_us) — one row per key
    that HAD a state valid at V known by T; keys with no qualifying row
    are absent (stated, not NULL-padded).

    Shape: one filtered scan + one key-hash shuffle for the window. The
    cutoffs compare the RAW timestamp columns against timestamp
    literals — on a TimestampType column the no-op cast is optimized
    away and the comparison reaches PushedFilters (the pre-r13 form
    filtered on ``unix_micros(cast(...))``, a computed expression the
    scan cannot see: only IsNotNull pushed, and a recorded-day
    partition layout — the natural CDC shape — pruned nothing;
    pinned in test_plan_invariants). The micros conversion happens
    AFTER the filter, for the output and the window order only."""
    from pyspark.sql import Window

    valid_us = F.unix_micros(F.col(valid_ts_col).cast("timestamp"))
    recorded_us = F.unix_micros(F.col(recorded_ts_col).cast("timestamp"))
    extra = [c for c in order_cols if c not in (valid_ts_col, key_col, state_col)]
    base = (
        df.filter(
            (
                F.col(recorded_ts_col).cast("timestamp")
                <= F.timestamp_micros(F.lit(known_at_us))
            )
            & (
                F.col(valid_ts_col).cast("timestamp")
                <= F.timestamp_micros(F.lit(valid_at_us))
            )
        )
        .select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            valid_us.alias("__v"),
            recorded_us.alias("__r"),
            *[F.col(c) for c in extra],
        )
    )
    order = [F.col("__v").desc(), F.col("__r").desc()] + [
        F.col(c).desc() for c in extra
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        base.withColumn("__pk", F.row_number().over(w))
        .filter(F.col("__pk") == 1)
        .select(
            F.col(key_col),
            "state",
            F.col("__v").alias("valid_from_us"),
            F.col("__r").alias("recorded_us"),
        )
        .orderBy(key_col)
    )
