"""Event-time windowed aggregation with watermarks.

The reference has NO windowed/stateful aggregation (SURVEY.md §2.7: its only
state is the sink table itself); these are the idiomatic Spark upgrades for
late/duplicate handling that a streaming analytics engine needs:

- tumbling / sliding window counts+sums over an event-time column
- session windows (gap-based)
- watermark-driven late-data drop and state eviction

All builders work identically on batch DataFrames (window/session_window are
plain expressions there), so correctness is testable hermetically in batch
and the streaming tests only cover the trigger/watermark mechanics.

Scale notes: windowed aggregation shuffles on (key, window); state size is
bounded by the watermark delay — without a watermark Spark must keep every
window open forever, so ``watermark`` is a required argument, not an option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding when ``slide`` is given) event-time aggregation:
    count + sum(value) per (window, key). On a streaming input the watermark
    bounds state and drops events later than ``watermark``."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    keys = [win] + ([F.col(key_col)] if key_col else [])
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(F.col(value_col).cast("decimal(30,6)")).cast("double").alias("sum_value"))
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *([F.col(key_col)] if key_col else []),
        *[F.col(c) for c in ("n_events", "sum_value") if c in out.columns],
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: events of one key closer than ``gap`` merge into one
    session. State per open session, evicted past the watermark."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )


def top_keys_per_window(
    counts: DataFrame,
    k: int = 3,
    window_col: str = "window_start",
    key_col: str = "event_type",
    n_col: str = "n_events",
) -> DataFrame:
    """Trending keys: rank a windowed-count frame (``windowed_event_stats``
    output) per window by (count desc, key asc — deterministic) and keep
    the top ``k``. A batch/emission-side op BY DESIGN: Spark cannot rank
    incrementally inside an append-mode streaming aggregation (a late
    event can demote an already-emitted leader), so the streaming shape
    is counts-with-watermark → sink → this ranking over the emitted,
    watermark-finalized windows — exactly-once semantics fall out of the
    window finalization instead of a retraction protocol.

    One shuffle keyed by the window; per-window sort over ≤ |keys| rows.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(window_col).orderBy(F.col(n_col).desc(), F.col(key_col).asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
