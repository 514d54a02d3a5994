"""Stream-stream interval (time-bounded) joins.

The attribution shape: join an anchor stream (purchases) to a context
stream (clicks) on a key, keeping only context events inside a time window
ending at the anchor event — `c.ts ∈ [p.ts − lookback, p.ts]`.

The reference has no streaming join at all (its pipeline is
source→normalize→sink, SURVEY.md §2.7); this is the idiomatic Structured
Streaming upgrade. Spark requires exactly this shape for a stream-stream
join to be runnable: an equality key plus a RANGE condition on both event
times, with watermarks on both inputs — that pair is what lets the engine
expire join state. State size ≈ (lookback + watermark) of the context
stream per key, independent of total stream length.

Batch parity: the same builder works on batch DataFrames (the watermark
call is skipped), so correctness is value-verified hermetically in batch
(driver oracle `interval_join_events`) and the streaming tests cover only
the trigger/watermark mechanics — the windows.py pattern.

Scale notes: the join shuffles both sides on the key; the time-range
predicate is applied post-shuffle by the stream-stream join operator with
state eviction at `max(event time) − watermark − lookback`. A missing
watermark on EITHER side would make state unbounded, so `watermark` is a
required argument here, not an option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    anchors: DataFrame,
    context: DataFrame,
    key_col: str,
    lookback: str = "1 hour",
    anchor_ts: str = "ts",
    context_ts: str = "ts",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each anchor row to the context rows of the same key whose event
    time falls in ``[anchor.ts − lookback, anchor.ts]``.

    Returns all anchor columns prefixed ``a_`` and context columns prefixed
    ``c_`` (the join key stays unprefixed), plus ``lag_us`` — microseconds
    from context event to anchor event (BIGINT: exact, engine-portable).

    ``how``: 'inner' or 'left_outer' (anchors with no context in the window
    survive with NULL context columns — supported by Spark for stream-stream
    joins because the watermark bounds how long an anchor must wait).
    """
    a = anchors
    c = context
    if a.isStreaming:
        a = a.withWatermark(anchor_ts, watermark)
    if c.isStreaming:
        c = c.withWatermark(context_ts, watermark)
    a = a.select(
        F.col(key_col),
        *[F.col(x).alias(f"a_{x}") for x in a.columns if x != key_col],
    )
    c = c.select(
        F.col(key_col).alias("__ck"),
        *[F.col(x).alias(f"c_{x}") for x in c.columns if x != key_col],
    )
    a_ts = F.col(f"a_{anchor_ts}")
    c_ts = F.col(f"c_{context_ts}")
    cond = (
        (F.col(key_col) == F.col("__ck"))
        & (c_ts >= a_ts - F.expr(f"INTERVAL {lookback}"))
        & (c_ts <= a_ts)
    )
    out = a.join(c, cond, how)
    # cast handles TIMESTAMP_NTZ inputs (session tz is pinned UTC, so the
    # NTZ->TZ reinterpretation matches DuckDB's epoch_us on naive ts)
    return out.drop("__ck").withColumn(
        "lag_us",
        F.unix_micros(a_ts.cast("timestamp")) - F.unix_micros(c_ts.cast("timestamp")),
    )
