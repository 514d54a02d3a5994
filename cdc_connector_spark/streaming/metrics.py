"""Queryable streaming-metrics snapshots: the engine's analogue of the
reference's JMX -> Prometheus export (metrics.yaml:4-40 maps Debezium
connector metrics and Kafka Connect source/sink task gauges — rows/sec,
batch sizes, commit latency — into labeled per-connector/task series).

Spark-first shape: Structured Streaming already computes the per-batch
numbers (StreamingQueryProgress: numInputRows, processedRowsPerSecond,
durationMs, watermark, state-operator rows); what the reference's rule
file adds is a uniform, queryable, labeled surface. ``StreamingMetrics``
is that surface as a DataFrame:

- ``register(name, query)`` labels a live StreamingQuery (or anything
  exposing ``recentProgress``/``lastProgress`` — a ``ChangelogStream``'s
  started query) the way metrics.yaml labels a connector/task;
- ``collect()`` drains each registered query's bounded
  ``recentProgress`` ring (spark.sql.streaming.numRecentProgressUpdates,
  default 100) into per-batch rows, deduplicated on (stream, batch_id)
  — idempotent, so a scheduler can call it on any cadence;
- ``snapshot()`` returns the accumulated rows as a DataFrame with a
  stable schema — the "scrape";
- ``report(df)`` (module function, shared by the collector and the
  driver-level replay entry) rolls per-batch rows up to per-stream
  gauges: batches, rows, exact rows/sec over summed busy time, max/last
  batch duration, last batch id — the per-connector task summary a
  Prometheus rule set produces.

Driver-side state is BOUNDED: each collect() holds at most the progress
ring per stream (100 dicts) and the accumulated map grows by distinct
(stream, batch_id) — the same order as the number of triggers observed,
thousands of tiny rows, never corpus-scale. At 100 TB the data plane
never routes through this module; it only reads driver-held progress
summaries the stream engine maintains anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("batch_ts", T.StringType(), True),
        T.StructField("num_input_rows", T.LongType(), True),
        T.StructField("input_rows_per_sec", T.DoubleType(), True),
        T.StructField("processed_rows_per_sec", T.DoubleType(), True),
        T.StructField("trigger_ms", T.LongType(), True),
        T.StructField("add_batch_ms", T.LongType(), True),
        T.StructField("watermark", T.StringType(), True),
        T.StructField("state_rows", T.LongType(), True),
        T.StructField("state_memory_bytes", T.LongType(), True),
        T.StructField("dropped_by_watermark", T.LongType(), True),
    ]
)


def parse_progress(stream: str, p: dict) -> dict:
    """One StreamingQueryProgress dict -> one PROGRESS_SCHEMA row. Pure
    (no Spark), so the mapping is unit-testable against captured progress
    JSON. Absent fields become NULL — e.g. stateless queries report no
    state operators, file sources no watermark."""
    dur = p.get("durationMs") or {}
    states = p.get("stateOperators") or []
    ew = (p.get("eventTime") or {}).get("watermark")
    return {
        "stream": stream,
        "batch_id": int(p["batchId"]),
        "batch_ts": p.get("timestamp"),
        "num_input_rows": _long(p.get("numInputRows")),
        "input_rows_per_sec": _dbl(p.get("inputRowsPerSecond")),
        "processed_rows_per_sec": _dbl(p.get("processedRowsPerSecond")),
        "trigger_ms": _long(dur.get("triggerExecution")),
        "add_batch_ms": _long(dur.get("addBatch")),
        "watermark": ew if ew not in ("1970-01-01T00:00:00.000Z",) else None,
        "state_rows": _long(sum(s.get("numRowsTotal", 0) for s in states)) if states else None,
        "state_memory_bytes": _long(sum(s.get("memoryUsedBytes", 0) for s in states)) if states else None,
        "dropped_by_watermark": _long(sum(s.get("numRowsDroppedByWatermark", 0) for s in states)) if states else None,
    }


def _long(v) -> int | None:
    return None if v is None else int(v)


def _dbl(v) -> float | None:
    # Spark reports NaN rates on the first trigger of an idle source;
    # NULL is the queryable form (AVG/SUM skip it, NaN poisons them)
    if v is None:
        return None
    v = float(v)
    return None if v != v else v


class StreamingMetrics:
    """Bounded driver-side collector turning registered streams'
    progress into a queryable DataFrame (see module docstring)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._queries: dict[str, object] = {}
        self._rows: dict[tuple[str, int], dict] = {}

    def register(self, name: str, query) -> None:
        """Label a live query. ``query`` is a StreamingQuery or any
        object with ``recentProgress`` (list of progress dicts or
        objects exposing ``.progress`` JSON-compatible mappings)."""
        if name in self._queries and self._queries[name] is not query:
            raise ValueError(f"stream name already registered: {name!r}")
        self._queries[name] = query

    def collect(self) -> int:
        """Drain every registered query's progress ring into the
        accumulated row map; returns the number of NEW (stream,
        batch_id) rows observed. Idempotent per batch."""
        new = 0
        for name, q in self._queries.items():
            for p in _progress_dicts(q):
                key = (name, int(p["batchId"]))
                if key not in self._rows:
                    self._rows[key] = parse_progress(name, p)
                    new += 1
        return new

    def snapshot(self) -> DataFrame:
        """The accumulated per-batch rows as a DataFrame (stable schema
        even when empty)."""
        rows = [self._rows[k] for k in sorted(self._rows)]
        return self.spark.createDataFrame(rows, PROGRESS_SCHEMA)

    def report(self) -> DataFrame:
        return report(self.snapshot())


def _progress_dicts(q) -> list[dict]:
    out = []
    for p in getattr(q, "recentProgress", None) or []:
        if isinstance(p, dict):
            out.append(p)
        else:  # py4j StreamingQueryProgress: go through its JSON form
            import json

            out.append(json.loads(p.json))
    return out


def report(progress: DataFrame) -> DataFrame:
    """Per-stream gauge roll-up of PROGRESS_SCHEMA rows — the summary
    the reference's rule file produces per connector/task. All exact
    arithmetic over the recorded longs (counts, sums, BIGINT division
    to double), so the roll-up is engine-portable and the driver entry
    can replay it in SQL:

    - ``batches`` / ``rows``: COUNT(*) and SUM(num_input_rows);
    - ``rows_per_sec``: rows / (SUM(trigger_ms)/1000) — throughput over
      BUSY time, the honest rate when triggers are sparse (wall-clock
      rate would dilute by idle time; NULL when no trigger time);
    - ``max_trigger_ms`` / ``last_batch_id`` / ``last_state_rows``:
      worst batch, frontier, and the latest batch's state size.
    """
    last = F.expr("max_by(state_rows, batch_id)").alias("last_state_rows")
    return (
        progress.groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("batches"),
            F.coalesce(F.sum("num_input_rows"), F.lit(0)).alias("rows"),
            F.when(
                F.coalesce(F.sum("trigger_ms"), F.lit(0)) > 0,
                F.round(
                    F.sum("num_input_rows").cast("double")
                    / (F.sum("trigger_ms").cast("double") / F.lit(1000.0)),
                    6,
                ),
            ).alias("rows_per_sec"),
            F.max("trigger_ms").alias("max_trigger_ms"),
            F.max("batch_id").alias("last_batch_id"),
            last,
        )
        .orderBy("stream")
    )


def prometheus_lines(report_df: DataFrame, prefix: str = "cdc_stream") -> list[str]:
    """Render a ``report()`` frame in the Prometheus text exposition
    format — the last mile of the metrics.yaml parity (the reference's
    rule file exists to feed per-connector/task gauges to a Prometheus
    scrape; here the gauges are already computed, this just labels and
    prints them). One gauge per report column, labeled by stream:

        cdc_stream_rows{stream="orders"} 1234

    Driver-side and bounded: |streams| × |gauges| lines (the report is
    a per-stream rollup, never per-batch). NULL gauges (e.g. rows/sec
    with no trigger time) are omitted — absent beats NaN in PromQL."""
    gauges = [c for c in report_df.columns if c != "stream"]
    lines: list[str] = []
    for g in gauges:
        lines.append(f"# TYPE {prefix}_{g} gauge")
    for row in report_df.collect():
        label = (
            str(row["stream"])
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            # exposition-spec label escaping includes newline
            .replace("\n", "\\n")
        )
        for g in gauges:
            v = row[g]
            if v is None:
                continue
            lines.append(f'{prefix}_{g}{{stream="{label}"}} {v}')
    return lines
