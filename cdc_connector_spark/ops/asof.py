"""As-of (temporal) join — a custom operator the reference lacks but a
time-series/CDC analytics engine needs (reference's nearest analogue is the
freshness comparison of max timestamps, tests/validation.py:640-709).

``asof_join(left, right, on, by)`` matches each left row with the latest
right row whose ``on`` timestamp is <= the left's (``backward``; ``forward``
is the mirror). Semantics match pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
(backward inclusive).

Spark-first design — the union-window formulation, NOT a range join:
tag both sides, union them, and run ``last(payload, ignorenulls=True)`` over
a window partitioned by key and ordered by (ts, side). One shuffle on the
key, no join explosion, no per-row range probe; at 100 TB this is a single
exchange + sort, and skew in ``by`` is handled by AQE like any window. A
broadcast-range join would instead explode candidates quadratically in hot
keys.

Ties: right rows sort BEFORE left rows at equal ts (inclusive match); among
equal-ts right rows the one with the greatest ``seq_col`` (when given) wins,
else the physically-last one in the sort — pass ``seq_col`` for full
determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    seq_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Left as-of join. Every left row survives; right payload columns come
    back NULL when no right row qualifies (or the match exceeds
    ``tolerance_seconds``).

    Parameters
    ----------
    on : timestamp/numeric ordering column, present in both frames.
    by : equality key(s) — the shuffle partitioning key.
    direction : 'backward' (latest right.ts <= left.ts, inclusive) or
        'forward' (earliest right.ts >= left.ts, inclusive).
    tolerance_seconds : max |left.ts - right.ts| for a timestamp ``on``
        column (interpreted as plain numeric distance when ``on`` is
        numeric).
    seq_col : optional right-side column breaking ties among equal-ts right
        rows (greatest wins).
    n_buckets : range-bucket count for the GLOBAL (by=None) path only —
        each bucket is one window task, so size it to rows_in_union /
        target_rows_per_task. The default 64 measured healthy through
        10M events (r15 100× rehearsal: 10.7 s, growth 1.24× per 10×);
        raise it past ~100M-row unions.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])

    payload = [c for c in right.columns if c not in by_cols and c != on]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_on = on + suffix  # right-side ts surfaced for tolerance/debug

    # the right row travels as ONE struct (NULL on left rows), so
    # last(ignorenulls) picks the matched right row ATOMICALLY — filling
    # payload columns independently would stitch together values from
    # different right rows whenever the matched row holds NULLs
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
        + [T.StructField("__asof_on", right.schema[on].dataType)]
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        (F.lit(None).cast(right.schema[seq_col].dataType) if seq_col else F.lit(0)).alias("__asof_seq"),
    )
    rhs = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by_cols and c != on],
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c) for c in payload], F.col(on).alias("__asof_on")
        ).alias("__r"),
        (F.col(seq_col) if seq_col else F.lit(0)).alias("__asof_seq"),
    )
    u = lhs.unionByName(rhs)

    asc = direction == "backward"
    order = [
        F.col(on).asc() if asc else F.col(on).desc(),
        F.col("__side").asc(),  # right rows visible to equal-ts left rows
        F.col("__asof_seq").asc(),  # greatest seq wins in BOTH directions
    ]

    if by_cols:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.select(
            *[F.col(c) for c in u.columns],
            F.last("__r", ignorenulls=True).over(w).alias("__f"),
        ).filter(F.col("__side") == 1)
    else:
        # GLOBAL as-of (no key): a bare no-partition window would move
        # the entire union through ONE task (the merge_islands lesson,
        # r13 — WindowExec warns and single-threads). Instead:
        # range-bucket the direction-normalized order value (one
        # approxQuantile pass — eager, bounded driver data), run the
        # SAME window within each bucket, then fix up bucket boundaries
        # with a per-bucket carry: the tiny (n_buckets-row) summary
        # frame computes, for every bucket, the last right row of all
        # PRIOR buckets; rows whose in-bucket fill is NULL coalesce to
        # that carry. Equality with the one-task plan is pinned in
        # tests/test_asof.py.
        # ordering value for range-bucketing: must order IDENTICALLY to the
        # window's native sort on `on`. Timestamps and dates go through
        # unix_micros (DateType cannot CAST to double directly — r14
        # advisor); numerics cast straight. Anything else (string, binary,
        # ...) has no double embedding consistent with its native sort, so
        # refuse loudly rather than mis-bucket silently.
        on_type = right.schema[on].dataType
        if isinstance(on_type, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            ord_raw = F.unix_micros(F.col(on).cast("timestamp")).cast("double")
        elif isinstance(on_type, T.NumericType):
            ord_raw = F.col(on).cast("double")
        else:
            raise TypeError(
                f"global (by=None) as-of join requires a timestamp, date, or "
                f"numeric `on` column for range bucketing; got {on_type.simpleString()!r}. "
                f"Provide a `by` key, or pre-map the column to a numeric order value."
            )
        ord_expr = ord_raw if asc else -ord_raw
        u = u.withColumn("__ord", ord_expr)
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bnds = sorted(set(u.select(F.col("__ord").alias("v")).approxQuantile("v", probs, 0.001)))
        bucket = F.lit(0)
        for b in bnds:
            bucket = bucket + F.when(F.lit(float(b)) < F.col("__ord"), 1).otherwise(0)
        # NULL `on` rows: the keyed window sorts NULLs FIRST under asc
        # (backward) and LAST under desc (forward) — route them to the
        # matching edge bucket so the bucketed formulation agrees (r14
        # advisor: otherwise(0) silently pinned them to bucket 0 in both
        # directions, wrong for forward)
        null_bucket = F.lit(0) if asc else F.lit(len(bnds))
        u = u.withColumn(
            "__b",
            F.when(F.col("__ord").isNull(), null_bucket).otherwise(bucket).cast("int"),
        )
        wb = (
            Window.partitionBy("__b")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # per-bucket last RIGHT row: max over the same (ord, seq) order
        # among side-0 rows (ord is direction-normalized, so max == the
        # window-order-last in both directions)
        per_bucket = (
            u.filter(F.col("__side") == 0)
            .groupBy("__b")
            .agg(F.max_by("__r", F.struct("__ord", "__asof_seq")).alias("__last"))
        )
        spark = left.sparkSession
        all_buckets = spark.range(len(bnds) + 1).select(F.col("id").cast("int").alias("__b"))
        # the no-partition window here is SAFE: the frame is <= 64 rows
        carry = (
            all_buckets.join(per_bucket, "__b", "left")
            .withColumn(
                "__carry",
                F.last("__last", ignorenulls=True).over(
                    Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
                ),
            )
            .select("__b", "__carry")
        )
        filled = (
            u.select(
                *[F.col(c) for c in u.columns],
                F.last("__r", ignorenulls=True).over(wb).alias("__if"),
            )
            .filter(F.col("__side") == 1)
            .join(F.broadcast(carry), "__b")
            .withColumn("__f", F.coalesce("__if", "__carry"))
        )

    if tolerance_seconds is not None:
        if isinstance(
            right.schema[on].dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            # microsecond distance (r12 review): unix_timestamp truncates
            # to whole seconds, so a 0.9s gap measured 0 or 1 depending on
            # the boundary — sub-second tolerances misclassified. DateType
            # rides the same path (r15: CAST(date AS double) in the else
            # arm is illegal — the same class the advisor found in the
            # global bucketing).
            dist = (
                F.abs(
                    F.unix_micros(F.col(on).cast("timestamp"))
                    - F.unix_micros(F.col("__f.__asof_on").cast("timestamp"))
                ).cast("double")
                / F.lit(1_000_000.0)
            )
        else:
            dist = F.abs(F.col(on).cast("double") - F.col("__f.__asof_on").cast("double"))
        ok = dist <= F.lit(float(tolerance_seconds))
    else:
        ok = F.lit(True)

    return filled.select(
        *[F.col(c) for c in left.columns],
        *[F.when(ok, F.col(f"__f.{c}")).alias(out_names[c]) for c in payload],
        F.when(ok, F.col("__f.__asof_on")).alias(matched_on),
    )
