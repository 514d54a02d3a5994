"""Time-series subsequence similarity search (UCR-style sliding-window
matching, the distributed shape of EDBT'19 "Time Series Similarity Search
for Streaming Data in Distributed Systems").

Given a small query pattern, find the top-k closest length-m windows
across every key's ordered value series under squared Euclidean distance.
The building block behind motif discovery, anomaly matching ("find me
windows that look like this outage"), and template detection on metrics.

Spark-first shape:
- each key's series assembles ONCE via ``sort_array(collect_list(struct))``
  — one map-side-combined aggregation keyed by the series key, no global
  sort (ordering happens inside each key's array, the sessionize lesson);
- all length-m windows come from the shifted-slice ``zip_with`` chain
  (linear per row, the word_ngrams discipline — never transform+slice);
- the per-window distance is a FIXED-ORDER left fold (query position 0,
  1, ...), so the IEEE doubles are engine-portable and the whole operator
  is value-verifiable in SQL, the same contract as the classifier's
  scoring fold;
- the global top-k is a ``TakeOrderedAndProject`` (count desc never
  materializes a full sort).

Scale posture: work is proportional to Σ(len(series)·m) — the matmul-free
brute force, embarrassingly parallel across keys; one shuffle (the
per-key assembly). Series length per key is bounded by the window the
caller feeds in (compose upstream filters/watermarks for unbounded
streams); m is query-sized. For very long single series, split the key by
time-bucket with an m−1 overlap and union — same algebra, no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _daily_counts(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    day: str = "iso",
    checkpoint: bool = False,
) -> DataFrame:
    """The (type, day) collapse every daily-series operator in this
    module starts from — ONE definition (r12 review: the block was
    copy-pasted nine times, and the copies had silently diverged on the
    eager-checkpoint discipline). Returns (event_type, day, n) with
    ``day`` an ISO string (``day="iso"``) or a unix day number
    (``day="unix"``).

    ``checkpoint=True`` eagerly localCheckpoints the collapsed frame —
    REQUIRED whenever the caller references it more than once: the
    collapse is the only corpus-sized scan in these operators, and each
    lazy reference re-derives it (a 2-consumer op reads a 100 TB events
    table twice; the materialized frame is types×days rows). Single-
    consumer callers pass False and stay fully lazy (the
    triangle_count/pagerank discipline; never .persist(), which leaks
    into unrelated plans)."""
    d = (
        F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd")
        if day == "iso"
        else F.unix_date(F.to_date(F.col(ts_col)))
    )
    out = (
        df.select(F.col(type_col).alias("event_type"), d.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.localCheckpoint(eager=True) if checkpoint else out


def subsequence_search(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    key_col: str = "user_id",
) -> DataFrame:
    """Top-k (key, start_pos, dist) windows closest to ``query`` under
    squared Euclidean distance; ``start_pos`` is the 0-based offset into
    the key's series ordered by ``order_cols`` (include a tiebreaker
    column — a bare timestamp with duplicates would make the series
    order, and therefore the distances, nondeterministic). NULL values
    are dropped before assembly (a NULL inside a window would poison the
    fold). Ties on distance break by (key, start_pos) ascending."""
    m = len(query)
    if m < 1:
        raise ValueError("query pattern must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ordered = F.array_sort(
        F.collect_list(
            F.struct(*[F.col(c) for c in order_cols], F.col(value_col).alias("v"))
        )
    )
    series = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(F.transform(ordered, lambda s: s["v"]).alias("s"))
    )
    # every length-m window as an array of m aligned slices; the fold adds
    # (window[i] - query[i])^2 in FIXED index order -> portable doubles
    sc = F.col("s")
    n_win = F.size(sc) - (m - 1)
    dist = None
    for i in range(m):
        term = F.transform(
            F.slice(sc, 1 + i, F.greatest(n_win, F.lit(0))),
            lambda x: (x - F.lit(float(query[i]))) * (x - F.lit(float(query[i]))),
        )
        dist = term if dist is None else F.zip_with(dist, term, lambda a, b: a + b)
    windows = series.filter(F.size(sc) >= m).select(
        F.col(key_col), F.posexplode(dist).alias("start_pos", "dist")
    )
    return (
        windows.select(
            key_col,
            F.col("start_pos").cast("int").alias("start_pos"),
            F.round("dist", 6).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col(key_col).asc(), F.col("start_pos").asc())
        .limit(k)
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each prefix of ``steps``, how many
    users performed the steps IN ORDER (strictly increasing timestamps —
    the step-k event must come after the user's earliest valid step-k−1
    completion). Returns one row per step: (step 1-based, event_type,
    users, conversion_pct vs step 1, rounded 6).

    Semantics: earliest-completion chaining (the standard funnel rule) —
    t₁ = the user's first step-1 event; tₖ = the first step-k event
    strictly after tₖ₋₁. Greedy-earliest is optimal here: any valid
    ordered assignment implies the greedy one exists.

    Shape: one filtered aggregation per step chained by co-partitioned
    user-key joins (each reuses the same hash partitioning — k small by
    construction, AQE collapses the tiny right sides to broadcasts), one
    final COUNT per step unioned into the report. No windows over raw
    events, no per-user arrays — a 100 TB event table streams through k
    filtered scans."""
    if not steps:
        raise ValueError("steps must be non-empty")
    reached = None  # per-user latest-step completion time
    counts = []
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == F.lit(step)).select(
            F.col(user_col), F.col(ts_col).alias("__t")
        )
        if reached is None:
            cur = ev.groupBy(user_col).agg(F.min("__t").alias("__reached"))
        else:
            cur = (
                ev.join(reached, user_col)
                .filter(F.col("__t") > F.col("__reached"))
                .groupBy(user_col)
                .agg(F.min("__t").alias("__reached"))
            )
        reached = cur
        counts.append(
            cur.groupBy().count().select(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                F.col("count").alias("users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # conversion vs step 1: exact-integer ratio (engine-portable). Zero
    # guard: an empty funnel (no step-1 events at all) reports 0.0, not
    # NULL/DIVIDE_BY_ZERO (Spark 4 sessions default to ANSI mode)
    w = Window.orderBy(F.col("step").asc()).rowsBetween(Window.unboundedPreceding, 0)
    first_users = F.first("users").over(w)
    return out.select(
        "step",
        "event_type",
        "users",
        F.when(first_users > 0, F.round(F.col("users") / first_users, 6))
        .otherwise(F.lit(0.0))
        .alias("conversion_pct"),
    )


def funnel_windowed(
    df: DataFrame,
    steps: list[str],
    within: float | None = None,
    max_gap: float | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel with CONVERSION WINDOWS — the real-analytics form of
    ``funnel``: a user completes step k only via an ordered chain whose
    step-k event falls (a) within ``within`` seconds of the chain's OWN
    step-1 event (entry-anchored window, the Amplitude/ClickHouse
    ``windowFunnel`` rule) and/or (b) within ``max_gap`` seconds of the
    chain's step-k−1 event. Both bounds are inclusive; timestamps compare
    strictly increasing at microsecond resolution.

    EXACT exists-chain semantics, not greedy: a user counts for step k iff
    ANY valid chain exists (greedy-earliest under-counts once windows
    bound the chain — the user whose second entry converts). Correctness
    rests on an anchor-dominance argument: extending a chain from a
    predecessor event depends only on the predecessor's time (bounded by
    the range frame) and its chain's step-1 anchor (bigger anchor = laxer
    ``within`` bound), so carrying the frame-restricted RUNNING MAX of
    predecessor anchors per event decides reachability exactly.

    Shape: per step, union the previous reachable set (markers carrying
    anchors) with the step's events and take one per-user range-framed
    ``max`` window ordered by event time — k−1 user-keyed shuffles over
    step-typed events only (the corpus collapses to the funnel's event
    types before any window). With both bounds None this equals
    ``funnel`` (kept separate: the unbounded form needs no windows).

    Returns (step, event_type, users, conversion_pct) like ``funnel``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if within is not None and within <= 0:
        raise ValueError(f"within must be positive seconds, got {within}")
    if max_gap is not None and max_gap <= 0:
        raise ValueError(f"max_gap must be positive seconds, got {max_gap}")
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.col(type_col).alias("__type"),
        # cast covers TIMESTAMP_NTZ sources (session tz is UTC by default)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
    )
    lo = -int(max_gap * 1_000_000) if max_gap is not None else Window.unboundedPreceding
    counts = []
    reached = None  # (user, __t, __anchor) — every reachable step-(k-1) event
    for i, step in enumerate(steps):
        cur = ev.filter(F.col("__type") == F.lit(step)).select(
            user_col, "__t", F.lit(None).cast("long").alias("__anchor"), F.lit(0).alias("__m")
        )
        if reached is None:
            cur = cur.select(user_col, "__t", F.col("__t").alias("__anchor"))
        else:
            u = reached.select(
                user_col, "__t", "__anchor", F.lit(1).alias("__m")
            ).unionByName(cur)
            # strict predecessor: the frame ends at -1 microsecond, so a
            # marker at the exact same timestamp never chains to the event
            w = Window.partitionBy(user_col).orderBy("__t").rangeBetween(lo, -1)
            best = F.max(F.when(F.col("__m") == 1, F.col("__anchor"))).over(w)
            cond = F.col("__best").isNotNull()
            if within is not None:
                cond = cond & (
                    F.col("__best") >= F.col("__t") - int(within * 1_000_000)
                )
            cur = (
                u.withColumn("__best", best)
                .filter((F.col("__m") == 0) & cond)
                .select(user_col, "__t", F.col("__best").alias("__anchor"))
            )
        reached = cur
        counts.append(
            reached.agg(F.count_distinct(F.col(user_col)).alias("users")).select(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                "users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w1 = Window.orderBy(F.col("step").asc()).rowsBetween(Window.unboundedPreceding, 0)
    first_users = F.first("users").over(w1)
    return out.select(
        "step",
        "event_type",
        "users",
        F.when(first_users > 0, F.round(F.col("users") / first_users, 6))
        .otherwise(F.lit(0.0))
        .alias("conversion_pct"),
    )


def cohort_retention(
    df: DataFrame,
    bucket: str = "week",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the time bucket of their
    FIRST event (the cohort), counted at every later bucket they were
    active in. Returns (cohort, offset, users, retention_pct) — offset 0
    is the cohort size itself, retention_pct is users/size rounded 6
    (exact-integer ratio). ``bucket`` is ``"week"`` / ``"day"`` /
    ``"month"`` (trunc units).

    Shape: per-user first-event via one map-side-combined agg; activity
    de-dupes to distinct (user, bucket) pairs BEFORE the cohort join
    (events collapse early — the cardinality entering the join is
    user-buckets, not raw events); the matrix is one aggregation over
    that join plus a cohort-size window. Two key shuffles, both on
    hashed user/cohort longs."""
    if bucket not in ("day", "week", "month"):
        raise ValueError(f"bucket must be day/week/month, got {bucket!r}")
    b = lambda c: F.date_trunc(bucket, c)  # noqa: E731
    first = df.groupBy(user_col).agg(b(F.min(ts_col)).alias("__cohort"))
    active = df.select(F.col(user_col), b(F.col(ts_col)).alias("__b")).distinct()
    days = {"day": 1, "week": 7}.get(bucket)
    joined = active.join(first, user_col)
    if days is not None:
        # calendar-wise (datediff of the truncated DATES), never epoch
        # arithmetic: in a DST session timezone a one-week gap spanning
        # spring-forward is 601200s, which /604800 would truncate to
        # offset 0 — double-counting the cohort. datediff between two
        # date_trunc boundaries is an exact multiple of ``days``.
        offset = (
            F.datediff(F.to_date("__b"), F.to_date("__cohort")) / days
        ).cast("long")
    else:  # calendar months are variable-length
        offset = (
            (F.year("__b") - F.year("__cohort")) * 12
            + (F.month("__b") - F.month("__cohort"))
        ).cast("long")
    out = (
        joined.select(F.col("__cohort").alias("cohort"), offset.alias("offset"), user_col)
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )
    w = Window.partitionBy("cohort")
    size = F.max(F.when(F.col("offset") == 0, F.col("users"))).over(w)
    return out.select(
        # ISO string, not DateType: engines and dataframe bridges render
        # dates differently; the matrix key should hash identically anywhere
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        "offset",
        "users",
        F.round(F.col("users") / size, 6).alias("retention_pct"),
    )


def rolling_daily_counts(
    df: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type daily event counts with a trailing ``window_days``-day
    rolling sum — the ops-dashboard primitive (7-day actives, weekly
    volume trend). Returns (event_type, day ISO string, n, rolling) with
    ``rolling`` summing the days in [day − window_days + 1, day]; days
    with zero events contribute nothing (standard sparse convention —
    densify upstream if gap days must appear as rows).

    Shape: events collapse to (type, day) counts FIRST (one map-side-
    combined shuffle keyed by type+day — the cardinality entering the
    window is types×days, not raw events), then one per-type range-framed
    window over day numbers. Exact integers end to end."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    daily = _daily_counts(df, ts_col, type_col, day="unix").withColumnRenamed(
        "day", "__d"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("__d")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "event_type",
        F.date_format(F.date_from_unix_date(F.col("__d").cast("int")), "yyyy-MM-dd").alias("day"),
        "n",
        F.sum("n").over(w).alias("rolling"),
    )


def daily_anomalies(
    df: DataFrame,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Volume-anomaly days: per event type, z-score each day's count
    against the type's own daily distribution and report days with
    |z| >= ``z_threshold`` — the monitoring-plane drilldown behind "why
    did clicks spike on the 14th". Returns (event_type, day, n, z).

    Value-portable by construction: daily counts are exact integers, so
    mean and sample variance come from exact integer sums (Σn, Σn², d)
    with ONE fixed double expression per statistic —
    var = (Σn² − Σn·Σn/d)/(d−1), z = (n − Σn/d)/sqrt(var), rounded 6 —
    no float accumulation ordering to diverge between engines. Types
    with fewer than 2 days or zero variance report no rows (a constant
    series has no anomalies).

    Shape: the same collapsed (type, day) table feeds one per-type
    aggregate (types-sized) broadcast back onto it — two tiny shuffles
    after the daily collapse, which is checkpointed (two consumers)."""
    daily = _daily_counts(df, ts_col, type_col, checkpoint=True)
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__d"),
        F.sum("n").alias("__s"),
        F.sum(F.col("n") * F.col("n")).alias("__ss"),
    )
    var = (
        F.col("__ss").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__d").cast("double")
    ) / (F.col("__d") - 1).cast("double")
    z = F.round(
        (F.col("n").cast("double") - F.col("__s").cast("double") / F.col("__d").cast("double"))
        / F.sqrt(var),
        6,
    )
    return (
        daily.join(F.broadcast(stats.filter(F.col("__d") > 1)), "event_type")
        .withColumn("__var", var)
        .filter(F.col("__var") > 0)
        .select("event_type", "day", "n", z.alias("z"))
        .filter(F.abs(F.col("z")) >= z_threshold)
    )


def cusum_changepoints(
    df: DataFrame,
    k: int = 1,
    h: int = 5,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sequential drift detection on daily counts: a two-sided CUSUM
    (Page 1954) per event type — the monitoring complement to
    ``daily_anomalies``: z-scores flag single outlier DAYS, CUSUM flags
    sustained SHIFTS (a 20% volume drift no single day makes anomalous).

    Integer-exact by construction: the reference level is the floored
    mean daily count (Σn div d), the allowance ``k`` and threshold ``h``
    are integers, and the recursion S⁺_t = max(0, S⁺_{t-1} + n_t − ref − k)
    is computed CLOSED-FORM via the identity S_t = C_t − min(0, min_{j≤t} C_j)
    with C the running sum — so the whole operator is two window
    functions over exact integers (no float accumulation, no fold), and
    any SQL engine replays it bit-for-bit. Downward shifts use the
    mirrored recursion. Returns alarm days only:
    (event_type, day, n, s_pos, s_neg) where s_pos > h or s_neg > h.

    Shape: the (type, day) collapse, one types-sized stats broadcast,
    one per-type ordered window — same cost family as the other daily
    ops. Days absent from the data contribute nothing (densify upstream
    if zero-days must push the downward CUSUM)."""
    daily = _daily_counts(df, ts_col, type_col, checkpoint=True)
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__d"), F.sum("n").alias("__s")
    )
    # floored mean via double division: s/d then floor — both exact IEEE
    # ops any engine reproduces (s, d are exact integers well under 2^53)
    ref = F.floor(F.col("__s").cast("double") / F.col("__d").cast("double")).cast("long")
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    x = F.col("n") - F.col("__ref") - F.lit(k)
    y = F.col("__ref") - F.col("n") - F.lit(k)
    joined = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("__ref", ref)
        .withColumn("__c", F.sum(x).over(w))
        .withColumn("__cd", F.sum(y).over(w))
    )
    s_pos = F.col("__c") - F.least(F.lit(0), F.min("__c").over(w))
    s_neg = F.col("__cd") - F.least(F.lit(0), F.min("__cd").over(w))
    return (
        joined.select(
            "event_type",
            "day",
            "n",
            s_pos.alias("s_pos"),
            s_neg.alias("s_neg"),
        )
        .filter((F.col("s_pos") > h) | (F.col("s_neg") > h))
    )


def linear_attribution(
    df: DataFrame,
    window: float = 7 * 86400.0,
    value_event: str = "purchase",
    touch_event: str = "click",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Linear multi-touch attribution: every ``value_event`` (purchase)
    splits its value EQUALLY across the user's ``touch_event`` rows
    (clicks) in the preceding ``window`` seconds (touch at or before the
    purchase, inclusive) — the marketing-analytics complement to the
    as-of join's last-touch rule. Returns one row per credited touch:
    (touch id, n_conversions credited, credit) with credit rounded 6.

    Composed from existing operators: the (touch, purchase) pairing is
    ``ops.rangejoin.band_join`` — the inequality predicate planned as a
    pure equi-join on time bins, never a cross join. Per-purchase touch
    counts come from one window over the pair table; the per-touch sum
    accumulates round-6 DECIMALs (order-independent — the pagerank
    summation rule), so the whole operator is value-portable.

    Purchases with NULL value or with zero in-window touches credit
    nothing (report unattributed conversions upstream via an anti-join
    when needed)."""
    from cdc_connector_spark.ops.rangejoin import band_join

    if window <= 0:
        raise ValueError(f"window must be positive seconds, got {window}")
    w_us = int(window * 1_000_000)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.col(id_col),
        ts_us.alias("__t"),
        F.col(type_col).alias("__type"),
        F.col(value_col),
    )
    touches = ev.filter(F.col("__type") == touch_event).select(
        "__u", F.col(id_col).alias("touch_id"), F.col("__t").alias("__ct")
    )
    buys = ev.filter(
        (F.col("__type") == value_event) & F.col(value_col).isNotNull()
    ).select(
        "__u",
        F.col(id_col).alias("__pid"),
        (F.col("__t") - w_us).alias("__lo"),
        F.col("__t").alias("__hi"),
        F.col(value_col).alias("__val"),
    )
    pairs = band_join(
        touches, buys, point_col="__ct", lo_col="__lo", hi_col="__hi",
        bin_width=float(w_us), extra_keys=["__u"],
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("__pid"))
    credited = pairs.withColumn(
        "__credit", F.round(F.col("__val") / n.cast("double"), 6)
    )
    return (
        credited.groupBy(F.col("touch_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(
                F.sum(F.col("__credit").cast("decimal(28,6)")).cast("double"), 6
            ).alias("credit"),
        )
    )


def trend_by_key(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key linear trend: ordinary-least-squares slope/intercept of
    daily event counts against the day number — "is this event type
    growing, and how fast" as one number per key (the monitoring
    complement to ``cusum_changepoints``: CUSUM flags THAT a sustained
    shift happened, the OLS slope quantifies the drift rate).

    Value-portable by construction: with x = unix day and y = the exact
    integer daily count, every sufficient statistic (k, Σx, Σy, Σxy, Σx²)
    is an exact BIGINT, so slope = (k·Σxy − Σx·Σy) / (k·Σx² − Σx·Σx) is
    ONE double division of two exact integers and
    intercept = (Σy − slope·Σx)/k one fixed double expression — both
    rounded 6, bit-identical in any IEEE engine. ``intercept`` is the
    fitted count at unix day 0 (the conventional OLS anchor; shift by
    x̄ downstream if a centered anchor reads better).

    Keys with < 2 distinct days or zero x-variance are dropped (no line
    to fit). Shape: the (type, day) collapse then ONE map-side-combined
    aggregate per type — nothing after the collapse exceeds types×days.
    Returns (event_type, days, slope, intercept), slope in
    events/day."""
    daily = _daily_counts(df, ts_col, type_col, day="unix").select(
        "event_type", F.col("day").alias("__x"), F.col("n").alias("__y")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    den = F.col("__k") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = (
        (F.col("__k") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
        / den.cast("double")
    )
    return (
        stats.filter(den > 0)
        .withColumn("__slope", slope)
        .select(
            "event_type",
            F.col("__k").alias("days"),
            F.round("__slope", 6).alias("slope"),
            F.round(
                (F.col("__sy").cast("double") - F.col("__slope") * F.col("__sx").cast("double"))
                / F.col("__k").cast("double"),
                6,
            ).alias("intercept"),
        )
    )


def transition_matrix(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type) — the behavioral
    model behind next-action prediction, "what usually follows a
    search", and detecting broken flows (a transition whose probability
    collapses release-over-release).

    Each user's events order by ``order_cols`` (include a unique
    tiebreaker — with bare duplicate timestamps the successor, and
    therefore the matrix, would be nondeterministic); consecutive pairs
    count into (cur, next) cells; a user's last event has no successor.
    Probabilities are exact-integer ratios n_cell / n_row (one double
    division, rounded 6 — portable).

    Shape: ONE user-keyed window (lead) over (user, type, order) — the
    sessionize cost family — then a cells-sized aggregation; nothing
    downstream exceeds |types|². Returns (cur_type, next_type, n, p)."""
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("cur_type"),
            *[F.col(c) for c in order_cols if c != type_col],
        )
        .withColumn("next_type", F.lead("cur_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    cells = pairs.groupBy("cur_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    row_w = Window.partitionBy("cur_type")
    return cells.select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_w), 6).alias("p"),
    )


def ewma_daily(
    df: DataFrame,
    window: int = 8,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Exponentially-weighted moving average of daily counts with
    α = 1/2 over a trailing ``window`` of OBSERVED days — the smoothing
    primitive between ``rolling_daily_counts`` (uniform weights) and
    ``daily_anomalies`` (no memory): recent days dominate, history decays
    geometrically.

    EXACT dyadic arithmetic, the operator's point: with α = 1/2 the
    truncated EWMA recursion (s seeded at the window's oldest value)
    closes to ewma_t = (Σⱼ₌₀^(w-2) n_{t-j}·2^(w-2-j) + n_{t-w+1}) / 2^(w-1)
    — an exact-integer numerator over a power-of-two constant, so every
    value is an exactly-representable double ANY IEEE engine reproduces
    bit-for-bit (the weights sum to exactly 1; no float accumulation, no
    rounding step needed). General-α EWMAs can't hash-match across
    engines; the dyadic one can — choose it when the smoothing constant
    is a tuning knob anyway.

    Lag positions are observation steps over the (type, day) collapse
    (the standard irregular-series convention; densify upstream if gap
    days must weigh in). Only rows with a FULL trailing window emit —
    the first window−1 days per type are warm-up. Shape: the daily
    collapse then one per-type ordered window with ``window − 1`` lags —
    all work types×days-sized. Returns (event_type, day, n, ewma)."""
    if not 2 <= window <= 30:
        raise ValueError(f"window must be in [2, 30] (2^(w-1) must stay exact), got {window}")
    daily = _daily_counts(df, ts_col, type_col)
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.col("n") * F.lit(2 ** (window - 2))
    for j in range(1, window - 1):
        num = num + F.lag("n", j).over(w) * F.lit(2 ** (window - 2 - j))
    num = num + F.lag("n", window - 1).over(w)  # seed term, weight 2^0
    return (
        daily.withColumn("__num", num)
        .filter(F.col("__num").isNotNull())
        .select(
            "event_type",
            "day",
            "n",
            (F.col("__num").cast("double") / F.lit(float(2 ** (window - 1)))).alias("ewma"),
        )
    )


def rolling_distinct_actives(
    df: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Trailing N-day DISTINCT active users per event type — the real
    "7-day actives" metric ``rolling_daily_counts`` cannot express
    (distinct counts don't sum across days; a user active daily is one
    active, not seven). Returns (event_type, day, actives) for each day
    the type has events.

    Spark-first shape — sliding distinct via REPLICATION, not a range
    self-join: activity collapses to DISTINCT (type, user, day) first
    (raw events never fan out), then each user-day replicates to the
    ≤ ``window_days`` emission days it can serve (one ``explode`` of an
    integer sequence — pure equi-plan, no inequality join for Catalyst
    to nested-loop), an inner join against the type's REAL event days
    drops phantom emission days, and one count_distinct per (type, day)
    finishes. Cost: window_days × |user-days| exploded rows through one
    keyed shuffle — the standard scale trick for windowed distincts; an
    HLL sketch (approx_count_distinct) is the documented swap when
    exactness can yield.

    Exact integers end to end (value-portable)."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    ud = (
        df.select(
            F.col(type_col).alias("event_type"),
            F.col(user_col).alias("__u"),
            F.unix_date(F.to_date(F.col(ts_col))).alias("__d"),
        )
        .distinct()
        # the emission explode AND the real-days census both consume
        # the distinct collapse — one corpus scan, not two
        .localCheckpoint(eager=True)
    )
    emit = ud.select(
        "event_type",
        "__u",
        F.explode(
            F.sequence(F.col("__d"), F.col("__d") + (window_days - 1))
        ).alias("__e"),
    )
    real_days = ud.select("event_type", F.col("__d").alias("__e")).distinct()
    return (
        emit.join(real_days, ["event_type", "__e"])
        .groupBy("event_type", "__e")
        .agg(F.count_distinct("__u").alias("actives"))
        .select(
            "event_type",
            F.date_format(
                F.date_from_unix_date(F.col("__e").cast("int")), "yyyy-MM-dd"
            ).alias("day"),
            "actives",
        )
    )


def robust_anomalies(
    df: DataFrame,
    z_threshold: float = 3.5,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Robust (median/MAD) anomaly days — the outlier-resistant
    complement to ``daily_anomalies``: mean/stddev z-scores are DRAGGED
    by the very outliers they hunt (one 100× day inflates σ and hides a
    10× day); the modified z-score 0.6745·(n − median)/MAD (Iglewicz &
    Hoaglin's 3.5 rule) is immune to up to 50% contamination.

    Portable: daily counts are exact integers; median/MAD are exact
    order statistics (both engines average the two middle values on even
    counts — no interpolation ambiguity on integer inputs), and the
    score is one fixed double expression rounded 6. Types with MAD = 0
    (over half the days identical) report no rows — by construction the
    detector needs spread.

    Shape: the (type, day) collapse (checkpointed — the median AND the
    deviation pass both consume it), a types-sized median aggregate, a
    second types-sized MAD aggregate over the deviations, one broadcast
    back. All post-collapse work is types×days-sized."""
    daily = _daily_counts(df, ts_col, type_col, checkpoint=True)
    med = daily.groupBy("event_type").agg(F.median("n").alias("__med"))
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "__dev", F.abs(F.col("n").cast("double") - F.col("__med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("__dev").alias("__mad"))
    rz = F.round(
        F.lit(0.6745)
        * (F.col("n").cast("double") - F.col("__med"))
        / F.col("__mad"),
        6,
    )
    return (
        dev.join(F.broadcast(mad.filter(F.col("__mad") > 0)), "event_type")
        .select("event_type", "day", "n", rz.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) >= z_threshold)
    )


def autocorrelation(
    df: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1..``max_lag`` — the seasonality screen (a weekly cycle shows as a
    peak at lag 7). Defined as the exact grouped Pearson of the
    (x_t, x_{t+lag}) pairs, paired CALENDAR-wise (t+lag means t + lag
    DAYS, never "lag rows down": a missing day must NOT silently shift
    the alignment — the DST/cohort lesson applied to lags), so only days
    where both endpoints exist contribute. Returns (lag, n, corr) rows;
    lags with zero variance on either side are dropped (no line to
    correlate — ``pearson_corr_exact`` semantics).

    Value-portable by construction: counts are exact integers, and the
    Pearson machinery is the DECIMAL(38,0) sufficient-statistics + one
    fixed IEEE expression path (validation/checks.py::pearson_corr_exact).
    Scale shape: the corpus collapses to one row per DAY first (map-side
    combined), so the lag join and Pearson run on a day-count-sized
    frame — O(days · max_lag), independent of event volume."""
    from cdc_connector_spark.validation.checks import pearson_corr_exact

    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    daily = (
        df.groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_day"))
        # both join sides consume the collapse — materialize the
        # days-sized frame once instead of scanning the corpus twice
        .localCheckpoint(eager=True)
    )
    lagged = daily.select(
        "day",
        F.col("n_day").alias("x"),
        F.explode(F.array(*[F.lit(i) for i in range(1, max_lag + 1)])).alias("lag"),
    )
    pairs = lagged.join(
        daily.select(F.col("day").alias("day_b"), F.col("n_day").alias("y")),
        F.expr("date_add(day, lag)") == F.col("day_b"),
    )
    return pearson_corr_exact(pairs, "x", "y", "lag").orderBy("lag")


def weekday_profile(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Weekly seasonality profile of the daily event-count series: per
    weekday (0=Monday..6=Sunday), the number of observed days, total
    events, mean events/day, and the seasonal ratio vs the overall daily
    mean — the screen that turns ``autocorrelation``'s "lag-7 is high"
    into WHICH days carry the cycle (and the denominator a
    day-of-week-aware anomaly threshold needs).

    Exact integer sufficient statistics (daily counts, day tallies);
    mean and ratio are each ONE fixed IEEE expression rounded 6, so the
    7-row output value-verifies. Corpus collapses to one row per day
    first — everything after is O(days)."""
    daily = (
        df.select(F.to_date(F.col(ts_col).cast("timestamp")).alias("__day"))
        .groupBy("__day")
        .agg(F.count(F.lit(1)).alias("__n"))
        # the global total AND the per-weekday rollup both consume the
        # collapse — one materialized days-sized frame, one corpus scan
        .localCheckpoint(eager=True)
    )
    tot = daily.agg(
        F.sum("__n").alias("__total_all"), F.count(F.lit(1)).alias("__days_all")
    )
    per = daily.groupBy(F.weekday("__day").alias("weekday")).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("__n").alias("total_events")
    )
    mean = F.col("total_events").cast("double") / F.col("n_days").cast("double")
    overall = F.col("__total_all").cast("double") / F.col("__days_all").cast("double")
    return per.join(F.broadcast(tot)).select(
        "weekday",
        "n_days",
        "total_events",
        F.round(mean, 6).alias("mean_per_day"),
        F.round(mean / overall, 6).alias("seasonal_ratio"),
    )


def interevent_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival-time distribution per event type: consecutive
    per-user gaps (microseconds) summarized as exact order statistics —
    the input a rate-limiter, SLA, or burst-alert threshold is actually
    set from (a mean hides the bimodal "instant retry vs daily visit"
    shape every real stream has).

    Deterministic: events order by (ts, event_id) per (type, user); with
    duplicate timestamps the gap multiset depends only on the sorted
    timestamp sequence, so tie order cannot change the answer. Exact
    integer micros; percentiles use the NEAREST-RANK definition (value at
    1-based rank ceil(p·n)) — an exact order statistic that stays a
    BIGINT, where linear interpolation's a + frac·(b−a) differs between
    engines in the last ulp at 1e11-microsecond magnitudes (measured:
    …571.5 vs …571.50006) and can never hash-match.

    Shape: one (type,user)-keyed lag window over events, one per-type
    sorted-array aggregation. The array buffers one type's gaps per
    group — at 100 TB swap for approx_percentile or bucket the gaps
    (documented trade; group count is |event types|, the skew hazard is
    a single hot type)."""
    ev = df.filter(F.col(user_col).isNotNull()).select(
        F.col(type_col).alias("__ty"),
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__eid"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
    )
    w = Window.partitionBy("__ty", "__u").orderBy(
        F.col("__t").asc(), F.col("__eid").asc()
    )
    gaps = ev.withColumn("__gap", F.col("__t") - F.lag("__t").over(w)).filter(
        F.col("__gap").isNotNull()
    )
    per = gaps.groupBy(F.col("__ty").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("__gap").alias("min_us"),
        F.sort_array(F.collect_list("__gap")).alias("__sorted"),
        F.max("__gap").alias("max_us"),
    )
    # nearest-rank: 1-based index ceil(p*n) via exact integer arithmetic
    def nr(num: int, den: int):
        idx = F.expr(f"CAST(({num} * n_gaps + {den} - 1) DIV {den} AS INT)")
        return F.element_at(F.col("__sorted"), idx)

    return per.select(
        "event_type",
        "n_gaps",
        "min_us",
        nr(1, 2).alias("p50_us"),
        nr(9, 10).alias("p90_us"),
        "max_us",
    )


def session_summary(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """One-row engagement report over gap-based sessions: session count,
    distinct users, bounce sessions (single-event — the metric a landing
    page is judged by), bounce rate, mean events/session, and the
    NEAREST-RANK median session length in seconds (exact BIGINT order
    statistic — the interevent_stats portability rule).

    Sessionization is the house lag+cumsum gaps-and-islands (same total
    order as sessionize_events incl. the event-id tiebreak); every
    output is an exact integer or ONE fixed IEEE expression rounded 6.
    Shape: one user-keyed window pass, one session collapse, one global
    single-row aggregate. The median buffers the session-length list in
    that one row — |sessions| longs; at 100 TB swap the nearest-rank
    lookup for approx_percentile or a two-pass count+offset (the
    interevent_stats documented trade; counts/rates need no change)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_seconds),
        1,
    ).otherwise(0)
    sess = (
        df.filter(F.col(user_col).isNotNull())
        .withColumn("__sid", F.sum(is_new).over(w))
        .groupBy(user_col, "__sid")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            (
                F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
            ).alias("__len_s"),
        )
    )
    per = sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct(F.col(user_col)).alias("n_users"),
        F.sum(F.when(F.col("__n") == 1, 1).otherwise(0)).alias("bounce_sessions"),
        F.sum("__n").alias("n_events"),
        F.sort_array(F.collect_list("__len_s")).alias("__lens"),
    )
    # empty-input guard: element_at index 0 is an ANSI error and 0/0 is
    # NaN — an empty stream reports zeros, stated, not a crash
    med_idx = F.expr("CAST(greatest((1 * n_sessions + 1) DIV 2, 1) AS INT)")
    nonempty = F.col("n_sessions") > 0
    return per.select(
        "n_sessions",
        "n_users",
        "bounce_sessions",
        F.when(
            nonempty,
            F.round(
                F.col("bounce_sessions").cast("double")
                / F.col("n_sessions").cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("bounce_rate"),
        F.when(
            nonempty,
            F.round(
                F.col("n_events").cast("double") / F.col("n_sessions").cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("mean_events"),
        F.when(nonempty, F.element_at(F.col("__lens"), med_idx))
        .otherwise(F.lit(None).cast("long"))
        .alias("p50_session_s"),
    )


def pettitt_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Pettitt's nonparametric change-point test (Pettitt 1979) on each
    type's daily-count series: the single most likely abrupt level shift,
    located where the Mann-Whitney-style statistic
    U_t = Σ_{i≤t} Σ_{j>t} sign(n_i − n_j) peaks in absolute value.
    The drift screen behind "did this feed's volume step-change, and
    when" — rank-based, so robust to outliers that drag a mean-based
    CUSUM (see cusum_changepoints for the sequential alternative).

    Value-portable because the statistic is EXACT INTEGER arithmetic:
    with doubled mid-ranks DR_i = 2·rank + ties − 1 (integers even when
    mid-ranks are .5), U_t = Σ_{i≤t} DR_i − t·(N+1) — verified
    identical to the brute sign double-sum on randomized series in
    tests. Argmax tie-break: earliest day. Returns one row per type
    with ≥ 2 days: (event_type, n_days, change_day, k_stat, u_signed,
    days_before, sum_before, days_after, sum_after) — before/after
    exact integer sums let the consumer judge the shift size without
    any float columns.

    Shape: after the daily collapse every window is per-type over its
    own ≤|days| rows — types parallelize, nothing global. At 100 TB the
    daily collapse is the only corpus-sized shuffle (checkpointed —
    the scored chain AND the before/after split both consume it);
    series stay calendar-bounded (years × 365 rows per type)."""
    daily = _daily_counts(df, ts_col, type_col, checkpoint=True)
    w_rank = Window.partitionBy("event_type").orderBy(F.col("n").asc())
    w_ties = Window.partitionBy("event_type", "n")
    w_day = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    w_type = Window.partitionBy("event_type")
    w_cum = w_day.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = daily.select(
        "event_type",
        "day",
        "n",
        (F.lit(2) * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - F.lit(1)).alias(
            "__dr"
        ),
        F.row_number().over(w_day).alias("__idx"),
        F.count(F.lit(1)).over(w_type).alias("__nd"),
    )
    u = scored.select(
        "event_type",
        "day",
        "__idx",
        "__nd",
        (F.sum("__dr").over(w_cum) - F.col("__idx") * (F.col("__nd") + 1)).alias("__u"),
    ).filter(F.col("__idx") < F.col("__nd"))
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("__u")).desc(), F.col("day").asc()
    )
    best = (
        u.withColumn("__pk", F.row_number().over(w_pick))
        .filter(F.col("__pk") == 1)
        .select(
            "event_type",
            F.col("__nd").alias("n_days"),
            F.col("day").alias("change_day"),
            F.abs(F.col("__u")).alias("k_stat"),
            F.col("__u").alias("u_signed"),
            F.col("__idx").alias("__t0"),
        )
    )
    split = daily.join(F.broadcast(best), "event_type").select(
        "event_type",
        "n_days",
        "change_day",
        "k_stat",
        "u_signed",
        (F.col("day") <= F.col("change_day")).alias("__pre"),
        "n",
    )
    return (
        split.groupBy("event_type", "n_days", "change_day", "k_stat", "u_signed")
        .agg(
            F.sum(F.col("__pre").cast("long")).alias("days_before"),
            F.sum(F.when(F.col("__pre"), F.col("n")).otherwise(0)).alias("sum_before"),
            F.sum((~F.col("__pre")).cast("long")).alias("days_after"),
            F.sum(F.when(~F.col("__pre"), F.col("n")).otherwise(0)).alias("sum_after"),
        )
        .orderBy("event_type")
    )


def seasonal_anomalies(
    df: DataFrame,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Seasonality-adjusted volume anomalies: z-score each day's count
    against the type's OWN WEEKDAY distribution (Mondays vs Mondays),
    so a weekly-cyclic feed doesn't flag every weekend as an anomaly
    the way the global-z screen (daily_anomalies) does — the pair is
    the classic monitoring ladder: global z for acyclic feeds, seasonal
    z once a weekly profile exists (weekday_profile measures whether it
    does).

    Same exact-integer portability contract as daily_anomalies: per
    (type, weekday) the stats are exact integer sums (d, Σn, Σn²), each
    statistic is ONE fixed IEEE double expression rounded 6, weekday is
    Spark weekday() == DuckDB isodow−1 (0 = Monday). Cells with < 2
    observed days or zero variance report no rows. Returns
    (event_type, day, weekday, n, z) with |z| >= z_threshold.

    Shape: daily collapse (checkpointed — the profile aggregate AND the
    score join both consume it), then a (type × 7)-row profile
    broadcast back — two tiny shuffles, same as the global screen."""
    daily = _daily_counts(df, ts_col, type_col, checkpoint=True).withColumn(
        "weekday", F.weekday(F.to_date(F.col("day"))).cast("int")
    )
    stats = daily.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).alias("__d"),
        F.sum("n").alias("__s"),
        F.sum(F.col("n") * F.col("n")).alias("__ss"),
    )
    var = (
        F.col("__ss").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__d").cast("double")
    ) / (F.col("__d") - 1).cast("double")
    z = F.round(
        (F.col("n").cast("double") - F.col("__s").cast("double") / F.col("__d").cast("double"))
        / F.sqrt(var),
        6,
    )
    return (
        daily.join(F.broadcast(stats.filter(F.col("__d") > 1)), ["event_type", "weekday"])
        .withColumn("__var", var)
        .filter(F.col("__var") > 0)
        .select("event_type", "day", "weekday", "n", z.alias("z"))
        .filter(F.abs(F.col("z")) >= z_threshold)
    )


def mann_kendall_trend(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Mann-Kendall monotone-trend test + Theil-Sen slope on each type's
    daily-count series — the standard nonparametric pair next to
    ``pettitt_changepoint`` (Pettitt locates ONE abrupt shift; MK asks
    "is the whole series drifting", Theil-Sen "how fast"): the volume
    health check a feed monitor runs per table/topic. Rank-based, so
    robust to the outlier days that drag OLS (``trend_events``).

    Value-portable by exact integer arithmetic:
    - S = Σ_{i<j} sign(n_j − n_i), an exact BIGINT via the per-type
      day-pair self-join (days are calendar-bounded, so the join is
      |days|² per type — tiny forever, and SQL-replayable verbatim).
    - var18 = N(N−1)(2N+5) − Σ_t t(t−1)(2t+5) over tie groups — the
      EXACT integer 18·Var(S); the z statistic
      (S∓1)/sqrt(var18/18) is ONE fixed IEEE expression over exact
      integers, rounded 6 (the Pearson/OLS precedent).
    - Theil-Sen slope = the lower-median pairwise slope
      (n_j − n_i)/(j − i): each slope is one correctly-rounded IEEE
      division (identical in both engines), ordered with the exact
      integer tie-break (dy, dx) for a deterministic total order, and
      picked by nearest-rank (no interpolation — the integer order
      statistic discipline). Emitted rounded 6.

    Returns one row per type with ≥ 2 days: (event_type, n_days,
    s_stat, var18, z, theil_sen_slope). Shape: the daily collapse is
    the only corpus-sized shuffle; everything after runs on
    calendar-bounded per-type series."""
    # the daily collapse feeds FIVE consumers (pairs, tie census, day
    # count, slopes, the median pick) — checkpoint materializes the
    # tiny types×days frame ONCE instead of five corpus scans
    daily = _daily_counts(df, ts_col, type_col, checkpoint=True)
    w_day = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    idx = daily.select(
        "event_type", "n", F.row_number().over(w_day).alias("i")
    )
    l, r = idx.alias("l"), idx.alias("r")
    pairs = l.join(
        r,
        on=[
            F.col("l.event_type") == F.col("r.event_type"),
            F.col("l.i") < F.col("r.i"),
        ],
    ).select(
        F.col("l.event_type").alias("event_type"),
        (F.col("r.n") - F.col("l.n")).alias("dy"),
        (F.col("r.i") - F.col("l.i")).alias("dx"),
    )
    s_stat = pairs.groupBy("event_type").agg(
        F.sum(F.signum(F.col("dy").cast("double")).cast("long")).alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    # tie-corrected 18*Var(S), exact integers
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        daily.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_corr")
        )
    )
    var18 = nd.join(ties, "event_type", "left").select(
        "event_type",
        "n_days",
        (
            F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
            - F.coalesce(F.col("tie_corr"), F.lit(0))
        ).alias("var18"),
    )
    # Theil-Sen: nearest-rank lower median of pairwise slopes under the
    # deterministic total order (slope double, dy, dx)
    slopes = pairs.select(
        "event_type",
        (F.col("dy").cast("double") / F.col("dx").cast("double")).alias("slope"),
        "dy",
        "dx",
    )
    w_sl = Window.partitionBy("event_type").orderBy(
        F.col("slope").asc(), F.col("dy").asc(), F.col("dx").asc()
    )
    med = (
        slopes.withColumn("rk", F.row_number().over(w_sl))
        .join(F.broadcast(s_stat.select("event_type", "n_pairs")), "event_type")
        .filter(F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2))
        .select("event_type", F.round("slope", 6).alias("theil_sen_slope"))
    )
    # var18 == 0 only when every day has the same count (one tie group
    # swallows the whole N(N-1)(2N+5) term) — S is 0 there; define z = 0
    z = F.when(F.col("var18") == 0, F.lit(0.0)).otherwise(
        (
            F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double"))
            .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double"))
            .otherwise(F.lit(0.0))
        )
        / F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    )
    return (
        s_stat.join(var18, "event_type")
        .join(med, "event_type")
        .filter(F.col("n_days") >= 2)
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var18",
            F.round(z, 6).alias("z"),
            "theil_sen_slope",
        )
        .orderBy("event_type")
    )


def ks_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    quantize_to: float | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two samples
    of one numeric column: D = max_v |F_a(v) − F_b(v)| with the ECDFs
    evaluated at every pooled distinct value — the distribution-shape
    companion to the binned screens (``psi`` buckets coarsely,
    chi-square needs categories; KS is binless and catches location AND
    shape shifts). The drift gate a validation plane runs between
    yesterday's and today's feed, or source vs sink.

    Value-portable by exact rational arithmetic: at each pooled value
    the gap is |cum_a·n_b − cum_b·n_a| (an exact BIGINT numerator over
    the common denominator n_a·n_b), so the max and its argmax
    (earliest value on ties) are exact; d = num/(n_a·n_b) is ONE IEEE
    division rounded 6. Returns ONE row: (n_a, n_b, ks_at_value,
    gap_numerator, d_stat) — ZERO rows when both inputs are empty or
    all-NULL (no pooled values exist to evaluate the ECDFs at; guard
    before indexing the result).

    Shape: counts collapse per side first (the only corpus-sized
    shuffle, keyed on the value), then the cumulative window runs on
    |pooled distinct values| rows. The prefix sum is a GLOBAL ordered
    window — exact and fine up to millions of distinct values; on a
    near-unique column at 100 TB, pass ``quantize_to`` (grid width: a
    dollar for cent prices, an hour for timestamps-as-seconds): values
    snap to floor(v/q)·q BEFORE the distinct collapse, so the window
    runs on ≤ range/q rows however many raw values exist. The
    quantized ECDF at a grid point equals the true ECDF at that cell's
    upper boundary, hence D_q ≤ D_true ≤ D_q + max cell mass
    (mass_a/n_a + mass_b/n_b over any one cell) — the error bound is
    the grid's resolution, pinned in tests."""
    if quantize_to is not None and not quantize_to > 0:
        raise ValueError(f"quantize_to must be > 0, got {quantize_to}")

    def keyed(df: DataFrame):
        v = F.col(value_col)
        if quantize_to is not None:
            v = F.floor(v / F.lit(float(quantize_to))) * F.lit(float(quantize_to))
        return df.select(v.alias("v")).filter(F.col("v").isNotNull())

    ta = keyed(a).groupBy("v").agg(F.count(F.lit(1)).alias("ca"))
    tb = keyed(b).groupBy("v").agg(F.count(F.lit(1)).alias("cb"))
    pooled = (
        ta.join(tb, "v", "full")
        .select(
            "v",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
        # totals and the cumulative window both consume pooled — eager
        # localCheckpoint materializes the |distinct values| frame once
        # instead of re-deriving both corpus-side collapses twice
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy(F.col("v").asc()).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = pooled.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    cum = pooled.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    ).crossJoin(F.broadcast(totals))
    gap = cum.select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("num"),
    )
    w_pick = Window.orderBy(F.col("num").desc(), F.col("v").asc())
    return (
        gap.withColumn("__pk", F.row_number().over(w_pick))
        .filter(F.col("__pk") == 1)
        .select(
            "n_a",
            "n_b",
            F.col("v").alias("ks_at_value"),
            F.col("num").alias("gap_numerator"),
            F.round(
                F.col("num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("d_stat"),
        )
    )


def daily_percentiles(
    df: DataFrame,
    percentiles: tuple[int, ...] = (50, 90, 99),
    value_col: str = "value",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-(type, day) percentile bands of a numeric column — the
    P50/P90/P99 latency/size report every operations dashboard runs.
    NEAREST-RANK percentiles (the exact order statistic at rank
    ceil(p·n/100)), NOT linear interpolation: the picked value is an
    EXISTING input value, so the result is engine-portable with no
    float arithmetic at all (the interevent_stats lesson — interpolated
    percentiles differ between engines in the last ulp at large
    magnitudes and can never hash-match). NULL values drop first.

    Returns (event_type, day, n, p<P> for each requested percentile),
    one row per (type, day) with ≥ 1 value.

    Shape: ONE shuffle keyed (type, day) for the per-cell rank window;
    cells parallelize and each cell's window is its own day's rows.
    At 100 TB this is the natural partitioning — no global sort, no
    collect."""
    if not percentiles or any(p < 1 or p > 100 for p in percentiles):
        raise ValueError(f"percentiles must be in [1, 100], got {percentiles}")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(type_col).alias("event_type"),
        F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias("day"),
        F.col(value_col).alias("v"),
    )
    w = Window.partitionBy("event_type", "day").orderBy(F.col("v").asc())
    wn = Window.partitionBy("event_type", "day")
    ranked = base.select(
        "event_type",
        "day",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # exact integer rank: ceil(n*p/100) == (n*p + 99) div 100 — never a
    # double ceil (the repo integer-division discipline)
    picks = [
        F.max(
            F.when(
                F.col("rk") == F.expr(f"CAST((n * {p} + 99) div 100 AS BIGINT)"),
                F.col("v"),
            )
        ).alias(f"p{p}")
        for p in percentiles
    ]
    return (
        ranked.groupBy("event_type", "day")
        .agg(F.max("n").alias("n"), *picks)
        .orderBy("event_type", "day")
    )


def twap(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Time-Weighted Average (TWAP) of an irregularly-sampled value per
    (type, day) under last-observation-carried-forward: Σ vᵢ·(tᵢ₊₁−tᵢ)
    / (t_last − t_first) — the correct average for sensor readings,
    prices, or gauge metrics where a plain AVG over-weights bursts of
    samples (ten readings in one busy second must not outvote one
    reading that held for an hour).

    Value-portable by exact DECIMAL arithmetic: values integerize to
    ROUND(v·1e6) BIGINT micro-units, each segment's v_micro·Δt_us
    product accumulates in DECIMAL(38,0) (BIGINT×BIGINT overflows),
    and the final TWAP is ONE IEEE division rounded 6. Days with a
    single sample have zero observed duration and are EXCLUDED
    (documented — there is no time axis to weight over; the plain AVG
    answers those). Include a tiebreaker in ``order_cols``: duplicate
    timestamps would make segment attribution nondeterministic.

    Returns (event_type, day, n, duration_us, twap).

    Shape: one (type, day)-keyed shuffle for the lead() window, then a
    map-side-combinable DECIMAL sum — per-cell work, no global sort."""
    extra = [c for c in order_cols if c not in (ts_col, type_col, value_col)]
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(type_col).alias("event_type"),
        F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias("day"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.round(F.col(value_col) * 1_000_000).cast("long").alias("v_micro"),
        *[F.col(c) for c in extra],
    )
    w = Window.partitionBy("event_type", "day").orderBy(
        F.col("t").asc(), *[F.col(c).asc() for c in extra]
    )
    seg = base.select(
        "event_type",
        "day",
        "v_micro",
        (F.lead("t").over(w) - F.col("t")).alias("dt_us"),
    )
    agg = seg.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dt_us").alias("duration_us"),
        F.sum(
            F.col("v_micro").cast("decimal(38,0)") * F.col("dt_us").cast("decimal(38,0)")
        ).alias("__wsum"),
    )
    return (
        agg.filter(F.col("duration_us") > 0)
        .select(
            "event_type",
            "day",
            "n",
            F.col("duration_us").cast("long").alias("duration_us"),
            F.round(
                F.col("__wsum").cast("double")
                / (F.col("duration_us").cast("double") * F.lit(1_000_000.0)),
                6,
            ).alias("twap"),
        )
        .orderBy("event_type", "day")
    )


def retry_dedup(
    df: DataFrame,
    within_seconds: int = 5,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    order_cols: tuple[str, ...] = ("event_id",),
    report_col: str = "event_type",
) -> DataFrame:
    """Client-retry deduplication report: an event is a RETRY ECHO if
    the same key tuple fired within ``within_seconds`` before it —
    the at-least-once ingestion artifact every event pipeline carries
    (button double-taps, SDK retries, proxy replays). Returns the
    per-type report (event_type, total, dropped, kept) — exact BIGINT
    counts; pair with a filter on the same predicate to materialize
    the deduplicated stream.

    The gap compares exact microsecond BIGINTs via lag() over the key
    window; chained retries collapse to the first event of each burst
    — every event within the window of its PREDECESSOR drops, so a
    burst a·a·a keeps only the head (lag sees the previous RAW event,
    the standard throttle semantics, replayed verbatim by the oracle).

    Shape: one key-hash shuffle for the lag window, then one per-type
    collapse — no self-join (the naive interval self-join is O(burst²)
    per key; lag is linear)."""
    extra = [c for c in order_cols if c not in (ts_col, *key_cols)]
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        t.asc(), *[F.col(c).asc() for c in extra]
    )
    flagged = df.select(
        *[F.col(c) for c in key_cols],
        (t - F.lag(t).over(w) <= F.lit(within_seconds * 1_000_000)).alias("__echo"),
    )
    if report_col not in key_cols:
        raise ValueError(f"report_col {report_col!r} must be one of key_cols {key_cols}")
    return (
        flagged.groupBy(report_col)
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.coalesce(F.col("__echo"), F.lit(False)).cast("long")).alias("dropped"),
        )
        .select(
            report_col,
            "total",
            "dropped",
            (F.col("total") - F.col("dropped")).alias("kept"),
        )
        .orderBy(report_col)
    )


def count_streaks(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Longest strictly-increasing run of DAILY COUNTS per type — "how
    many consecutive days did volume grow", the growth-streak /
    monotone-burst report next to the trend tests (MK says "drifting
    overall"; this finds the sharpest sustained climb and when it
    started). Gaps-and-islands on the daily series: flag n > lag(n),
    group runs by the running count of non-increases, take the longest
    (earliest start on ties).

    Everything is exact integers over the calendar-bounded daily
    series; returns (event_type, n_days, streak_len, streak_start,
    streak_end) where streak_len counts the DAYS in the run including
    its anchor (a lone day is a streak of 1)."""
    daily = (
        df.select(
            F.col(type_col).alias("event_type"),
            F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
        # two consumers (runs + the day census) — one corpus scan
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = daily.select(
        "event_type",
        "day",
        F.sum(
            F.when(F.col("n") > F.lag("n").over(w), 0).otherwise(1)
        ).over(wc).alias("__grp"),
    )
    spans = runs.groupBy("event_type", "__grp").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.col("streak_len").desc(), F.col("streak_start").asc()
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        spans.withColumn("__pk", F.row_number().over(w_pick))
        .filter(F.col("__pk") == 1)
        .join(F.broadcast(nd), "event_type")
        .select("event_type", "n_days", "streak_len", "streak_start", "streak_end")
        .orderBy("event_type")
    )


def funnel_durations(
    df: DataFrame,
    steps: list[str],
    percentiles: tuple[int, ...] = (50, 90),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert between funnel steps: for every user who
    completed step k under the earliest-completion chaining rule (the
    ``funnel`` operator's semantics — t_k = first step-k event strictly
    after t_{k−1}), the transition duration t_k − t_{k−1}; reported per
    transition as user counts + NEAREST-RANK percentile durations in
    exact microsecond BIGINTs. The "users convert, but HOW FAST"
    report — the input to retargeting windows and funnel SLAs that the
    count-only funnel can't give.

    Exact integers end to end: chained MIN timestamps in micros, order
    statistics (rank (n·p+99) div 100) over the per-transition duration
    multiset — no float arithmetic anywhere.

    Returns one row per transition: (step transition 2-based,
    from_type, to_type, users, p<P>_us for each requested percentile).

    Shape: one filtered MIN aggregation per step chained by user-keyed
    joins (AQE collapses the shrinking right sides to broadcasts),
    then a per-transition rank window over converted users only."""
    if len(steps) < 2:
        raise ValueError("funnel_durations needs at least 2 steps")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    reached = None
    step_times = []  # list of DataFrames (user, __t_k)
    for step in steps:
        ev = df.filter(F.col(type_col) == F.lit(step)).select(
            F.col(user_col).alias("user"), t.alias("__t")
        )
        if reached is None:
            cur = ev.groupBy("user").agg(F.min("__t").alias("__reached"))
        else:
            cur = (
                ev.join(reached, "user")
                .filter(F.col("__t") > F.col("__reached"))
                .groupBy("user")
                .agg(F.min("__t").alias("__reached"))
            )
        reached = cur
        step_times.append(cur)
    out = None
    for k in range(1, len(steps)):
        prev = step_times[k - 1].select("user", F.col("__reached").alias("__t_prev"))
        curr = step_times[k].select("user", F.col("__reached").alias("__t_curr"))
        durs = prev.join(curr, "user").select(
            (F.col("__t_curr") - F.col("__t_prev")).alias("dur_us")
        )
        w = Window.orderBy(F.col("dur_us").asc())
        ranked = durs.select(
            "dur_us",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        picks = [
            F.max(
                F.when(
                    F.col("rk") == F.expr(f"CAST((n * {p} + 99) div 100 AS BIGINT)"),
                    F.col("dur_us"),
                )
            ).alias(f"p{p}_us")
            for p in percentiles
        ]
        row = ranked.groupBy().agg(F.max("n").alias("users"), *picks).select(
            F.lit(k + 1).alias("step"),
            F.lit(steps[k - 1]).alias("from_type"),
            F.lit(steps[k]).alias("to_type"),
            F.coalesce(F.col("users"), F.lit(0)).alias("users"),
            *[F.col(f"p{p}_us") for p in percentiles],
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("step")


def watermark_sizing(
    df: DataFrame,
    candidate_minutes: tuple[int, ...] = (1, 3, 5, 10),
    ts_col: str = "ts",
    ingest_ts_col: str = "ingest_ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Watermark sizing report: for each candidate watermark bound W,
    how many events would be LATE (ingest_ts − event_ts > W) and what
    share — the empirical input to Structured Streaming's
    ``withWatermark`` choice, turning "pick 10 minutes, probably fine"
    into "3 minutes loses 0.4%, 10 minutes loses 0.01%" measured on the
    feed's own lateness distribution. Pairs with the streaming plane:
    the chosen bound is exactly what its windowed aggregations pass to
    withWatermark.

    Exact integers: lateness compares microsecond BIGINTs; counts are
    BIGINTs; the share is ONE IEEE division rounded 6. Returns one row
    per (event_type, candidate W): (event_type, watermark_minutes,
    total, late, late_share).

    Shape: one scan computes lateness once; the candidate grid explodes
    |candidates| rows per type AFTER the per-type collapse — corpus
    work is a single aggregation regardless of grid size."""
    lateness = (
        F.unix_micros(F.col(ingest_ts_col).cast("timestamp"))
        - F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    per_type = df.select(
        F.col(type_col).alias("event_type"), lateness.alias("__late_us")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum(
                (F.col("__late_us") > F.lit(m * 60_000_000)).cast("long")
            ).alias(f"__late_{m}")
            for m in candidate_minutes
        ],
    # the per-candidate union below consumes this |types|-row frame once
    # per candidate — materialize it so the corpus really is scanned ONCE
    ).localCheckpoint(eager=True)
    rows = []
    for m in candidate_minutes:
        rows.append(
            per_type.select(
                "event_type",
                F.lit(m).alias("watermark_minutes"),
                "total",
                F.col(f"__late_{m}").alias("late"),
                F.round(
                    F.col(f"__late_{m}").cast("double") / F.col("total").cast("double"),
                    6,
                ).alias("late_share"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("event_type", "watermark_minutes")


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    buckets: int = 10,
    quantize_to: float | None = None,
) -> DataFrame:
    """Equi-DEPTH histogram: ``buckets`` ranges holding (near-)equal row
    counts, boundaries at the nearest-rank b/n quantiles — the
    complement of the equi-WIDTH histogram (fixed value ranges, wildly
    unequal counts on skewed data). These boundaries ARE
    ``repartitionByRange`` split points / range-scan partition bounds:
    this is how the snapshot planner's assumption of a splittable key
    gets VERIFIED and how a skewed column gets honest partition sizing
    at 100 TB.

    Exact by construction: each row's bucket is its rank's position in
    the integer grid (bucket = (rk−1)·B div n), boundaries are exact
    order statistics (existing input values), counts are exact BIGINTs
    — depths differ by at most 1 when values are distinct; heavy
    duplicate values make depths unequal HONESTLY (a value cannot
    straddle buckets; the skew surfaces in the counts instead of being
    hidden by interpolation).

    Returns (bucket 0-based, lo, hi, depth). One global rank window
    over the distinct-value count table — same bounded-window shape as
    the KS op; on a near-unique column at extreme scale pass
    ``quantize_to``: values snap to floor(v/q)·q before the distinct
    collapse, the window runs on ≤ range/q rows, boundaries land on
    grid points (each true boundary is within one grid cell of the
    reported one — split points for repartitionByRange only need to be
    approximately balanced, so grid-resolution error is the right
    trade), and depths stay exact row counts."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if quantize_to is not None and not quantize_to > 0:
        raise ValueError(f"quantize_to must be > 0, got {quantize_to}")
    v = F.col(value_col)
    if quantize_to is not None:
        v = F.floor(v / F.lit(float(quantize_to))) * F.lit(float(quantize_to))
    vals = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(v.alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.col("v").asc())
    # rank of the FIRST row of each distinct value in the sorted
    # multiset: 1 + running count of preceding rows
    ranked = vals.select(
        "v",
        "c",
        (F.coalesce(F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)) + 1).alias("rk"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    bucket = F.expr(f"CAST(((rk - 1) * {buckets}) div n AS INT)")
    return (
        ranked.select(bucket.alias("bucket"), "v", "c")
        .groupBy("bucket")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.sum("c").alias("depth"))
        .orderBy("bucket")
    )


def sessionize_scalable(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    order_col: str | None = None,
    gap_seconds: float = 1800.0,
    bucket_seconds: float | None = None,
    hot_threshold: int | None = None,
) -> DataFrame:
    """Gap-based sessionization whose HOT KEYS parallelize (r15, skew
    rehearsal): the classic lag+cumsum window puts every row of a key in
    ONE task, and window partitions get no AQE skew splitting — on a
    Zipf(1.2) fixture (hot user = 13% of 20M events) the naive form
    measured a 2.24× straggler / 2.2× wall vs uniform keys
    (tools/skew_rehearsal_r15.py). Here the window runs per
    (key, time-bucket) — a hot key's timeline splits across buckets and
    therefore tasks — and bucket-boundary sessions are repaired by a
    chain merge over ONLY the first/last session of each bucket (≤ 2
    rows per key-bucket; an interior session is already final: its
    in-bucket neighbors sit > gap away on both sides, and any
    cross-bucket session is even further). With ``bucket_seconds > gap``
    a session can never silently span an EMPTY bucket (the jump exceeds
    the bucket width > gap), so the boundary set is complete.

    Same session rule as the naive form: a new session starts when
    ts − prev_ts > ``gap_seconds`` (strictly greater; equal-gap events
    stay in-session). Rows with NULL ``ts`` are EXCLUDED (documented
    policy — a NULL timestamp has no place on a timeline; the naive
    lag-window form would glue them into the previous session by SQL
    three-valued logic, which is an accident, not a semantic).
    ``order_col`` breaks equal-ts ordering deterministically inside a
    bucket (equal-ts rows always land in the same bucket, so the
    tie-break never crosses the repair path).

    Returns one row per session: (*key_cols, session_start, session_end,
    n_events), exactly equal to the naive single-window formulation
    (pytest-pinned randomized; oracle-verified via the driver entry).

    100 TB shape: two shuffles over events (bucket window + session
    collapse) + one shuffle over SESSIONS (boundary repair, rows =
    2×key-buckets at most). Default bucket = max(1 day, 48×gap).

    ``hot_threshold`` (r15, measured): the bucket+repair machinery costs
    ~2.9× the naive window when keys are UNIFORM (sessions ≈ events and
    every pass re-touches them), while fixing a 2.2× straggler when one
    key holds 13% of rows — so the right production shape is HYBRID:
    keys with more than ``hot_threshold`` rows take the bucketed path,
    the rest take the plain per-key window, results union (identical
    semantics either way — pytest-pinned). The key census is one narrow
    map-side-combined count shuffle. Set it to your per-task row budget
    (e.g. 1-5M on a 1000-executor cluster); None = every key bucketed.
    """
    if not key_cols:
        raise ValueError("sessionize_scalable needs at least one key column")
    if bucket_seconds is None:
        bucket_seconds = max(86_400.0, 48.0 * gap_seconds)
    if not bucket_seconds > gap_seconds:
        raise ValueError(
            f"bucket_seconds ({bucket_seconds}) must exceed gap_seconds "
            f"({gap_seconds}) or a session could span an empty bucket "
            f"invisible to the boundary repair"
        )
    from pyspark.sql import types as T

    dt = df.schema[ts_col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        epoch = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6
    else:
        epoch = F.col(ts_col).cast("double")
    base = df.filter(F.col(ts_col).isNotNull()).withColumn("__e", epoch)
    if hot_threshold is not None:
        # hybrid routing: the hot-key set is tiny by definition (keys
        # whose row count exceeds a per-task budget) — broadcast it
        hot_keys = (
            base.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__kc"))
            .filter(F.col("__kc") > int(hot_threshold))
            .select(*key_cols)
        )
        cold = base.join(F.broadcast(hot_keys), key_cols, "left_anti")
        hot = base.join(F.broadcast(hot_keys), key_cols, "left_semi")
        wc = Window.partitionBy(*key_cols).orderBy(
            F.col("__e").asc(), *( [F.col(order_col).asc()] if order_col else [] )
        )
        prev_c = F.lag("__e").over(wc)
        new_c = F.when(
            prev_c.isNull() | (F.col("__e") - prev_c > F.lit(float(gap_seconds))), 1
        ).otherwise(0)
        cold_sessions = (
            cold.withColumn("__sq", F.sum(new_c).over(wc))
            .groupBy(*key_cols, "__sq")
            .agg(
                F.min(ts_col).alias("session_start"),
                F.max(ts_col).alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(*key_cols, "session_start", "session_end", "n_events")
        )
        hot_sessions = sessionize_scalable(
            hot.drop("__e"),
            key_cols,
            ts_col=ts_col,
            order_col=order_col,
            gap_seconds=gap_seconds,
            bucket_seconds=bucket_seconds,
            hot_threshold=None,
        )
        return cold_sessions.unionByName(hot_sessions)
    d = base.withColumn("__b", F.floor(F.col("__e") / F.lit(float(bucket_seconds))))
    order = [F.col("__e").asc()] + ([F.col(order_col).asc()] if order_col else [])
    wb = Window.partitionBy(*key_cols, "__b").orderBy(*order)
    prev_e = F.lag("__e").over(wb)
    is_new = F.when(prev_e.isNull() | (F.col("__e") - prev_e > F.lit(float(gap_seconds))), 1).otherwise(0)
    sess = d.withColumn("__sq", F.sum(is_new).over(wb))
    per = sess.groupBy(*key_cols, "__b", "__sq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.min("__e").alias("__s"),
        F.max("__e").alias("__t"),
    )
    # ONE downstream plan (r15 self-review: the first cut filtered `per`
    # into interior/boundary branches and unioned them — Spark replays
    # the whole scan+window+aggregate lineage per branch (4 scans, no
    # exchange reuse). Instead: mark boundary sessions, chain them with
    # a conditional lag (last BOUNDARY end before me) inside one per-key
    # window over SESSIONS, and give interior sessions singleton group
    # keys — one scan, and the extra exchange carries sessions, not
    # events. The per-key session window concentrates a hot key's
    # SESSIONS in one task — events/avg_session_size rows, i.e. the
    # heavy per-event work stays split; only a pathological
    # all-singleton-session hot key degrades to the naive shape.
    n_sess = Window.partitionBy(*key_cols, "__b")
    per = per.withColumn(
        "__bd",
        (F.col("__sq") == 1) | (F.col("__sq") == F.max("__sq").over(n_sess)),
    )
    wk = Window.partitionBy(*key_cols).orderBy(
        F.col("__s").asc(), F.col("__b").asc(), F.col("__sq").asc()
    )
    prev_bt = F.last(F.when(F.col("__bd"), F.col("__t")), ignorenulls=True).over(
        wk.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_chain = F.when(~F.col("__bd"), 0).when(
        prev_bt.isNull() | (F.col("__s") - prev_bt > F.lit(float(gap_seconds))), 1
    ).otherwise(0)
    grouped = per.withColumn(
        "__g",
        F.when(
            F.col("__bd"),
            F.concat(F.lit("b"), F.sum(new_chain).over(wk).cast("string")),
        ).otherwise(
            F.concat(
                F.lit("i"),
                F.col("__b").cast("string"),
                F.lit("_"),
                F.col("__sq").cast("string"),
            )
        ),
    )
    return (
        grouped.groupBy(*key_cols, "__g")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
        )
        .select(*key_cols, "session_start", "session_end", "n_events")
    )
