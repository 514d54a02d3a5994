"""Experimentation analytics: deterministic hash-split assignment and the
two-proportion z-test — the A/B-testing primitive that completes the
product-analytics suite (funnel → retention → attribution → transitions
→ experiment readout).

Value-portable by construction, like the rest of the analytics plane:
assignment uses the portable md5 fold (``key_skew_profile``'s scheme —
engine-replayable, uniform, and STABLE: a user keeps their variant across
sessions and reruns, the property bucketed experiment assignment actually
requires); all counts are exact integers; the pooled z statistic is ONE
fixed IEEE double expression rounded 6, so the whole readout
hash-matches a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_variant(col, n_variants: int = 2):
    """Deterministic variant id in [0, n_variants) from the portable
    md5 fold of the key's string form — stable across engines and runs
    (never ``rand()``: resampling on retry breaks exposure accounting)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_variants)).cast("int")


def ab_test_report(
    df: DataFrame,
    exposure_type: str = "view",
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    variant_col=None,
) -> DataFrame:
    """One-row A/B readout: per-variant exposed users and converters,
    conversion rates, and the pooled two-proportion z statistic.

    Semantics: a user is EXPOSED if they have ≥ 1 ``exposure_type``
    event, CONVERTED if exposed AND they have ≥ 1 ``conversion_type``
    event strictly AFTER their first exposure (pre-exposure purchases
    don't credit the experiment — the guardrail that separates a real
    readout from a correlation query). ``variant_col`` defaults to the
    stable 2-way hash split of ``user_col`` and MUST be functionally
    dependent on it (every event of a user carries the same variant —
    true for any hash split or a properly-logged assignment column).
    If an event-level ``variant_col`` violates that (NULL or differing
    on conversion events), the (user, variant) collapse treats each
    (user, variant) pair as a separate unit, so a conversion logged
    under a different variant than the exposure is NOT counted toward
    it — validate assignment integrity upstream (r12 ADVICE).

    Returns (users_a, conv_a, cvr_a, users_b, conv_b, cvr_b, z) — rates
    and z rounded 6; z is 0.0 when degenerate (a variant with no
    exposure, or pooled rate 0 or 1), stated rather than NULL so the
    readout row always materializes.

    Shape: events collapse to one row per user in ONE user-keyed
    aggregation — min exposure ts and max conversion ts together, since
    "∃ conversion strictly after the first exposure" ⟺ "max conversion
    ts > first exposure ts" (r12 review: the previous exposure-collapse
    + conversion-join formulation scanned the event table twice and
    re-grouped; this is one corpus scan, identical output). Then a
    2-row variant aggregate and a single-row pivot — nothing after the
    collapse exceeds |users|."""
    v = variant_col if variant_col is not None else hash_variant(F.col(user_col))
    ev = df.select(
        F.col(user_col).alias("__u"),
        v.alias("__v"),
        F.col(type_col).alias("__t"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__ts"),
    )
    per_user = ev.groupBy("__u", "__v").agg(
        F.min(F.when(F.col("__t") == exposure_type, F.col("__ts"))).alias("__first_exp"),
        F.max(F.when(F.col("__t") == conversion_type, F.col("__ts"))).alias("__last_conv"),
    )
    flagged = per_user.filter(F.col("__first_exp").isNotNull()).select(
        "__u",
        "__v",
        F.when(F.col("__last_conv") > F.col("__first_exp"), 1)
        .otherwise(0)
        .alias("__c"),
    )
    agg = flagged.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__c").alias("__k")
    )
    row = agg.groupBy().agg(
        F.coalesce(F.sum(F.when(F.col("__v") == 0, F.col("__n"))), F.lit(0)).alias("users_a"),
        F.coalesce(F.sum(F.when(F.col("__v") == 0, F.col("__k"))), F.lit(0)).alias("conv_a"),
        F.coalesce(F.sum(F.when(F.col("__v") == 1, F.col("__n"))), F.lit(0)).alias("users_b"),
        F.coalesce(F.sum(F.when(F.col("__v") == 1, F.col("__k"))), F.lit(0)).alias("conv_b"),
    )
    na, ka = F.col("users_a").cast("double"), F.col("conv_a").cast("double")
    nb, kb = F.col("users_b").cast("double"), F.col("conv_b").cast("double")
    pool = (ka + kb) / (na + nb)
    se2 = pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)
    z = F.when(
        (F.col("users_a") > 0) & (F.col("users_b") > 0) & (se2 > 0),
        F.round((ka / na - kb / nb) / F.sqrt(se2), 6),
    ).otherwise(F.lit(0.0))
    return row.select(
        "users_a",
        "conv_a",
        F.when(F.col("users_a") > 0, F.round(ka / na, 6)).otherwise(F.lit(0.0)).alias("cvr_a"),
        "users_b",
        "conv_b",
        F.when(F.col("users_b") > 0, F.round(kb / nb, 6)).otherwise(F.lit(0.0)).alias("cvr_b"),
        z.alias("z"),
    )
