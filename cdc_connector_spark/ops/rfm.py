"""RFM customer segmentation (recency / frequency / monetary).

The classic marketing-analytics segmentation: collapse an order history to
one row per customer, score each of the three metrics into quantile
buckets 1..5, and combine the scores into a segment code (555 = recent +
frequent + big spender).

Scale-safe quantile assignment — deliberately NOT ``ntile``: an ntile
window over per-customer rows is a single-reducer global sort over
|customers| (billions at 100 TB). Instead each metric's bucket comes from
its exact CDF over DISTINCT metric VALUES:

    score(v) = ceil(buckets · |{customers at-or-worse than v}| / N)

computed as one cumulative-count window over the distinct-value table
(recency: bounded by the corpus date range in days; frequency: bounded by
max orders per customer; monetary: bucketed to whole currency units
first — the stated discretization that bounds the table) and
broadcast-joined back. Ties share a bucket — for segmentation that is the
RIGHT semantics (identical behavior ⇒ identical score), and unlike
ntile's row-order tie split it is deterministic and engine-replayable, so
the whole table value-verifies.

All arithmetic is exact integers (cents trick for money, calendar
``datediff`` for recency — DST-safe; integer ceil-division for the
bucket), so the oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    buckets: int = 5,
) -> DataFrame:
    """RFM table: one row per customer —
    (customer, recency_days, frequency, monetary_cents, r, f, m, segment).

    recency_days = calendar days from the customer's last order to the
    corpus max order date (the "as-of" anchor, derived not wall-clock, so
    reruns are stable); frequency = order count; monetary_cents = exact
    integer cents. r/f/m ∈ 1..buckets via the CDF rule above — FEWER
    recency days is better (r=buckets ⇒ most recent); higher f/m is
    better. segment = 100·r + 10·f + m.

    Shape: one customer-keyed collapse over orders; three distinct-value
    CDF windows (each over a bounded table — module docstring); three
    broadcast joins back. No global sort over customers anywhere."""
    per = (
        orders.groupBy(F.col(customer_col).alias("customer"))
        .agg(
            F.max(F.to_date(F.col(date_col))).alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
        .localCheckpoint(eager=True)  # referenced by 3 CDF lineages + base
    )
    total = per.count()
    anchor = per.agg(F.max("__last").alias("__asof"))
    base = per.join(F.broadcast(anchor)).select(
        "customer",
        F.datediff(F.col("__asof"), F.col("__last")).alias("recency_days"),
        "frequency",
        "monetary_cents",
        F.expr("monetary_cents DIV 100").alias("__munits"),
    )

    def score_table(metric: str, out_col: str, worst_first) -> DataFrame:
        vals = base.groupBy(metric).agg(F.count(F.lit(1)).alias("__n"))
        w = Window.orderBy(worst_first).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = vals.select(metric, F.sum("__n").over(w).alias("__cum"))
        return cum.select(
            metric,
            F.expr(
                f"CAST(({buckets} * __cum + {total} - 1) DIV {total} AS INT)"
            ).alias(out_col),
        )

    r_t = score_table("recency_days", "r", F.col("recency_days").desc())
    f_t = score_table("frequency", "f", F.col("frequency").asc())
    m_t = score_table("__munits", "m", F.col("__munits").asc())
    return (
        base.join(F.broadcast(r_t), "recency_days")
        .join(F.broadcast(f_t), "frequency")
        .join(F.broadcast(m_t), "__munits")
        .select(
            "customer",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r",
            "f",
            "m",
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
            .cast("int")
            .alias("segment"),
        )
    )


def revenue_concentration(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    top_num: int = 1,
    top_den: int = 10,
) -> DataFrame:
    """Revenue-concentration report: the Gini coefficient of per-customer
    revenue plus the share held by the top ``top_num/top_den`` of
    customers (default: top decile) — the whale-dependence readout
    behind every "top 10% of customers drive X% of revenue" decision.

    Customer totals are bucketed to WHOLE currency units before ranking
    (the rfm_segments discretization, stated): it bounds the ordered
    window to the distinct-value table instead of |customers|, which is
    what makes the exact rank arithmetic scale-safe. Ranks within a tied
    value group are interchangeable — the group's rank SUM (m·c_prev +
    m(m+1)/2) is what enters Gini, so ties cannot make the answer
    order-dependent.

    All sums are DECIMAL(38,0)-accumulated exact integers (value·rank
    products overflow BIGINT long before 100 TB); Gini and the top share
    are each ONE fixed IEEE expression rounded 6. Returns one row:
    (n_customers, total_units, gini, top_share)."""
    if not (0 < top_num < top_den):
        raise ValueError(f"top fraction must be in (0,1): {top_num}/{top_den}")
    dec = "decimal(38,0)"
    per = (
        orders.groupBy(F.col(customer_col).alias("customer"))
        .agg(
            F.expr(
                f"CAST(SUM(CAST(round({amount_col} * 100) AS BIGINT)) DIV 100 AS BIGINT)"
            ).alias("v")
        )
    )
    vals = per.groupBy("v").agg(F.count(F.lit(1)).alias("m")).localCheckpoint(
        eager=True
    )  # two ordered windows + totals read it
    tot = vals.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("v").cast(dec) * F.col("m").cast(dec)).alias("t"),
    )
    asc = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    m_dec = F.col("m").cast(dec)
    cprev = F.coalesce(F.sum("m").over(asc), F.lit(0)).cast(dec)
    ranksum = m_dec * cprev + ((m_dec * (m_dec + F.lit(1))) / F.lit(2)).cast(dec)
    s1 = vals.select(
        (F.col("v").cast(dec) * ranksum).cast(dec).alias("__rv")
    ).agg(F.sum("__rv").alias("s1"))
    desc = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_desc = vals.select(
        "v",
        "m",
        F.coalesce(F.sum("m").over(desc), F.lit(0)).alias("cprev_d"),
        F.coalesce(
            F.sum(F.col("v").cast(dec) * F.col("m").cast(dec)).over(desc),
            F.lit(0).cast(dec),
        ).alias("csum_d"),
    )
    k = F.expr(f"CAST(({top_num} * n + {top_den} - 1) DIV {top_den} AS BIGINT)")
    straddle = (
        with_desc.join(F.broadcast(tot))
        .filter(
            (F.col("cprev_d") < k) & (F.col("cprev_d") + F.col("m") >= k)
        )
        .select(
            "n",
            "t",
            (
                F.col("csum_d")
                + (k - F.col("cprev_d")).cast(dec) * F.col("v").cast(dec)
            ).alias("topsum"),
        )
    )
    n_d = F.col("n").cast("double")
    t_d = F.col("t").cast("double")
    return straddle.join(F.broadcast(s1)).select(
        F.col("n").alias("n_customers"),
        F.col("t").cast("long").alias("total_units"),
        F.round(
            F.lit(2.0) * F.col("s1").cast("double") / (n_d * t_d)
            - (n_d + F.lit(1.0)) / n_d,
            6,
        ).alias("gini"),
        F.round(F.col("topsum").cast("double") / t_d, 6).alias("top_share"),
    )
