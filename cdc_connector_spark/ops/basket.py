"""Market-basket co-occurrence analysis: pairwise association rules
(support / confidence / lift) over (basket, item) memberships — the
Agrawal & Srikant Apriori family restricted to the 2-itemset level,
which is the level that matters at scale (higher orders explode
combinatorially and are mined over the pair survivors anyway).

The recommendation/affinity primitive: "parts bought together",
"queries co-issued in a session", "tags co-applied to a document".

Spark-first shape (the ``ngram_jaccard_pairs`` engine applied to
baskets):
- memberships collapse to DISTINCT (basket, item) first — multiplicity
  inside one basket is presence, not weight;
- oversized baskets are DROPPED with an audit (``oversized_baskets``)
  before the pair join: one pathological 10k-item basket contributes
  50M pair rows — the winnow ``max_df`` / simhash ``max_bucket``
  discipline, cap-by-default;
- candidate pairs come from a basket-keyed self-join (a < b), never
  all-pairs across the catalog; per-pair counts are one map-side-
  combined aggregation;
- every reported ratio is a division of exact BIGINTs (counts and
  count-products), so support/confidence/lift are engine-portable
  doubles — the whole operator value-verifies against a SQL oracle.

At 100 TB: cost is Σ_b |b|² pair rows over the capped baskets, shuffled
once on the pair key; item counts and the basket census are
map-side-combined aggregations on single keys. Statistics (N, item
counts) are computed over the KEPT baskets so confidence/lift are
internally consistent with the pair counts (a rule's confidence can
never exceed 1 because its denominator saw every basket its numerator
did).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _basket_sizes(
    df: DataFrame, basket_col: str, item_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared census behind the cap and its audit: distinct memberships
    (__b, __i) plus per-basket distinct-item counts (__b, __sz) — ONE
    derivation, so the audit can never desynchronize from the filter it
    documents."""
    bi = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    return bi, bi.groupBy("__b").agg(F.count(F.lit(1)).alias("__sz"))


def _kept_memberships(
    df: DataFrame, basket_col: str, item_col: str, max_basket_size: int
) -> DataFrame:
    bi, sizes = _basket_sizes(df, basket_col, item_col)
    # anti-join the few OVERSIZED baskets (the r12 kept-set inversion:
    # the kept set is nearly every basket — joining it shuffles the
    # whole census; the hot set is tiny and AQE broadcasts it)
    # NULL basket ids must be dropped EXPLICITLY: the pre-r12 kept-set
    # equi-join discarded them for free, but a left_anti KEEPS NULL keys
    # (NULL never matches the hot set, even when the NULL pseudo-basket
    # is oversized), which would let them leak into the item census and
    # shift support/lift denominators (r12 ADVICE).
    hot = sizes.filter(F.col("__sz") > max_basket_size).select("__b")
    return bi.filter(F.col("__b").isNotNull()).join(hot, "__b", "left_anti")


def oversized_baskets(
    df: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    max_basket_size: int = 1000,
) -> int:
    """Audit for ``association_rules``'s basket cap: how many baskets
    exceed ``max_basket_size`` distinct items and were therefore dropped
    from the pair statistics. Nonzero on a real corpus usually means a
    degenerate basket key (a catch-all session id, a NULL-ish default) —
    inspect before raising the cap."""
    _, sizes = _basket_sizes(df, basket_col, item_col)
    return sizes.filter(F.col("__sz") > max_basket_size).count()


def association_rules(
    df: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_pair_count: int = 2,
    max_basket_size: int = 1000,
) -> DataFrame:
    """Pairwise association rules over (basket, item) memberships.

    For every unordered item pair {a, b} co-occurring in at least
    ``min_pair_count`` kept baskets, emits BOTH directed rules
    (antecedent → consequent):

    - ``pair_n``     — baskets containing both items (exact integer)
    - ``support``    — pair_n / N over the N kept baskets
    - ``confidence`` — pair_n / n(antecedent)
    - ``lift``       — (N · pair_n) / (n(a) · n(b)); > 1 means the items
      co-occur more than independence predicts

    All three ratios are single divisions of exact BIGINTs rounded 6
    (portable). Baskets with more than ``max_basket_size`` distinct
    items are dropped first (quadratic fan-out guard — quantify with
    ``oversized_baskets``); N and the per-item counts are computed over
    the kept baskets, keeping the ratios internally consistent."""
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if max_basket_size < 2:
        raise ValueError(f"max_basket_size must be >= 2, got {max_basket_size}")
    # the kept-membership subtree (distinct + size census + semi-join) is
    # referenced FIVE times below (N, item counts, both self-join sides,
    # pairs) — cut it once or every reference re-derives the full input
    # lineage (the triangle_count 166→13-exchange lesson). localCheckpoint,
    # not persist: no cache-manager substitution into unrelated plans.
    bi = _kept_memberships(df, basket_col, item_col, max_basket_size).localCheckpoint(
        eager=True
    )
    n_total = bi.select(F.count_distinct("__b").alias("__n"))
    item_n = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__in"))
    l, r = bi.alias("l"), bi.alias("r")
    pairs = (
        l.join(r, on=[F.col("l.__b") == F.col("r.__b"), F.col("l.__i") < F.col("r.__i")])
        .groupBy(F.col("l.__i").alias("a"), F.col("r.__i").alias("b"))
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_count)
    )
    both = pairs.select(
        F.col("a").alias("antecedent"), F.col("b").alias("consequent"), "pair_n"
    ).unionByName(
        pairs.select(
            F.col("b").alias("antecedent"), F.col("a").alias("consequent"), "pair_n"
        )
    )
    na = item_n.select(F.col("__i").alias("antecedent"), F.col("__in").alias("__na"))
    nb = item_n.select(F.col("__i").alias("consequent"), F.col("__in").alias("__nb"))
    return (
        both.join(na, "antecedent")
        .join(nb, "consequent")
        .crossJoin(F.broadcast(n_total))
        .select(
            "antecedent",
            "consequent",
            "pair_n",
            F.round(F.col("pair_n") / F.col("__n"), 6).alias("support"),
            F.round(F.col("pair_n") / F.col("__na"), 6).alias("confidence"),
            F.round(
                (F.col("__n") * F.col("pair_n")).cast("double")
                / (F.col("__na") * F.col("__nb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
