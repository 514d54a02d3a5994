"""ops/basket.py — pairwise association rules (support/confidence/lift)."""

from __future__ import annotations

import pytest

from cdc_connector_spark.ops.basket import association_rules, oversized_baskets


def _m(spark, rows):
    return spark.createDataFrame(rows, "basket_id bigint, item string")


BASKETS = [
    # 4 baskets: {x,y} co-occur 3x, {x,z} once, y alone once
    (1, "x"), (1, "y"),
    (2, "x"), (2, "y"), (2, "z"),
    (3, "x"), (3, "y"),
    (4, "y"),
    # duplicate membership rows must collapse to presence
    (3, "x"),
]


def test_association_rules_hand_checked(spark):
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(_m(spark, BASKETS), min_pair_count=1).collect()
    }
    # N=4 kept baskets; n(x)=3, n(y)=4, n(z)=1; xy=3, xz=1, yz=1
    xy = got[("x", "y")]
    assert (xy["pair_n"], xy["support"], xy["confidence"]) == (3, 0.75, 1.0)
    assert xy["lift"] == 1.0  # (4*3)/(3*4)
    yx = got[("y", "x")]
    assert (yx["pair_n"], yx["confidence"]) == (3, 0.75)
    xz = got[("x", "z")]
    assert (xz["pair_n"], xz["lift"]) == (1, round(4 / 3, 6))
    # both directions present for every surviving pair
    assert set(got) == {
        ("x", "y"), ("y", "x"), ("x", "z"), ("z", "x"), ("y", "z"), ("z", "y"),
    }


def test_association_rules_min_pair_count_filters(spark):
    got = {
        (r["antecedent"], r["consequent"])
        for r in association_rules(_m(spark, BASKETS), min_pair_count=2).collect()
    }
    assert got == {("x", "y"), ("y", "x")}


def test_association_rules_basket_cap_and_audit(spark):
    # basket 9 has 5 distinct items; with the cap at 4 it must vanish
    # from N, item counts, and pairs — and the audit counts it
    rows = BASKETS + [(9, t) for t in ("a", "b", "c", "d", "e")]
    df = _m(spark, rows)
    assert oversized_baskets(df, max_basket_size=4) == 1
    assert oversized_baskets(df, max_basket_size=5) == 0
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, min_pair_count=1, max_basket_size=4).collect()
    }
    assert not any(a in "abcde" for a, _ in got)
    # statistics identical to the uncapped 4-basket corpus
    assert got[("x", "y")]["support"] == 0.75


def test_association_rules_guards(spark):
    df = _m(spark, BASKETS)
    with pytest.raises(ValueError, match="min_pair_count"):
        association_rules(df, min_pair_count=0)
    with pytest.raises(ValueError, match="max_basket_size"):
        association_rules(df, max_basket_size=1)


def test_association_rules_null_basket_ids_are_dropped(spark):
    """NULL basket ids never enter the census or pair statistics — the
    r12 kept-set→anti-join inversion would otherwise KEEP them (NULL
    never matches the hot set), shifting support/lift denominators
    (r12 ADVICE pin). Statistics must equal the NULL-free corpus."""
    rows = BASKETS + [(None, "x"), (None, "y"), (None, "q")]
    df = spark.createDataFrame(rows, "basket_id bigint, item string")
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, min_pair_count=1).collect()
    }
    base = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(_m(spark, BASKETS), min_pair_count=1).collect()
    }
    assert set(got) == set(base)  # no q-pairs from the NULL pseudo-basket
    for k in base:
        assert (got[k]["pair_n"], got[k]["support"], got[k]["lift"]) == (
            base[k]["pair_n"], base[k]["support"], base[k]["lift"],
        )
    # ...even when the NULL pseudo-basket is oversized (the exact leak path)
    many = rows + [(None, f"i{j}") for j in range(2000)]
    df2 = spark.createDataFrame(many, "basket_id bigint, item string")
    got2 = {
        (r["antecedent"], r["consequent"]): r["support"]
        for r in association_rules(df2, min_pair_count=1).collect()
    }
    assert got2[("x", "y")] == 0.75
