"""ops/fuzzy.py — blocked fuzzy matching (token/q-gram blocking +
Levenshtein verify)."""

from __future__ import annotations

import pytest

from cdc_connector_spark.ops.fuzzy import fuzzy_pairs


def test_fuzzy_pairs_token_blocking(spark):
    df = spark.createDataFrame(
        [
            (1, "Acme Widgets Inc"),
            (2, "acme  widgets inc"),     # case/whitespace only -> dist 0
            (3, "Acme Widgets Incc"),     # one insertion -> dist 1
            (4, "Acme Gizmos Inc"),       # widgets->gizmos = dist 5
            (5, "Globex Corporation"),
        ],
        "id bigint, name string",
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(df, max_dist=2).collect()}
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert (1, 4) not in got  # dist 5 > budget
    assert all(5 not in p for p in got)
    # widening the budget admits the gizmos variant (shared tokens block it)
    got5 = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(df, max_dist=5).collect()}
    assert got5[(1, 4)] == 5


def test_fuzzy_pairs_qgram_blocking_catches_all_edited_tokens(spark):
    """Every token edited: token blocking is blind, q-gram blocking finds
    the pair (shared unedited character runs)."""
    df = spark.createDataFrame(
        [(1, "jonathon smythe"), (2, "jonathan smythee")],
        "id bigint, name string",
    )
    token = fuzzy_pairs(df, max_dist=3, block="token").collect()
    assert token == []  # both tokens differ -> no shared word
    qg = {(r["id_a"], r["id_b"]): r["dist"]
          for r in fuzzy_pairs(df, max_dist=3, block="qgram").collect()}
    assert qg == {(1, 2): 2}


def test_fuzzy_pairs_hot_token_cap_and_guards(spark):
    rows = [(i, f"unique{i} inc") for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, name string")
    # "inc" blocks everything -> C(10,2) candidates, all verify-rejected
    # anyway, but the cap removes the block key up front
    assert fuzzy_pairs(df, max_dist=1, max_token_freq=5).collect() == []
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_pairs(df, max_dist=-1)
    with pytest.raises(ValueError, match="block"):
        fuzzy_pairs(df, block="soundex")
