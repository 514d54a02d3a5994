"""ops/fuzzy.py — blocked fuzzy matching (token/q-gram blocking +
Levenshtein verify)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

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


def test_fuzzy_dropped_keys_and_coverage_audit(spark):
    """The cap audit (r11, from the SCALING 4o finding): dropped keys
    surface largest-first, and orphaned records — every key dropped —
    are exactly the ones fuzzy_pairs is structurally blind to."""
    from cdc_connector_spark.ops.fuzzy import (
        fuzzy_blocking_coverage,
        fuzzy_dropped_keys,
    )

    # "inc" appears in all 10 names; "corp" in 3; unique tokens elsewhere
    rows = [(i, f"unique{i} inc") for i in range(7)] + [
        (7, "alpha corp inc"),
        (8, "beta corp inc"),
        (9, "gamma corp inc"),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string")
    dropped = fuzzy_dropped_keys(df, max_token_freq=5).collect()
    assert [(r["key"], r["n_records"]) for r in dropped] == [("inc", 10)]
    # cap 2 drops "inc" AND "corp": rows 7-9 keep their unique first
    # token; nothing is orphaned yet
    [cov] = fuzzy_blocking_coverage(df, max_token_freq=2).collect()
    assert (cov["records"], cov["orphaned_records"]) == (10, 0)
    # a name made ONLY of hot tokens is orphaned and the audit says so
    df2 = df.union(spark.createDataFrame([(10, "inc")], "id bigint, name string"))
    [cov2] = fuzzy_blocking_coverage(df2, max_token_freq=5).collect()
    assert cov2["orphaned_records"] == 1
    assert cov2["orphaned_share"] == round(1 / 11, 6)
    # the orphan really is invisible to the matcher at the same cap
    pairs = fuzzy_pairs(df2, max_dist=1, max_token_freq=5).collect()
    assert all(10 not in (p["id_a"], p["id_b"]) for p in pairs)


def test_fuzzy_extra_block_cols_equals_posthoc_gate(spark):
    """extra_block_cols (r11): gating during blocking must return
    EXACTLY plain fuzzy_pairs ∩ attribute-equality — the identity that
    lets golden_record move its gate into the join without changing
    results (the gram cap stays global, so kept grams are unchanged)."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(120):
        base = f"name{rng.randint(0, 30):03d}"
        # random single-char edits create true near pairs across groups
        s = list(base)
        if rng.random() < 0.5:
            s[rng.randrange(len(s))] = rng.choice("abcxyz")
        rows.append((i, "".join(s), rng.randint(0, 2), rng.choice(["A", "B"])))
    df = spark.createDataFrame(rows, "id bigint, name string, nat int, seg string")
    plain = fuzzy_pairs(df, max_dist=1, block="qgram", max_token_freq=50)
    attrs = {r["id"]: (r["nat"], r["seg"]) for r in df.collect()}
    want = sorted(
        (p["id_a"], p["id_b"], p["dist"])
        for p in plain.collect()
        if attrs[p["id_a"]] == attrs[p["id_b"]]
    )
    gated = fuzzy_pairs(
        df,
        max_dist=1,
        block="qgram",
        max_token_freq=50,
        extra_block_cols=("nat", "seg"),
    )
    got = sorted((p["id_a"], p["id_b"], p["dist"]) for p in gated.collect())
    assert got == want and len(want) > 0
    # NULL attributes match nothing (the SQL gate convention)
    df_null = df.withColumn(
        "nat", F.when(F.col("id") < 60, None).otherwise(F.col("nat"))
    )
    gated_null = fuzzy_pairs(
        df_null, max_dist=1, block="qgram", max_token_freq=50,
        extra_block_cols=("nat", "seg"),
    ).collect()
    assert all(p["id_a"] >= 60 and p["id_b"] >= 60 for p in gated_null)


def test_blocking_coverage_counts_null_and_empty_names_as_orphans(spark):
    """NULL/whitespace-only names have no blocking keys at all and
    fuzzy_pairs can never match them — the coverage audit must count
    them as orphaned, not silently exclude them (r11 review)."""
    from cdc_connector_spark.ops.fuzzy import fuzzy_blocking_coverage

    rows = [(1, "acme inc"), (2, "acme co"), (3, None), (4, "   "), (5, "")]
    df = spark.createDataFrame(rows, "id bigint, name string")
    [cov] = fuzzy_blocking_coverage(df, max_token_freq=100).collect()
    assert cov["records"] == 5
    assert cov["orphaned_records"] == 3  # NULL, whitespace, empty
    assert cov["blocked_records"] == 2
    assert cov["orphaned_share"] == 0.6
