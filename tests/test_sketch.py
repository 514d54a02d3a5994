"""Sketch operators: Bloom-filter decontamination and CMS heavy hitters.

Pins the two guarantees the sketches make (Bloom: zero false negatives;
CMS: estimate never under-counts) AND that the error the sketches DO make
is real and surfaced — a tiny filter/narrow sketch must exhibit a false
positive / a collision over-estimate on a planted corpus, otherwise the
tests would pass with the sketch silently replaced by the exact join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_connector_spark.ops.sketch import (
    bloom_build,
    bloom_decontaminate,
    cms_heavy_hitters,
    portable_hash60,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    eval_set = _docs(
        spark,
        [
            (1000, "alpha beta gamma delta epsilon"),
            (1001, "one two three four five six"),
        ],
    )
    train = _docs(
        spark,
        [
            # shares 3 distinct 3-grams with eval doc 1000
            (1, "alpha beta gamma delta epsilon zeta"),
            # shares exactly one 3-gram ("one two three")
            (2, "zero one two three nine eight"),
            # shares nothing
            (3, "red green blue cyan magenta yellow"),
        ],
    )
    return train, eval_set


def test_bloom_no_false_negatives_and_flag(spark, corpus):
    train, eval_set = corpus
    out = bloom_decontaminate(train, eval_set, n=3, m_bits=4096, k=3, min_flagged=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 1: 4 grams total, >= 3 shared -> contaminated (no false negatives)
    assert rows[1]["contaminated"] is True
    assert rows[1]["flagged_grams"] >= 3
    assert rows[1]["n_grams"] == 4
    # doc 2: exactly one true hit; at m=4096 over ~8 eval grams the false
    # positive rate is ~0 so flagged == 1 and not contaminated
    assert rows[2]["flagged_grams"] >= 1
    assert rows[2]["contaminated"] is False
    # doc 3 may appear only via a false positive; at m=4096 it must not
    assert 3 not in rows


def test_bloom_tiny_filter_has_false_positive(spark, corpus):
    """m_bits=8 with k=2 over 8 eval grams saturates the filter — a
    never-shared gram must collide, proving the probe consults the sketch
    (not an exact join). Bloom false-positive direction only: flagged is a
    SUPERSET of the exact overlap."""
    train, eval_set = corpus
    out = bloom_decontaminate(train, eval_set, n=3, m_bits=8, k=2, min_flagged=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 3 in rows and rows[3]["flagged_grams"] >= 1
    # superset property holds at any size: doc1's true 3 still flagged
    assert rows[1]["flagged_grams"] >= 3


def test_bloom_bitset_is_bounded(spark, corpus):
    _, eval_set = corpus
    grams = eval_set.select(
        F.explode(F.split(F.col("text"), " ")).alias("gram")
    ).distinct()
    bits = bloom_build(grams, "gram", m_bits=16, k=4)
    assert bits.count() <= 16


def test_portable_hash60_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([("alpha beta",), ("42",)], "s string").select(
        "s", portable_hash60(F.col("s"), salt="7").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    exp = {
        s: h
        for s, h in duckdb.connect().execute(
            """
            SELECT s, list_reduce(
                list_transform(range(1, 16),
                    i -> CAST(strpos('0123456789abcdef', substring(md5('7:' || s), i, 1)) - 1 AS BIGINT)),
                (a, x) -> a * 16 + x) AS h
            FROM (SELECT unnest(['alpha beta','42']) AS s)
            """
        ).fetchall()
    }
    assert got == exp


def test_cms_never_undercounts_and_orders(spark):
    rows = [(i % 7,) for i in range(700)] + [(99,)] * 300
    df = spark.createDataFrame(rows, "k long")
    out = cms_heavy_hitters(df, "k", depth=4, width=64, topn=10).collect()
    assert out[0]["key"] == "99" and out[0]["exact"] == 300
    for r in out:
        assert r["est"] >= r["exact"] and r["err"] == r["est"] - r["exact"]


def test_cms_narrow_sketch_overestimates(spark):
    """width=2 forces collisions among 20 distinct keys: at least one key's
    estimate must exceed its exact count — the sketch is consulted, not the
    exact groupBy."""
    rows = [(i,) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k long")
    out = cms_heavy_hitters(df, "k", depth=2, width=2, topn=20).collect()
    assert any(r["err"] > 0 for r in out)
    assert all(r["est"] >= r["exact"] for r in out)


def test_cms_ignores_nulls(spark):
    df = spark.createDataFrame([(1,), (None,), (1,)], "k long")
    out = cms_heavy_hitters(df, "k", depth=2, width=8, topn=5).collect()
    assert len(out) == 1 and out[0]["exact"] == 2


# ---------------------------------------------------------------- HLL / KMV


def _keyed(spark, rows):
    return spark.createDataFrame(rows, "grp string, k long")


def test_hll_small_range_is_near_exact_and_bounded(spark):
    # 3 groups with 10 / 300 / 1000 distinct keys; m=256 registers
    rows = [("a", i) for i in range(10)]
    rows += [("b", 1000 + i) for i in range(300)]
    rows += [("c", 10_000 + i) for i in range(1000)]
    rows += rows[:50]  # duplicates must not change a distinct sketch
    from cdc_connector_spark.ops.sketch import hll_distinct, hll_registers

    out = {r["grp"]: r for r in hll_distinct(_keyed(spark, rows), "k", "grp").collect()}
    for g, exact in (("a", 10), ("b", 300), ("c", 1000)):
        assert out[g]["exact_distinct"] == exact
        # standard HLL error at m=256 is ~6.5%; allow 3 sigma
        assert abs(out[g]["est"] - exact) / exact < 0.20, (g, out[g]["est"])
    # the register table is bounded by m per group no matter the input
    regs = hll_registers(_keyed(spark, rows), "k", "grp")
    per = {r["grp"]: r["n"] for r in regs.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v <= 256 for v in per.values())


def test_hll_rejects_tiny_p(spark):
    from cdc_connector_spark.ops.sketch import hll_distinct

    with pytest.raises(ValueError):
        hll_distinct(_keyed(spark, [("a", 1)]), "k", "grp", p=4)


def test_hll_accuracy_holds_at_nondefault_p(spark):
    """rho's width constant must track p (r11 review): a fixed 53 is
    only right at p=8 and inflated estimates ~2^(p-8) at larger p —
    16x at the p=12 default of column_profile_diff's hll mode. Pin the
    raw-estimator regime (past linear counting) at p=12 AND p=7."""
    from cdc_connector_spark.ops.sketch import hll_distinct

    # p=12: linear counting ends at 2.5*4096 = 10240 -> use 60k keys
    rows = [("a", i) for i in range(60_000)]
    [r] = hll_distinct(_keyed(spark, rows), "k", "grp", p=12).collect()
    assert r["raw_est"] > 10_240  # genuinely in the raw-estimator regime
    # standard error at m=4096 is ~1.6%; allow generous 3-sigma-ish 10%
    assert abs(r["est"] - 60_000) / 60_000 < 0.10, r["est"]
    # p=7: width 54 > 53 — the old constant under-flowed the register
    rows7 = [("a", i) for i in range(5_000)]
    [r7] = hll_distinct(_keyed(spark, rows7), "k", "grp", p=7).collect()
    assert r7["raw_est"] > 2.5 * 128
    assert abs(r7["est"] - 5_000) / 5_000 < 0.35, r7["est"]  # ~9.2% sigma at m=128


def test_kmv_below_k_is_exact_and_estimator_reasonable(spark):
    from cdc_connector_spark.ops.sketch import kmv_distinct

    rows = [("small", i) for i in range(20)] + [("big", 100 + i) for i in range(2000)]
    out = {r["grp"]: r for r in kmv_distinct(_keyed(spark, rows), "k", "grp", k=64).collect()}
    assert out["small"]["n_sketch"] == 20
    assert out["small"]["est_distinct"] == 20.0  # sketch IS the set below k
    assert out["small"]["kth_hash"] is None
    # k=64 estimator: sigma ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert abs(out["big"]["est_distinct"] - 2000) / 2000 < 0.40


def test_kmv_sketch_is_union_mergeable(spark):
    """The KMV scale contract: sketch(A ∪ B) == truncate_k(sketch(A) ∪
    sketch(B)) — merging sketches loses nothing vs sketching the merged
    input. This is what lets executors sketch partitions independently."""
    from cdc_connector_spark.ops.sketch import kmv_sketch

    a = [("g", i) for i in range(500)]
    b = [("g", 250 + i) for i in range(500)]  # overlapping
    k = 32
    sk_union = kmv_sketch(_keyed(spark, a + b), "k", "grp", k=k)
    got_union = sorted(r["h"] for r in sk_union.collect())
    sk_a = {r["h"] for r in kmv_sketch(_keyed(spark, a), "k", "grp", k=k).collect()}
    sk_b = {r["h"] for r in kmv_sketch(_keyed(spark, b), "k", "grp", k=k).collect()}
    merged = sorted(sk_a | sk_b)[:k]
    assert got_union == merged


def test_kmv_jaccard_extremes_and_floor_units(spark):
    from cdc_connector_spark.ops.sketch import kmv_jaccard

    rows = [("x", i) for i in range(100)]
    rows += [("y", i) for i in range(100)]          # identical to x
    rows += [("z", 10_000 + i) for i in range(100)]  # disjoint from both
    out = {(r["grp_a"], r["grp_b"]): r for r in
           kmv_jaccard(_keyed(spark, rows), "k", "grp", k=64).collect()}
    assert out[("x", "y")]["est_jaccard_micro"] == 1_000_000
    assert out[("x", "y")]["inter_exact"] == 100 and out[("x", "y")]["union_exact"] == 100
    assert out[("x", "z")]["est_jaccard_micro"] == 0
    assert out[("x", "z")]["inter_exact"] == 0 and out[("x", "z")]["union_exact"] == 200
    # floor division in exact integer micro units
    m, u = out[("y", "z")]["matched"], out[("y", "z")]["u_size"]
    assert out[("y", "z")]["est_jaccard_micro"] == m * 1_000_000 // u
