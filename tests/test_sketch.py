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
