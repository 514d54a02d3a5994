"""ops/classifier.py — model-based quality filtering.

Plants a separable curated-vs-gibberish corpus, trains on one half, and
pins held-out behavior: accuracy, score ordering, and the deterministic
Pareto keep rule.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.classifier import (
    pareto_quality_filter,
    score_quality,
    train_quality_classifier,
)

CURATED_WORDS = (
    "the of and to in is that with for as history science people world "
    "government time country water language among between great known"
).split()
CRAWL_WORDS = (
    "zxq wvv qqj klp mnx bbz ttk rrw ggh ffd ssa ppo iiu yyt eer uum "
    "click here buy cheap viagra casino winner prize free offer now"
).split()


def _doc(rng: random.Random, words, n=30) -> str:
    return " ".join(rng.choice(words) for _ in range(n))


@pytest.fixture(scope="module")
def labeled(spark):
    rng = random.Random(7)
    rows = []
    for i in range(120):
        rows.append((i, _doc(rng, CURATED_WORDS), 1))
    for i in range(120, 240):
        rows.append((i, _doc(rng, CRAWL_WORDS), 0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, label int")


def test_classifier_separates_held_out(labeled):
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    model = train_quality_classifier(train, label_col="label")
    scored = score_quality(test, model).join(test.select("doc_id", "label"), "doc_id")
    agg = scored.select(
        F.avg(
            (
                (F.col("quality_prob") > 0.5).cast("int") == F.col("label")
            ).cast("double")
        ).alias("acc"),
        F.avg(F.when(F.col("label") == 1, F.col("quality_prob"))).alias("p_cur"),
        F.avg(F.when(F.col("label") == 0, F.col("quality_prob"))).alias("p_crawl"),
    ).collect()[0]
    assert agg["acc"] >= 0.95, agg["acc"]
    assert agg["p_cur"] > 0.8 > 0.2 > agg["p_crawl"]


def test_scores_are_probabilities_for_every_doc(labeled):
    model = train_quality_classifier(labeled, label_col="label")
    scored = score_quality(labeled, model)
    assert scored.count() == 240
    bad = scored.filter(
        (F.col("quality_prob") < 0) | (F.col("quality_prob") > 1)
    ).count()
    assert bad == 0


def test_pareto_filter_deterministic_and_monotone(spark):
    # synthetic scores: high scores keep ~always, low scores rarely
    rows = [(i, 0.99) for i in range(500)] + [(i, 0.01) for i in range(500, 1000)]
    scores = spark.createDataFrame(rows, "doc_id bigint, quality_prob double")
    a = set(r["doc_id"] for r in pareto_quality_filter(scores).collect())
    b = set(r["doc_id"] for r in pareto_quality_filter(scores).collect())
    assert a == b  # hash-derived draw: reproducible corpus builds
    high = sum(1 for i in a if i < 500)
    low = len(a) - high
    assert high > 450  # high scorers almost always survive
    assert 0 < low < 250  # the famous long tail: some junk survives, not much
    # a different salt reselects a DIFFERENT tail
    c = set(r["doc_id"] for r in pareto_quality_filter(scores, salt=1).collect())
    assert c != a


def test_pareto_draw_independent_of_selection_hash(spark):
    """Regression: the Pareto draw must use its own multiplier. With the
    selection hash, composing after hash_sample (which keeps the SMALLEST
    selection hashes) gives every survivor a tiny draw and the famous
    low-score long tail vanishes entirely."""
    from cdc_connector_spark.ops.corpus import hash_sample

    scores = spark.range(0, 20000).selectExpr(
        "id as doc_id", "0.5 as quality_prob"
    )
    sampled = hash_sample(scores, pct=10)
    n_sampled = sampled.count()
    assert n_sampled > 1000
    kept = pareto_quality_filter(sampled).count()
    # P(keep | prob=0.5) ~ 2.6%: with an independent draw some survive;
    # under the correlated-draw bug this is exactly 0
    assert kept > 0
    assert kept < 0.1 * n_sampled  # and it stays a tail, not a flood


def test_score_quality_linear_matches_python(spark):
    """Fixed-weight scoring (the driver-verifiable twin of the fitted
    pipeline): exact sigmoid left-fold vs a Python re-derivation."""
    import math

    from cdc_connector_spark.ops.classifier import score_quality_linear

    weights = {"good": 1.5, "bad": -2.0, "the": 0.1}
    rows = [
        (0, "The GOOD good text"),
        (1, "bad bad stuff"),
        (2, ""),
        (3, None),
        (4, "neutral words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["quality_prob"] for r in score_quality_linear(df, weights, bias=0.25).collect()}

    def expect(text):
        z = 0.25
        for t in (text or "").strip().lower().split():
            z += weights.get(t, 0.0)
        return round(1.0 / (1.0 + math.exp(-z)), 6)

    assert got == {i: expect(t) for i, t in rows}
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        score_quality_linear(df, {})
