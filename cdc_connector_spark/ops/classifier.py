"""Model-based quality filtering — the curated-vs-crawl classifier.

The heuristic filters (``textstats.gopher_quality``, ``quality_score``,
``repetition_stats``) catch structural junk; the classifier family catches
*distributional* junk: GPT-3/LLaMA-style pipelines train a linear model to
distinguish a trusted corpus (Wikipedia/books/curated) from raw crawl and
keep crawl documents the model scores as "looks curated". This module is
that step on Spark MLlib primitives:

- features: ``HashingTF`` over the shared whitespace tokenizer — a
  STATELESS feature map (no vocabulary build, no fit step, no driver
  state), so featurization is a pure scan at any corpus size;
- model: ``LogisticRegression`` (MLlib's distributed L-BFGS — each
  iteration is one map-reduce pass of partial gradients; the corpus never
  shuffles);
- scoring: one scan through the fitted pipeline; the model is a
  ``num_features``-sized coefficient vector riding the closure/broadcast.

Training labels come from the caller (a boolean/0-1 column): typically
1 = docs drawn from the trusted corpus, 0 = raw crawl sample. Train on a
bounded balanced SAMPLE (the standard practice — the decision boundary
needs thousands of examples, not the corpus), score everything.

Verification: ``tests/test_classifier.py`` plants a separable
curated-vs-gibberish corpus and pins held-out accuracy and score
ordering. (No SQL oracle: iterative optimization — same class as BPE and
the streaming operators.)
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_connector_spark.ops.textstats import tokenize


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_features: int = 1 << 18,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> PipelineModel:
    """Fit the curated-vs-crawl classifier on labeled documents.

    ``label_col`` must be 0/1 (1 = trusted/curated). Returns the fitted
    pipeline (tokens are derived internally from ``text_col`` — callers
    never manage intermediate columns). ``num_features`` is the hashing
    width: 2^18 keeps collisions rare up to ~10^6-word vocabularies while
    the coefficient vector stays a 2 MB broadcast."""
    prepared = df.select(
        tokenize(F.lower(F.col(text_col))).alias("__toks"),
        F.col(label_col).cast("double").alias("__label"),
    )
    tf = HashingTF(inputCol="__toks", outputCol="__feat", numFeatures=num_features)
    lr = LogisticRegression(
        featuresCol="__feat",
        labelCol="__label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return Pipeline(stages=[tf, lr]).fit(prepared)


def score_quality(
    df: DataFrame,
    model: PipelineModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_prob): the model's P(curated | doc) for every document
    — one scan, no shuffle; filter or importance-sample on the score
    downstream (the GPT-3 recipe keeps doc if
    ``quality_prob > 1 - np.random.pareto(9)``; a deterministic analogue
    is ``quality_prob`` vs a ``corpus.hash_sample``-style hash uniform)."""
    prepared = df.select(
        F.col(id_col), tokenize(F.lower(F.col(text_col))).alias("__toks")
    )
    scored = model.transform(prepared)
    return scored.select(
        id_col,
        vector_to_array(F.col("probability")).getItem(1).alias("quality_prob"),
    )


def score_quality_linear(
    df: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_prob) under a FIXED linear model — the deterministic
    twin of ``score_quality`` for a model whose coefficients are already
    known (a shipped weight vector, a distilled heuristic, or an exported
    ``LogisticRegression`` coefficient slice):

        quality_prob = sigmoid(bias + Σ_token weights.get(token, 0))

    Same scoring semantics as the fitted-pipeline path (token counts ×
    coefficients through a sigmoid) but with zero fit state, so the whole
    computation is a pure per-row projection: the weight map rides the
    plan as a literal CASE chain (not a map literal — ``map[key]`` errors
    on missing keys under ANSI mode), the per-token lookup + sum is one
    higher-order ``aggregate`` left-fold over the shared tokenizer's
    array — no explode, no join, no shuffle; scan-bound at any corpus
    size. The fold order (bias, then tokens left-to-right) is part of the
    contract so a SQL re-derivation reproduces the exact IEEE doubles;
    rounded to 6 on top."""
    if not weights:
        raise ValueError("weights must be a non-empty {token: coefficient} map")

    def lookup(t):
        case = None
        for term, coef in sorted(weights.items()):
            cond = t == F.lit(term)
            case = F.when(cond, float(coef)) if case is None else case.when(cond, float(coef))
        return case.otherwise(F.lit(0.0))

    toks = tokenize(F.lower(F.col(text_col)))
    z = F.aggregate(toks, F.lit(float(bias)), lambda acc, t: acc + lookup(t))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.select(F.col(id_col), F.round(prob, 6).alias("quality_prob"))


def pareto_quality_filter(
    scores: DataFrame,
    id_col: str = "doc_id",
    prob_col: str = "quality_prob",
    alpha: float = 9.0,
    salt: int = 0,
) -> DataFrame:
    """The GPT-3 appendix-A keep rule, made deterministic: keep a document
    iff ``prob > 1 − pareto(alpha)`` where the Pareto draw is derived from
    an engine-portable multiplicative hash instead of RNG state —
    re-running selects the SAME documents (reproducible corpus builds).
    Low-scoring docs survive occasionally (the long tail the rule is
    famous for), high-scoring docs almost always.

    The draw uses its OWN multiplier (``corpus.DRAW_MULT``), not the
    selection hash: composing this filter after a hash-ranked sampler
    (hash_sample / stratified_sample keep the SMALLEST selection hashes)
    would otherwise correlate u with survival — survivors would all carry
    tiny draws and the long tail would silently vanish."""
    from cdc_connector_spark.ops.corpus import DRAW_MULT, knuth_hash

    h = knuth_hash(id_col, salt, mult=DRAW_MULT)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    # inverse-CDF Pareto (Lomax form): (1-u)^(-1/alpha) - 1
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scores.filter(F.col(prob_col) > F.lit(1.0) - pareto)
