"""Property tests for the round-6 text operators: randomized (seeded)
corpora checked against straight-line Python re-implementations of the
same documented rules — the engine-independence property the DuckDB
oracle checks on the fixtures, exercised across random shapes.

Float-summing operators (dsir, bigram_nll) compare with a small absolute
tolerance: Spark's partial-sum order differs from sequential Python, so
the rounded 6-decimal values can sit one ulp apart at a rounding
boundary. hash_embed compares EXACTLY — its norms are integer-valued
doubles, so no float-order caveat exists (the operator's design claim).
"""

from __future__ import annotations

import math
import random
from collections import Counter

from cdc_connector_spark.ops.textstats import dsir_scores, hash_embed, repetition_stats

WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta", "iota"]


def _rand_corpus(rng, n_docs=40, max_len=30):
    rows = []
    for i in range(n_docs):
        n = rng.randrange(0, max_len)
        rows.append((i, " ".join(rng.choice(WORDS) for _ in range(n))))
    return rows


def test_dsir_matches_python_reference(spark):
    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = [(i, t, rng.random() < 0.4) for i, t in _rand_corpus(rng)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, is_t boolean")
    got = {r["doc_id"]: r for r in dsir_scores(df, F.col("is_t")).collect()}

    raw: Counter = Counter()
    tgt: Counter = Counter()
    for _, t, is_t in rows:
        toks = t.lower().split()
        raw.update(toks)
        if is_t:
            tgt.update(toks)
    nr, nt, v = sum(raw.values()), sum(tgt.values()), len(raw)
    for i, t, _ in rows:
        toks = t.lower().split()
        want = sum(
            math.log((tgt.get(w, 0) + 1) / (nt + v)) - math.log((raw[w] + 1) / (nr + v))
            for w in toks
        )
        assert abs(got[i]["dsir_score"] - round(want, 6)) <= 2e-6, i
        assert got[i]["n_tokens"] == len(toks), i


def test_hash_embed_matches_python_reference_exactly(spark):
    rng = random.Random(5)
    rows = _rand_corpus(rng, n_docs=30)
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    dim = 8
    got = {r["doc_id"]: r["embedding"] for r in hash_embed(df, dim=dim).collect()}

    import hashlib

    def h60(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    for i, t in rows:
        toks = t.lower().split()
        if not toks:
            assert i not in got
            continue
        acc = [0.0] * dim
        for w in toks:
            hv = h60(w)
            acc[hv % dim] += -1.0 if hv % (2 * dim) >= dim else 1.0
        norm = math.sqrt(sum(x * x for x in acc))
        want = [round(x / norm, 6) for x in acc]
        assert got[i] == want, i  # EXACT: integer-valued norms


def test_repetition_stats_matches_python_reference(spark):
    rng = random.Random(9)
    rows = []
    for i in range(30):
        n_lines = rng.randrange(0, 4)
        lines = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randrange(1, 8)))
            for _ in range(n_lines)
        ]
        if lines and rng.random() < 0.5:
            lines.append(lines[0])  # planted duplicate line
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    for i, t in rows:
        toks = t.split()
        lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
        r = got[i]
        assert r["n_lines"] == len(lines), i
        if lines:
            assert abs(
                r["dup_line_frac"] - round(1 - len(set(lines)) / len(lines), 6)
            ) <= 2e-6, i
        for k, col in ((2, "dup_2gram_frac"), (3, "dup_3gram_frac"), (4, "dup_4gram_frac")):
            grams = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
            want = round(1 - len(set(grams)) / len(grams), 6) if grams else 0.0
            assert abs(r[col] - want) <= 2e-6, (i, k)
        bigrams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        if bigrams:
            cnt = Counter(bigrams)
            top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            assert r["top_2gram"] == top[0], i
            assert abs(r["top_2gram_frac"] - round(top[1] / len(bigrams), 6)) <= 2e-6, i
        else:
            assert r["top_2gram"] == "" and r["top_2gram_frac"] == 0.0, i
