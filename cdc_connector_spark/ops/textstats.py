"""Text-analysis operators for LLM training-data pipelines.

All pure Column expressions (JVM-side, codegen-friendly): at 100 TB these run
inside the parquet scan stage with zero Python round-trips.

- tokenize / token counting (whitespace split; BPE-ish regex variant)
- quality scoring (length / punctuation / stopword / uppercase ratios)
- language ID (stopword-hit n-gram heuristic over a small per-language set)
- document fingerprinting (normalized-text hash + rolling shingle hash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets — a heuristic, not a model; deliberately
# small so the whole operator stays a codegen'd expression
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "es": ("el", "la", "los", "las", "de", "que", "es", "en"),
    "fr": ("le", "la", "les", "des", "est", "dans", "que", "une"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenizer → array<string>; empty/NULL-safe (empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(F.coalesce(c, F.lit("")))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish regex tokenizer: words, numbers, and single punctuation marks
    each count as a token (approximates subword tokenizer counts)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        F.coalesce(c, F.lit("")), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def word_ngrams(toks: Column, k: int) -> Column:
    """Space-joined word k-grams of a token array, built as a chain of
    shifted-slice ``zip_with``s — O(n) per row and codegen-friendly.

    The obvious ``transform(sequence(1, n-k+1), i -> concat_ws(' ',
    slice(toks, i, k)))`` form produces the SAME strings but evaluates
    ``slice``/``element_at`` per position inside an interpreted lambda —
    O(n²) per document and ~7× slower end-to-end at sf0.1 (measured on
    the repetition/bigram queries); never use it in a hot path."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out = toks
    n = F.size(toks)
    for j in range(2, k + 1):
        m = F.greatest(n - F.lit(j - 1), F.lit(0))
        out = F.zip_with(
            F.slice(out, 1, m),
            F.slice(toks, j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return out


def stopword_count(tokens: Column, lang: str) -> Column:
    """Tokens (with duplicates) that are stopwords of ``lang``."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(words, t)))


def language_id(col: Column | str, langs: tuple[str, ...] = ("en", "es", "fr", "de", "zh")) -> Column:
    """Predicted language = argmax of per-language stopword hit counts.

    Deterministic tie-break: first language in ``langs`` order wins.
    For zh (no whitespace) we count substring occurrences of each stopword
    character instead of token hits.
    """
    c = F.col(col) if isinstance(col, str) else col

    # r15 optimization round: the token array AND the per-language score
    # vector are each bound once via single-element transform(array(x))
    # let-scopes — the old form re-ran tokenize per language and every
    # stopword filter twice (once inside greatest(), once in the CASE
    # chain), because CSE does not reach across higher-order functions.
    # Identical expressions otherwise → identical output.
    def score_vec(T):
        scores = []
        for lang in langs:
            if lang == "zh":
                s = sum(
                    (F.length(c) - F.length(F.replace(c, F.lit(w), F.lit("")))).cast("long")
                    for w in STOPWORDS["zh"]
                )
            else:
                s = stopword_count(T, lang).cast("long")
            scores.append(s)
        return F.array(*scores)

    def pick(S):
        best = F.array_max(S)
        expr = F.lit("und")
        # build reversed CASE chain so earlier langs win ties
        for i, lang in reversed(list(enumerate(langs))):
            expr = F.when(
                (F.element_at(S, i + 1) == best) & (best > 0), F.lit(lang)
            ).otherwise(expr)
        return expr

    scores_arr = F.transform(F.array(tokenize(F.lower(c))), score_vec)[0]
    return F.transform(F.array(scores_arr), pick)[0]


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality score combining:
    - length factor          (≥200 chars → full credit)
    - mean token length sanity (3..12 chars)
    - stopword presence      (any 'en' stopword ratio ≥ 2%)
    - alpha ratio            (letters+spaces / all chars)
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(F.coalesce(c, F.lit("")))
    alpha = F.length(F.regexp_replace(F.coalesce(c, F.lit("")), r"[^A-Za-z ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))

    # token array bound once via a let-scope (r15 optimization round:
    # CSE does not reach across higher-order functions — the old form
    # re-ran tokenize for n_toks, mean_tok and the stopword filter)
    def inner(T):
        n_toks = F.size(T)
        mean_tok = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
        sw = stopword_count(T, "en")
        length_f = F.least(n_chars / F.lit(200.0), F.lit(1.0))
        tok_f = F.when((mean_tok >= 3) & (mean_tok <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
        sw_f = F.when(
            n_toks > 0, F.least(sw / (n_toks * F.lit(0.02)), F.lit(1.0))
        ).otherwise(F.lit(0.0))
        return length_f * 0.3 + tok_f * 0.2 + sw_f * 0.2 + alpha_ratio * 0.3

    return F.transform(F.array(tokenize(c)), inner)[0].cast("double")


def gopher_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 — the
    standard pretraining corpus filter family), as one codegen projection:

    - ``n_words``: whitespace token count (rule: within [min, max] bounds)
    - ``mean_word_len``: non-whitespace chars / words (rule: sane 2..12)
    - ``alpha_word_ratio``: fraction of words containing a letter (rule: >0.7)
    - ``trigram_dup_ratio``: 1 − distinct/total word trigrams — the
      repetition rule that kills boilerplate and keyword-stuffed pages
    - ``keep``: the conjunction, thresholds per the fixture's scale

    All metrics are higher-order array expressions on one tokenize pass —
    no Python, no shuffle, scan-bound at any corpus size. Thresholds are
    arguments in spirit; fixed here so the engine-portable SQL twin (the
    correctness oracle) states the same rule set.

    r15 optimization round: the token array is bound ONCE via a
    single-element ``transform(array(x), λ)`` let-scope (Catalyst CSE
    does not reach across higher-order functions — the old projection
    re-evaluated tokenize per metric), and the trigram dup ratio counts
    DISTINCT chained-xxhash64 gram hashes instead of building gram
    strings (counts are hash-agnostic; the ``repetition_stats``
    argument). Byte-identical output, same zero-shuffle plan.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    non_ws = F.length(F.regexp_replace(c, r"\s+", ""))

    def inner(T):
        n_words = F.size(T)
        mean_wl = F.when(n_words > 0, non_ws / n_words).otherwise(F.lit(0.0))
        alpha_words = F.size(F.filter(T, lambda t: t.rlike("[A-Za-z]")))
        alpha_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(
            F.lit(0.0)
        )
        n_tri = F.greatest(n_words - F.lit(2), F.lit(0))
        h = F.transform(T, lambda t: F.xxhash64(t))
        m = F.greatest(n_words - F.lit(2), F.lit(0))
        tri = F.slice(h, 1, m)
        for j in range(2, 4):
            tri = F.zip_with(
                tri,
                F.slice(h, j, m),
                lambda a, b: F.xxhash64(a, F.coalesce(b, F.lit(0).cast("long"))),
            )
        dup_ratio = F.when(
            n_tri > 0, F.lit(1.0) - F.size(F.array_distinct(tri)) / n_tri
        ).otherwise(F.lit(0.0))
        keep = (
            (n_words >= 30)  # Gopher's 50-word floor scaled to the fixture
            & (mean_wl >= 2.0)
            & (mean_wl <= 12.0)
            & (alpha_ratio > 0.7)
            & (dup_ratio < 0.6)
        )
        return F.struct(
            n_words.cast("long").alias("n_words"),
            F.round(mean_wl, 6).alias("mean_word_len"),
            F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
            F.round(dup_ratio, 6).alias("trigram_dup_ratio"),
            keep.alias("keep"),
        )

    s = F.transform(F.array(tokenize(text_col)), inner)[0]
    return df.select(
        F.col(id_col),
        s["n_words"].alias("n_words"),
        s["mean_word_len"].alias("mean_word_len"),
        s["alpha_word_ratio"].alias("alpha_word_ratio"),
        s["trigram_dup_ratio"].alias("trigram_dup_ratio"),
        s["keep"].alias("keep"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher repetition signals (Rae et al. 2021 §A1.1 — the "repetition
    removal" rule family that complements ``gopher_quality``'s single
    trigram ratio): per document,

    - ``n_lines``: non-empty trimmed lines (split on newline)
    - ``dup_line_frac``: 1 − distinct/total lines — boilerplate detector
      (navigation chrome, repeated headers)
    - ``dup_{2,3,4}gram_frac``: 1 − distinct/total word n-grams — local
      phrase looping (the degenerate-generation signature)
    - ``top_2gram`` / ``top_2gram_frac``: the most frequent word bigram
      (ties → lexicographically smallest) and the fraction of all bigram
      slots it occupies — keyword stuffing concentrates mass in one n-gram
      even when overall dup fractions stay moderate

    Execution: ONE zero-shuffle projection (r15 — the bench protocol-v2
    fix exposed the old plan's real cost: explode → groupBy(doc, bigram)
    → groupBy(doc) → join back shuffled ~n_words rows per document
    twice and re-scanned the text for the join side, ~6 s at sf0.1
    against ~1 s for this form; at 100 TB that was a full-corpus
    token-count shuffle for a per-document statistic). The top bigram
    is found per row by sorting the bigram array and folding it with
    ``F.aggregate``: runs of equal bigrams are contiguous after the
    sort, the fold carries (prev, run, best_n, best_bg), and a strictly
    greater run replaces the best — which IS the (count desc, bigram
    asc) winner, because ascending order means the smaller of two
    equally-frequent bigrams reaches any given count first. Fractions
    are rounded to 6 so the engine-portable SQL twin hash-matches.

    r15 optimization round (6.6 s → 1.2 s at sf0.1, byte-identical
    output): the dup fractions only need DISTINCT-vs-total COUNTS, so
    the 2/3/4-gram arrays are built as chained ``xxhash64`` combines
    (fixed-width longs instead of concatenated strings — the
    ``hashed_shingles`` rule; a collision can only merge two gram
    groups, ~n²/2⁻⁶⁴, and the value-verified oracle pins the fixture),
    and each gram level EXTENDS the previous one (3 zip_withs total
    instead of 6). Because Catalyst's subexpression elimination does
    not reach across higher-order functions, the shared intermediates
    (token array, hash array, each gram level) are bound ONCE via
    single-element ``transform(array(x), λ)`` scopes — a let-binding:
    the lambda argument is evaluated once and every reference inside
    the lambda reads the bound value. The old form re-evaluated
    tokenize ~6× and built every gram level from scratch. The top
    bigram still folds the sorted STRING bigrams (it is an output
    column).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0, F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(F.lit(0.0))

    def frac(g: Column) -> Column:
        total = F.size(g)
        return F.round(
            F.when(
                total > 0, F.lit(1.0) - F.size(F.array_distinct(g)) / total
            ).otherwise(F.lit(0.0)),
            6,
        )

    def _fold_step(acc, x):
        nr = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            nr.alias("run"),
            F.when(nr > acc["bestn"], nr).otherwise(acc["bestn"]).alias("bestn"),
            F.when(nr > acc["bestn"], x).otherwise(acc["bestbg"]).alias("bestbg"),
        )

    def inner(T):
        H = F.transform(T, lambda t: F.xxhash64(t))

        def level(prev, j):
            # k-gram hashes from the (k-1)-gram level: combine with the
            # token hash at offset j (same chain as hashed_shingles)
            m = F.greatest(F.size(T) - F.lit(j - 1), F.lit(0))
            return F.zip_with(
                F.slice(prev, 1, m),
                F.slice(H, j, m),
                lambda a, b: F.xxhash64(a, F.coalesce(b, F.lit(0).cast("long"))),
            )

        def g2scope(G2):
            def g3scope(G3):
                def g4scope(G4):
                    n_toks = F.size(T)
                    top = F.aggregate(
                        F.array_sort(word_ngrams(T, 2)),
                        F.struct(
                            F.lit("").alias("prev"),
                            F.lit(0).alias("run"),
                            F.lit(0).alias("bestn"),
                            F.lit("").alias("bestbg"),
                        ),
                        _fold_step,
                    )
                    n_bigrams = F.greatest(n_toks - F.lit(1), F.lit(0))
                    return F.struct(
                        frac(G2).alias("d2"),
                        frac(G3).alias("d3"),
                        frac(G4).alias("d4"),
                        top["bestbg"].alias("topbg"),
                        F.round(
                            F.when(
                                n_bigrams > 0,
                                top["bestn"] / n_bigrams.cast("double"),
                            ).otherwise(F.lit(0.0)),
                            6,
                        ).alias("topfrac"),
                    )

                return F.transform(F.array(level(G3, 4)), g4scope)[0]

            return F.transform(F.array(level(G2, 3)), g3scope)[0]

        return F.transform(F.array(level(H, 2)), g2scope)[0]

    s = F.transform(F.array(tokenize(text_col)), inner)[0]
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        F.round(dup_line, 6).alias("dup_line_frac"),
        s["d2"].alias("dup_2gram_frac"),
        s["d3"].alias("dup_3gram_frac"),
        s["d4"].alias("dup_4gram_frac"),
        s["topbg"].alias("top_2gram"),
        s["topfrac"].alias("top_2gram_frac"),
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of case/punctuation/whitespace-normalized text.

    Robust to formatting-only edits; used as the exact-dedup key.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"[^a-z0-9]+", " ")
    return F.md5(F.trim(norm))


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf): lowercased whitespace terms with per-document counts.
    One explode + one aggregation — the inverted-index building block for
    tf-idf / BM25. Shuffles once on (id, term); term payloads are short
    strings, never document bodies."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_tf: int = 1
) -> DataFrame:
    """Per-(document, term) tf-idf: ``tf * ln(N / df)`` with N = corpus doc
    count, df = number of docs containing the term — the classic weighting,
    stated plainly so the SQL twin can re-derive it verbatim.

    Shape: term frequencies (one shuffle), document frequencies as an agg
    over them (second shuffle on term), then an equi-join of the (term,
    df) side — NO broadcast hint (r12 review): the df table is
    VOCABULARY-sized, and a web corpus's vocabulary is itself
    corpus-scale (the tf=1 tail); a forced broadcast that fits at
    fixture scale OOMs the driver at 100 TB, while the plain join
    co-partitions on term and AQE still broadcasts when it measures
    small. The single-row N rides a broadcast. ``min_tf`` prunes the
    long tail before the join (at 100 TB the tf=1 tail dominates rows
    but carries ~no ranking signal)."""
    tf = term_frequencies(df, text_col, id_col).filter(F.col("tf") >= min_tf)
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.countDistinct(F.col(id_col)).alias("__n"))
    return (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df"))).alias("tfidf"),
        )
    )


def dsir_scores(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance scores for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169 — simplified from hashed n-gram features to the
    unigram bag so the whole derivation is engine-portable and
    value-verifiable): every document is scored by the log-likelihood
    ratio between a TARGET distribution (rows where the ``target`` boolean
    column expression holds — e.g. a trusted domain) and the RAW corpus
    distribution, both Laplace-smoothed over the raw vocabulary:

        score(D) = Σ_{(w, c) ∈ D} c · [ln p_t(w) − ln p_r(w)]
        p_t(w)   = (c_t(w) + 1) / (N_t + V)
        p_r(w)   = (c_r(w) + 1) / (N_r + V)

    High scores ≈ "looks like the target domain"; resampling the corpus ∝
    exp(score) (or just taking the top slice) is the DSIR selection step —
    compose with ``corpus.weighted_sample`` / ``corpus.hash_sample``.

    Shape: ONE postings lineage (explode → per-(doc,term) count) feeds
    both distributions — the per-term corpus and target counts are
    WINDOW sums over that same frame partitioned by term (a
    join-against-own-aggregate here would defeat Spark's exchange reuse
    via differential column pruning and re-derive the postings three
    times — the unigram_nll lesson); the (N_r, N_t, V) scalars come from
    one slim second scan (count / conditional count / distinct-term
    count, no doc ids) and ride a broadcast; the final per-doc sum is the
    last exchange. Token-less docs surface with score 0, not dropped (a
    selection step must see every candidate)."""
    from pyspark.sql import Window

    postings = (
        df.select(
            F.col(id_col),
            target.alias("__t"),
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy(id_col, "__t", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("term")
    scored = postings.withColumn("c_r", F.sum("c").over(w)).withColumn(
        "c_t", F.sum(F.when(F.col("__t"), F.col("c")).otherwise(F.lit(0))).over(w)
    )
    scalars = df.select(
        target.alias("__t"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    ).agg(
        F.count(F.lit(1)).alias("__nr"),
        F.sum(F.when(F.col("__t"), F.lit(1)).otherwise(F.lit(0))).alias("__nt"),
        F.countDistinct("term").alias("__v"),
    )
    lr = F.log(
        (F.col("c_t") + 1).cast("double") / (F.col("__nt") + F.col("__v"))
    ) - F.log((F.col("c_r") + 1).cast("double") / (F.col("__nr") + F.col("__v")))
    scores = (
        scored.crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(F.sum(F.col("c") * lr), 6).alias("dsir_score"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("dsir_score"), F.lit(0.0)).alias("dsir_score"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document to a bag of query terms (Robertson/
    Sparck Jones, the Lucene-default ranking function):

        score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))

    Only documents containing ≥1 query term are returned (score > 0). The
    term-frequency frame is filtered to the query terms FIRST, so the
    per-term join touches O(matching postings), not the corpus vocabulary;
    doc length and the (N, avgdl) scalars ride broadcasts."""
    terms = sorted({t.lower() for t in query_terms})
    tf = term_frequencies(df, text_col, id_col).filter(F.col("term").isin(terms))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = df.select(
        F.col(id_col), F.size(tokenize(F.lower(F.col(text_col)))).alias("__dl")
    )
    stats = dl.agg(
        F.countDistinct(F.col(id_col)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("bm25"), F.count(F.lit(1)).alias("n_query_terms_hit"))
    )


def unigram_nll(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram language-model negative log-likelihood — the
    CCNet-style LM quality signal (Wenzek 2020 buckets CommonCrawl by KenLM
    perplexity; the unigram model is the distributed, dependency-free
    proxy): train p(t) = count(t) / total on the corpus ITSELF, then

        nll(D) = Σ_t tf(t,D) · (−ln p(t)) / |D|

    Low nll ⇒ common-word text; high nll ⇒ rare-token soup (a strong
    boilerplate/gibberish discriminator at corpus scale). Perplexity is
    e^nll — monotone, so filters threshold nll directly.

    Shape: ONE postings lineage — tf (one (id, term) shuffle), corpus
    counts as a window-sum over the same frame partitioned by term (no
    second derivation of the explode: a join-against-own-aggregate here
    defeats Spark's exchange reuse because column pruning differentiates
    the subtrees, and the corpus would be scanned and shuffled twice).
    The total-token denominator comes from a separate SLIM scan
    (sum of doc lengths — scan + partial agg, no postings shuffle) and
    rides a broadcast. Final per-doc agg is the third and last exchange.
    No driver-side vocabulary, no Python."""
    from pyspark.sql import Window

    tf = term_frequencies(df, text_col, id_col)
    scored = tf.withColumn("ct", F.sum("tf").over(Window.partitionBy("term")))
    # Σ len(doc) ≡ Σ tf — the cheap way to the same scalar
    total = df.select(
        F.sum(F.size(tokenize(F.lower(F.col(text_col))))).alias("__total")
    )
    return (
        scored.crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (
                F.sum(
                    F.col("tf")
                    * -F.log(F.col("ct").cast("double") / F.col("__total"))
                )
                / F.sum("tf")
            ).alias("nll"),
        )
        .select(F.col(id_col), "n_tokens", F.round("nll", 6).alias("nll"))
    )


def hash_embed(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    dense: bool = True,
) -> DataFrame:
    """Feature-hashing document embeddings (Weinberger et al. 2009, the
    'hashing trick' with a sign hash) — the in-engine text→vector bridge:
    every token maps to a dimension and a ±1 sign via a PORTABLE
    md5-derived 60-bit hash (the ``simhash_portable`` scheme — bit-identical
    in any SQL engine), occurrences accumulate signed counts, and the
    vector is L2-normalized. No model, no driver state, no RNG: the same
    corpus embeds to the SAME vectors anywhere, so the output plugs
    straight into ``cluster.kmeans_*`` / ``ann.*`` / SemDedup and the
    whole derivation is value-verifiable.

    Exactness note: the signed counts are small integers and the squared
    norm is therefore an EXACT integer-valued double, so ``val/norm`` is
    bit-identical across engines — no float-order caveat at all (rounding
    to 6 is presentation, not protection).

    ``dense=True`` → (id, embedding array<double>); ``dense=False`` → the
    long form (id, dim_idx, val) of the non-zero dims (the oracle-friendly
    shape). Token-less docs produce no row. One explode shuffle keyed by
    (id, dim_idx) + a per-doc norm window; the dense assembly is a per-doc
    map — never a pivot, never a collect."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col), F.explode(tokenize(F.lower(F.col(text_col)))).alias("tk")
    )
    h = F.conv(F.substring(F.md5(F.col("tk")), 1, 15), 16, 10).cast("long")
    sparse = (
        tok.select(
            F.col(id_col),
            F.pmod(h, F.lit(dim)).cast("int").alias("dim_idx"),
            F.when(F.pmod(h, F.lit(2 * dim)) >= dim, F.lit(-1.0))
            .otherwise(F.lit(1.0))
            .alias("s"),
        )
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("s").alias("v"))
    )
    w = Window.partitionBy(id_col)
    # a doc whose signed counts cancel in EVERY dimension has zero norm
    # (~1/(2·dim) of 2-token docs): dividing would be NULL/NaN/ANSI-error
    # depending on the engine — such docs carry zero feature information,
    # so they drop like token-less docs (filter BEFORE the division)
    normed = (
        sparse.withColumn("__nrm", F.sqrt(F.sum(F.col("v") * F.col("v")).over(w)))
        .filter(F.col("__nrm") > 0)
        .withColumn("val", F.round(F.col("v") / F.col("__nrm"), 6))
        .select(id_col, "dim_idx", "val")
    )
    if not dense:
        return normed
    assembled = normed.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("dim_idx"), F.col("val")))
        ).alias("__m")
    )
    return assembled.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(F.element_at("__m", i.cast("int")), F.lit(0.0)),
        ).alias("embedding"),
    )


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document interpolated bigram LM negative log-likelihood — the
    next step up from ``unigram_nll`` (word-ORDER quality: shuffled or
    templated text scores fine under a unigram model but poorly here):

        p(w2|w1) = λ·c(w1,w2)/c(w1,·) + (1−λ)·c(·,w2)/N_b
        nll(D)   = Σ_pairs c_D(w1,w2) · −ln p(w2|w1)  /  |pairs(D)|

    trained on the corpus itself, with the unigram backoff taken from
    SUCCESSOR counts (c(·,w2)/N_b over the same bigram frame) so the whole
    statistic derives from ONE bigram-postings lineage. Docs with < 2
    tokens have no bigram and produce no row (the unigram_nll convention).

    Shape: one (doc, w1, w2) postings shuffle, then the corpus pair /
    context / successor totals as three WINDOW sums over that same frame
    (no join-against-own-aggregate — the unigram_nll lesson), the N_b
    scalar from a slim second scan riding a broadcast, and the per-doc agg
    as the last exchange. All JVM-side."""
    from pyspark.sql import Window

    toks = tokenize(F.lower(F.col(text_col)))
    n = F.size(toks)
    # shifted-slice zip (O(n), codegen) — the transform(sequence)+element_at
    # form is O(n²) interpreted and measured 7× slower; see word_ngrams
    m = F.greatest(n - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    postings = (
        df.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        postings.withColumn(
            "cp", F.sum("c").over(Window.partitionBy("w1", "w2"))
        )
        .withColumn("cw1", F.sum("c").over(Window.partitionBy("w1")))
        .withColumn("cw2", F.sum("c").over(Window.partitionBy("w2")))
    )
    total = df.select(
        F.sum(
            F.greatest(F.size(tokenize(F.lower(F.col(text_col)))) - 1, F.lit(0))
        ).alias("__nb")
    )
    p = F.lit(lam) * F.col("cp").cast("double") / F.col("cw1") + F.lit(
        1.0 - lam
    ) * F.col("cw2").cast("double") / F.col("__nb")
    return (
        scored.crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.round((F.sum(F.col("c") * -F.log(p)) / F.sum("c")), 6).alias("nll2"),
        )
    )


def encode_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """Encode documents to token-id sequences using a ``build_vocab`` frame —
    the docs→ids step between vocabulary building and sequence packing.
    Out-of-vocabulary tokens map to ``unk_id``. Returns (id, n_tokens,
    token_ids) with the sequence as a comma-joined string (order = token
    position; exact and engine-portable). Empty documents produce no row,
    matching the tokenizer's view that they contribute no sequence.

    Shape: one posexplode shuffle on (id, token); the vocabulary is
    broadcast (it is capped by construction — max_size ids), so the join
    adds no shuffle; one per-doc agg re-assembles the sequence. The
    tokenizer is byte-identical to ``build_vocab``'s (raw, not lowercased),
    so ids round-trip."""
    toks = df.select(
        F.col(id_col), F.posexplode(tokenize(text_col)).alias("pos", "token")
    )
    enc = toks.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    tid = F.coalesce(F.col("token_id"), F.lit(unk_id)).alias("tid")
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), tid))),
                lambda s: s["tid"].cast("string"),
            ),
            ",",
        ).alias("token_ids"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats frame: token/char counts, ratios, quality, lang."""
    toks = tokenize(text_col)
    c = F.col(text_col)
    n_chars = F.length(F.coalesce(c, F.lit("")))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        stopword_count(toks, "en").alias("en_stopword_count"),
        quality_score(text_col).alias("quality"),
        language_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def build_vocab(
    df,
    text_col: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
):
    """Tokenizer-prep vocabulary: (token, n_occurrences, token_id) with ids
    assigned by frequency rank (count desc, token asc — fully deterministic,
    so two builds over the same corpus produce identical id assignments, the
    property checkpointed tokenizer training needs).

    Scale shape: explode + one partial-aggregated groupBy on token (the
    heavy, corpus-sized pass); the RANKING runs on the aggregated vocab
    (types, not tokens — orders of magnitude smaller), as a global sort +
    row_number. An unpartitioned window is acceptable exactly because the
    vocab is capped: pass ``max_size`` (standard tokenizer practice) to
    bound it explicitly; the cap is applied AFTER ranking so it is the
    usual top-``max_size`` rule.
    """
    toks = (
        df.select(F.explode(tokenize(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    out = toks.withColumn("token_id", F.row_number().over(w) - 1)
    if max_size is not None:
        out = out.filter(F.col("token_id") < max_size)
    return out


def vocab_coverage(
    df: DataFrame,
    top_ks: list[int] = (10, 100, 1000, 10000),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary coverage curve — the data-card statistic behind every
    ``max_size`` / ``min_count`` vocabulary decision: for each ``k``, the
    share of ALL token occurrences covered by the ``k`` most frequent
    types (Zipf means a few thousand types usually cover >90%; the curve
    says where to cut). Ranking matches ``build_vocab`` exactly (count
    desc, token asc, raw un-lowercased tokens), so a chosen k translates
    directly into a ``build_vocab(max_size=k)`` call.

    Returns (k, covered_tokens, total_tokens, coverage round 6) — one row
    per requested k, ``coverage=1.0`` when k exceeds the vocabulary.
    Shape: one corpus explode → type counts (map-side combined), a
    global rank+cumsum window over the TYPE table (vocab-sized — the
    build_vocab caveat, not a corpus sort), and a tiny per-k aggregate.
    """
    from pyspark.sql import Window

    types = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    ranked = types.withColumn("rk", F.row_number().over(w)).withColumn(
        "cum", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    total = types.agg(F.sum("n").alias("__total"))
    ks = F.explode(F.array(*[F.lit(int(k)) for k in top_ks])).alias("k")
    return (
        ranked.select("rk", "cum").crossJoin(ranked.sparkSession.range(1).select(ks))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(F.max("cum").alias("covered_tokens"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("covered_tokens").cast("bigint").alias("covered_tokens"),
            F.col("__total").cast("bigint").alias("total_tokens"),
            F.round(F.col("covered_tokens") / F.col("__total"), 6).alias("coverage"),
        )
    )


def novelty_scores(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's n-gram
    occurrences whose FIRST corpus appearance (smallest id) is this
    document — "how much genuinely new content does this doc contribute
    after everything before it" (the dedup-quality / memorization-risk
    metric: post-dedup corpora should trend toward 1.0; boilerplate-heavy
    docs sit near 0). Returns (id, n_grams, novelty∈[0,1], rounded 6);
    docs with fewer than ``n`` tokens report (0, 0.0).

    Shape (r15 rework — the old form's "window re-uses the aggregation's
    partitioning" claim was wrong: groupBy(id, g) hashes on (id, g), the
    gram window needed its own hash(g) exchange plus a per-partition
    SORT, and the final roll-up re-aggregated the full postings frame):
    explode n-grams (shifted-slice ``zip_with``, linear per doc) →
    per-(doc, gram) count [shuffle 1, map-side combined] → per-gram
    ``min(struct(id, c))`` [shuffle 2, map-side combined, hash agg — no
    sort; (id, g) is unique per row so the struct min IS the smallest
    id's count] picks each gram's first owner AND how many occurrences
    it owns in one pass → novel-per-doc rolls up |grams| rows, not
    |postings| [shuffle 3, tiny]. ``n_grams`` per doc is
    max(n_tokens − n + 1, 0) straight from the token count — no second
    n-gram construction (building the gram strings twice cost more than
    the old window saved; measured in the r15 A/B). The price is one
    extra text scan for the token count (the old single-lineage window
    amortized it); measured trade at sf0.1 docs: 1.4× slower at 1×
    (1.9 s vs 1.3 s), equal-to-faster at 10×/100× (1.86/9.71 s vs
    2.03/9.78 s) — the sort's growth cancels the scan, and the scan
    can't spill where a hot-gram window sort can.
    novel/n_grams is an exact-integer ratio so the value hash-matches
    any engine."""
    toks = tokenize(F.lower(F.col(text_col)))
    postings = (
        df.select(F.col(id_col), F.explode(word_ngrams(toks, n)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    owners = postings.groupBy("g").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("c").alias("c"))).alias("__w")
    )
    novel = owners.groupBy(F.col("__w.i").alias(id_col)).agg(
        F.sum("__w.c").alias("novel")
    )
    n_grams = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)).cast("bigint")
    return (
        df.select(F.col(id_col), n_grams.alias("n_grams"))
        .join(novel, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.coalesce(F.col("novel"), F.lit(0)) / F.col("n_grams"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("novelty"),
        )
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic two-tailed
    quality heuristic production corpus filters run next to the Gopher
    rules: a ratio near 0 means pathological repetition (boilerplate,
    keyword stuffing — zlib eats it), a ratio near 1 means
    incompressible noise (binary junk, encrypted/garbled text); natural
    prose sits in a stable mid band. Returns (id, n_bytes, ratio) with
    ratio = compressed/raw over UTF-8 bytes; empty docs report
    (0, NULL).

    Execution: one Arrow-batched ``mapInPandas`` kernel (zlib is
    C-speed; the crossing is amortized over the batch — same trade as
    the SimHash kernel). Deterministic for a fixed zlib level, but NOT
    SQL-re-derivable (no DEFLATE in SQL engines), so evidence is
    pytest-pinned ordering, not an oracle row — same class as BPE and
    the classifier fit."""
    import zlib

    from typing import Iterator as _It

    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )

    def gen(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            n_bytes, ratio = [], []
            for text in pdf["__txt"]:
                b = (text or "").encode("utf-8")
                n_bytes.append(len(b))
                ratio.append(
                    len(zlib.compress(b, level)) / len(b) if b else None
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "n_bytes": n_bytes, "ratio": ratio}
            )

    return df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__txt")
    ).mapInPandas(gen, out_schema)


def pmi_bigrams(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information —
    PMI = ln(P(xy) / (P(x)·P(y))) with P(xy) = c_xy/N_bi over corpus
    bigram occurrences and P(x) = c_x/N_uni over corpus unigram
    occurrences (Church & Hanks 1990, the collocation-extraction
    classic). High-PMI pairs are multiword expressions ("new york",
    "machine learning") — the phrase-mining primitive for tokenizer
    vocab curation and boilerplate analysis.

    ``min_count`` prunes rare bigrams BEFORE the join (PMI is notoriously
    noisy at low counts — a 1-occurrence pair of two rare words maxes the
    score); ``top_k`` is a TakeOrderedAndProject, never a full sort.

    Value-portable: counts are exact integers; the score is one double
    expression ln((c_xy·N_uni·N_uni)/(N_bi·c_x·c_y)) evaluated in a
    FIXED shape (single ln of an exact-integer ratio — no float
    accumulation to reorder), rounded to 6.

    Shape: one postings lineage — tokens explode once for unigram counts
    and once (shifted-slice zip_with) for bigram counts; the (term,count)
    sides equi-join onto the bigram table with NO broadcast hint (r12
    review: the unigram table is VOCABULARY-sized — corpus-scale on web
    text — and a forced broadcast that fits at fixture scale OOMs the
    driver at 100 TB; the plain join co-partitions on the term and AQE
    still broadcasts when it measures small). Ties on PMI break by
    bigram text ascending."""
    toks = tokenize(F.lower(F.col(text_col)))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        df.select(F.explode(word_ngrams(toks, 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").alias("__n_uni"))
    n_bi = (
        df.select(F.greatest(F.size(toks) - 1, F.lit(0)).alias("nb"))
        .agg(F.sum("nb").alias("__n_bi"))
    )
    parts = F.split(F.col("bigram"), " ", 2)
    return (
        bi.withColumn("__x", parts[0])
        .withColumn("__y", parts[1])
        .join(uni.withColumnRenamed("w", "__x").withColumnRenamed("c", "c_x"), "__x")
        .join(uni.withColumnRenamed("w", "__y").withColumnRenamed("c", "c_y"), "__y")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "bigram",
            "c_xy",
            "c_x",
            "c_y",
            # doubles FIRST, then multiply (left-assoc, mirrored verbatim in
            # the SQL twin): long products of corpus-sized counts would
            # ANSI-overflow at web scale; the double path is IEEE-identical
            # across engines and exact below 2^53 anyway
            F.round(
                F.log(
                    F.col("c_xy").cast("double")
                    * F.col("__n_uni").cast("double")
                    * F.col("__n_uni").cast("double")
                    / (
                        F.col("__n_bi").cast("double")
                        * F.col("c_x").cast("double")
                        * F.col("c_y").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(top_k)
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document readability profile: sentence count (terminal
    punctuation runs), word count, a syllable PROXY (vowel-group count —
    the standard dictionary-free approximation), and the Flesch
    reading-ease score computed from those proxies:
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).

    An explicit heuristic, not a claim of linguistic truth — the value is
    a STABLE, portable quality signal (the same role as quality_score)
    whose formula any engine can replay: counts are exact integers from
    regexp matches; the score is one fixed double expression, rounded 6.
    Empty docs report NULL score. Codegen projections only — no shuffle,
    no UDF."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = F.size(tokenize(txt))
    # runs of .!? count once (ellipses/interrobangs are one boundary);
    # a final sentence without terminal punctuation still counts
    terminals = F.size(F.regexp_extract_all(txt, F.lit(r"[.!?]+"), F.lit(0)))
    trailing = F.regexp_extract(F.trim(txt), r"[.!?]$", 0) != ""
    sentences = F.when(words == 0, F.lit(0)).otherwise(
        F.greatest(terminals + F.when(trailing, F.lit(0)).otherwise(F.lit(1)), F.lit(1))
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(txt), F.lit(r"[aeiouy]+"), F.lit(0))
    )
    score = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double")),
        6,
    )
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.when(words > 0, score).alias("flesch"),
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram (Shannon) entropy in nats — the
    repetitiveness screen that catches low-diversity spam
    ``repetition_stats``' fixed-gram ratios can miss (a doc cycling 3
    tokens has high distinct-gram ratios at n=1 but entropy ≈ ln 3).

    H = ln(n) − (1/n)·Σ_w c_w·ln(c_w) from EXACT integer token counts;
    each per-token term is one fixed IEEE expression rounded 12 and
    accumulated as DECIMAL(38,12) (the pagerank discipline —
    order-independent exact summation, so the value hash-matches any
    engine); the final expression is one fixed double rounded 6.

    Returns (doc_id, n_tokens, n_distinct, entropy); empty docs are
    absent (no tokens — entropy undefined, stated rather than NULL).
    Shape: one explode + two keyed aggregations; output O(docs)."""
    toks = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("__w")
    )
    counts = toks.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    per = counts.groupBy(id_col).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.round(
                F.col("__c").cast("double") * F.log(F.col("__c").cast("double")), 12
            ).cast("decimal(38,12)")
        ).alias("__s"),
    )
    return per.select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.round(
            F.log(F.col("n_tokens").cast("double"))
            - F.col("__s").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("entropy"),
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 500,
    min_freq: int = 1,
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope/intercept of
    ln(freq) vs ln(rank) for the ``top_k`` most frequent terms — the
    corpus-health scalar (natural text ≈ −1; generated/templated corpora
    drift shallow, token-salad drifts steep). Fitting the top-K ranks is
    the standard practice AND the scale bound: the ordered rank window
    runs over a table already truncated to ``top_k`` rows, never the
    full vocabulary.

    Determinism + portability: rank ties break by (freq DESC, term ASC)
    — a total order; per-rank x/y/xy/xx terms are fixed IEEE expressions
    rounded 12, DECIMAL(38,12)-accumulated; slope and intercept are each
    ONE fixed double expression over the exact sums, rounded 6.

    Returns one row: (n_terms, total_tokens, slope, intercept)."""
    freq = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
        .filter(F.col("__f") >= min_freq)
        .orderBy(F.col("__f").desc(), F.col("__w").asc())
        .limit(top_k)
    )
    from pyspark.sql import Window

    ranked = freq.withColumn(
        "__r",
        F.row_number().over(Window.orderBy(F.col("__f").desc(), F.col("__w").asc())),
    )
    x = F.round(F.log(F.col("__r").cast("double")), 12)
    y = F.round(F.log(F.col("__f").cast("double")), 12)
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("__f").alias("total_tokens"),
        F.sum(x.cast("decimal(38,12)")).alias("__sx"),
        F.sum(y.cast("decimal(38,12)")).alias("__sy"),
        F.sum(F.round(x * y, 12).cast("decimal(38,12)")).alias("__sxy"),
        F.sum(F.round(x * x, 12).cast("decimal(38,12)")).alias("__sxx"),
    )
    k = F.col("n_terms").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    den = k * sxx - sx * sx
    return sums.select(
        "n_terms",
        "total_tokens",
        F.round((k * sxy - sx * sy) / den, 6).alias("slope"),
        F.round((sy - (k * sxy - sx * sy) / den * sx) / k, 6).alias("intercept"),
    )


def normalize_text(
    col: Column | str,
    lowercase: bool = False,
    strip_controls: bool = True,
    collapse_whitespace: bool = True,
    unify_quotes: bool = True,
) -> Column:
    """User-facing text normalization — the corpus-prep cleanup that runs
    BEFORE hashing/tokenizing (``fingerprint`` normalizes destructively
    for a dedup KEY; this produces text you keep):

    - strip C0/C1 control characters (except \\t \\n which become spaces
      via the whitespace pass) — the mojibake/terminal-escape scrub;
    - unify typographic quotes/dashes to ASCII (' ' " " — –  → ' " -),
      the normalization that makes downstream regex/dedup rules see one
      form;
    - collapse all whitespace runs to single spaces and trim;
    - optional lowercasing (OFF by default — case is signal for quality
      scoring and NER-ish rules; turn on only for matching keys).

    One chained ``regexp_replace``/``translate`` projection — pure
    whole-stage codegen, scan-bound at any scale, and every piece is
    expressible in ANSI SQL so the op value-verifies. Patterns avoid
    lookaround (Java regex ↔ RE2 portability, the PII_PATTERNS rule).
    NULL → empty string (stated: cleaning yields a clean EMPTY doc, not
    a NULL hole downstream ops must re-guard)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.coalesce(c, F.lit(""))
    if unify_quotes:
        out = F.translate(
            out,
            "‘’“”–—",
            "''\"\"--",
        )
    if strip_controls:
        out = F.regexp_replace(out, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    if lowercase:
        out = F.lower(out)
    return out


def top_terms_per_source(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 5,
    min_tf: int = 2,
) -> DataFrame:
    """Distinctive vocabulary per source: top-``k`` terms by the
    source-level tf·ln(N_sources/source_df) score — the "what does this
    feed talk about that others don't" readout (corpus exploration,
    source labeling, contamination triage). Terms present in every
    source score 0 and sink; ``min_tf`` drops hapax noise.

    Deterministic total order (score desc, tf desc, term asc); exact
    integer counts, ONE ln expression rounded 6. The rank window runs
    over the collapsed (source, term) table — bounded by
    |sources|·|vocabulary|, never the corpus. The source-df comes from
    a WINDOW count over that same table (r12 review: the previous
    join-against-own-aggregate re-derived the corpus explode — exchange
    reuse doesn't fire across differentially-pruned subtrees, the
    unigram_nll lesson)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window as W

    toks = df.select(
        F.coalesce(F.col(source_col).cast("string"), F.lit("<NULL>")).alias("source"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = (
        toks.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_tf)
    )
    # one row per (source, term) -> per-term row count IS the source-df
    tf = tf.withColumn("sdf", F.count(F.lit(1)).over(W.partitionBy("term")))
    n_src = tf.select("source").distinct().agg(F.count(F.lit(1)).alias("__ns"))
    scored = (
        tf.join(F.broadcast(n_src))
        .select(
            "source",
            "term",
            "tf",
            "sdf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("__ns").cast("double") / F.col("sdf").cast("double")),
                6,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
