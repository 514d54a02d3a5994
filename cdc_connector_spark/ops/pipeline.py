"""End-to-end corpus cleaning — the composed LLM-preprocessing recipe.

``clean_corpus`` chains the engine's text operators into the standard
training-data pipeline shape:

    language filter → quality filter → exact dedup (best-quality
    representative) → optional near-dup pruning (MinHash)

Everything stays one lazy DataFrame plan until the near-dup stage (which
needs its own candidate-pair job); Catalyst pipelines the filters into the
scan, so the cheap rejections (language, quality) run before any hashing.
Stage costs drop monotonically in selectivity — the 100 TB ordering rule:
cheapest-and-most-selective first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_connector_spark.ops.dedup import minhash_dedup_pairs
from cdc_connector_spark.ops.textstats import fingerprint, language_id, quality_score


#: Stage-boundary pin strategies (r14, advisor follow-up).
#:
#: - ``"local"`` (default): eager ``localCheckpoint`` — fastest, but the
#:   checkpointed blocks live UNREPLICATED on executors, so losing an
#:   executor (crash, spot preemption, dynamic-allocation decommission)
#:   makes the job unrecoverable because lineage was truncated. It also
#:   triggers a Spark job EAGERLY at plan-construction time, even if the
#:   caller never executes the result. Right for interactive/local runs.
#: - ``"reliable"``: ``df.checkpoint(eager=True)`` to the configured
#:   ``spark.sparkContext.setCheckpointDir`` (HDFS/S3) — survives any
#:   executor loss; the 1000-executor-cluster choice. Raises a clear
#:   error if no checkpoint dir is configured.
#: - ``"persist"``: ``persist(DISK_ONLY_2)`` — LAZY (no job at
#:   construction), lineage retained, blocks 2×-replicated so a single
#:   executor loss recovers from the replica without recompute. The plan
#:   still carries the full lineage, so re-reads re-materialize at most
#:   once per stage; pair with an explicit action if eager behavior is
#:   wanted. Persisted stage boundaries are NOT auto-released (the
#:   returned plan still references them lazily — r15 advisor): call
#:   ``release_pins()`` after consuming the result, or they accumulate
#:   disk-cache blocks across repeated clean_corpus/pretrain_corpus
#:   calls in one session.
#: - ``"none"``: no pin — fully lazy, original multiplicative-scan plan
#:   (only sane for tiny corpora or single-stage calls).
PIN_STRATEGIES = ("local", "reliable", "persist", "none")

#: DataFrames pinned with strategy='persist' since the last release_pins().
_PINNED: list[DataFrame] = []


def release_pins(blocking: bool = False) -> int:
    """Unpersist every stage boundary pinned with ``pin_strategy='persist'``
    since the last call; returns how many were released. Safe to call after
    the recipe's result has been fully consumed (persist retains lineage, so
    a late re-read merely recomputes). localCheckpoint/checkpoint pins need
    no release — their blocks are owned by the context/checkpoint dir."""
    n = 0
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n


def _pin(df: DataFrame, enabled: bool = True, strategy: str = "local") -> DataFrame:
    """Stage-boundary materialization (r13 review): every optional gate
    here computes statistics OVER the current corpus and semi-joins the
    survivors back — so the upstream plan appears on BOTH sides of each
    join, and without a cut the source-scan count grows MULTIPLICATIVELY
    with enabled stages (measured: 578 parquet scans / 395 exchanges in
    one composed pretrain_corpus plan with five optional stages; at
    100 TB that plan re-reads the corpus hundreds of times). A pin at
    each enabled stage boundary makes the cost one corpus-size
    materialization per stage — the same linear trade txlog compaction
    makes. See ``PIN_STRATEGIES`` for the durability/laziness choices;
    the default eager localCheckpoint is the interactive-run trade and
    is NOT safe under executor loss / dynamic allocation."""
    if not enabled or strategy == "none":
        return df
    if strategy == "local":
        return df.localCheckpoint(eager=True)
    if strategy == "reliable":
        if df.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "pin_strategy='reliable' needs spark.sparkContext."
                "setCheckpointDir(...) configured (HDFS/S3 path)"
            )
        return df.checkpoint(eager=True)
    if strategy == "persist":
        from pyspark import StorageLevel

        pinned = df.persist(StorageLevel.DISK_ONLY_2)
        _PINNED.append(pinned)  # released via release_pins() (r15 advisor)
        return pinned
    raise ValueError(f"unknown pin_strategy {strategy!r}; one of {PIN_STRATEGIES}")


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] | None = ("en",),
    min_quality: float = 0.3,
    near_dup: bool = False,
    jaccard_threshold: float = 0.8,
    group_dedup: bool = False,
    pin_strategy: str = "local",
) -> DataFrame:
    """Return the cleaned corpus with added ``lang_pred``/``quality`` cols.

    Exact dedup keeps the HIGHEST-QUALITY document per fingerprint (ties →
    smallest id), not merely the smallest id — the representative choice
    that matters for training data. Near-dup pruning drops the lower-quality
    member of each MinHash pair (transitively, via keeping only docs never
    appearing as a 'loser'). With ``group_dedup=True`` the pair graph is
    first closed into connected components (ops/components.py) and exactly
    ONE best-quality doc survives per component — pairwise mode can keep two
    docs of a transitive cluster that were never directly paired (A~B, A~C
    with A losing both keeps BOTH B and C); group mode cannot. Group mode
    costs the component iterations (O(diameter) extra shuffle rounds over
    the pair graph only).
    """
    scored = docs.withColumn("lang_pred", language_id(text_col)).withColumn(
        "quality", quality_score(text_col)
    )
    if keep_langs:
        scored = scored.filter(F.col("lang_pred").isin(list(keep_langs)))
    scored = scored.filter(F.col("quality") >= min_quality)

    # exact dedup: best-quality representative per normalized fingerprint
    w = Window.partitionBy(fingerprint(text_col)).orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    deduped = scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")

    if not near_dup:
        return deduped

    # the near-dup stage references `deduped` four ways (pair mining,
    # two quality joins, the survivor anti-join) — pin it once so the
    # scored/window upstream runs once, not per reference (see _pin)
    deduped = _pin(deduped, strategy=pin_strategy)
    pairs = minhash_dedup_pairs(
        deduped, text_col=text_col, id_col=id_col, jaccard_threshold=jaccard_threshold
    )
    if group_dedup:
        from cdc_connector_spark.ops.components import connected_components

        comp = connected_components(pairs)
        member_q = deduped.select(
            F.col(id_col).alias("id"), F.col("quality").alias("__q")
        ).join(comp, "id")
        w_best = Window.partitionBy("comp").orderBy(F.col("__q").desc(), F.col("id").asc())
        losers = (
            member_q.withColumn("__rn", F.row_number().over(w_best))
            .filter(F.col("__rn") > 1)
            .select(F.col("id").alias("loser"))
        )
        return deduped.join(losers, deduped[id_col] == losers.loser, "left_anti")
    q = deduped.select(F.col(id_col).alias("__qid"), F.col("quality").alias("__q"))
    ranked = (
        pairs.join(q.withColumnRenamed("__qid", "id_a").withColumnRenamed("__q", "q_a"), "id_a")
        .join(q.withColumnRenamed("__qid", "id_b").withColumnRenamed("__q", "q_b"), "id_b")
        .select(
            F.when(
                (F.col("q_b") > F.col("q_a"))
                | ((F.col("q_b") == F.col("q_a")) & (F.col("id_b") < F.col("id_a"))),
                F.col("id_a"),
            )
            .otherwise(F.col("id_b"))
            .alias("loser")
        )
        .distinct()
    )
    return deduped.join(ranked, deduped[id_col] == ranked.loser, "left_anti")


def pretrain_corpus(
    docs: DataFrame,
    eval_set: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    keep_langs: tuple[str, ...] | None = ("en",),
    near_dup: bool = True,
    jaccard_threshold: float = 0.8,
    decontam_ngram: int = 3,
    decontam_min_overlap: int = 5,
    pack_budget: int = 2048,
    max_nll: float | None = None,
    mix_temperature: float | None = None,
    max_top_2gram_frac: float | None = None,
    max_dup_line_frac: float | None = None,
    dsir_target: F.Column | None = None,
    min_dsir: float | None = None,
    quality_model=None,
    quality_pareto_alpha: float | None = None,
    min_quality_prob: float | None = None,
    min_source_docs: int | None = None,
    min_source_quality: float | None = None,
    compression_ratio_bounds: tuple[float, float] | None = None,
    winnow_min_shared: int | None = None,
    winnow_max_df: int | None = None,
    mixture_weights: dict[str, float] | None = None,
    mixture_total_tokens: int | None = None,
    min_entropy: float | None = None,
    bloom_prescreen: bool = False,
    bloom_m_bits: int = 1 << 20,
    bloom_k: int = 3,
    pin_strategy: str = "local",
) -> DataFrame:
    """The full pretraining data recipe, composed from the engine's
    operators in the canonical order (cheapest-and-most-selective first,
    pairwise stages last):

        Gopher quality rules → [repetition caps] → language filter →
        exact dedup → MinHash near-dup pruning → [unigram-LM perplexity
        cut] → [DSIR selection] → benchmark decontamination →
        [temperature mixing] → sequence packing

    ``max_nll`` drops documents whose corpus-trained unigram negative
    log-likelihood exceeds the cut (CCNet-style: high nll = rare-token
    soup) — trained on the CLEANED corpus so the model isn't skewed by the
    junk the earlier stages already rejected. ``mix_temperature`` applies
    mT5-style per-``shard_col`` re-balancing (counts ∝ n^(1/T)) just
    before packing, where the mixture decision belongs.

    ``max_top_2gram_frac`` / ``max_dup_line_frac`` extend the Gopher gate
    with the repetition-signal family (textstats.repetition_stats):
    keyword stuffing and boilerplate caps, applied up front with the other
    cheap rejections. ``dsir_target`` + ``min_dsir`` run DSIR selection
    (textstats.dsir_scores) on the cleaned corpus: the target boolean
    column marks the trusted-domain rows and documents scoring below
    ``min_dsir`` against that target distribution are dropped — a plain
    threshold filter, no global sort (pick the cut from the score
    histogram offline).

    ``quality_model`` (a ``classifier.train_quality_classifier`` fit)
    enables MODEL-based quality filtering on the cleaned corpus: with
    ``min_quality_prob`` it is a hard threshold; with
    ``quality_pareto_alpha`` it is the GPT-3 keep rule (deterministic
    hash-derived Pareto draw — reproducible corpus builds, a long tail of
    low scorers survives by design). Model scoring is one scan; the
    filter composes with the heuristic gates rather than replacing them
    (heuristics catch structure, the model catches distribution).

    Round-7 stages (all optional, each a published-recipe step):
    ``min_source_docs``/``min_source_quality`` drop WHOLE sources by
    aggregate stats BEFORE any per-doc gate (RefinedWeb domain blocking —
    cheapest rejection first); ``compression_ratio_bounds=(lo, hi)`` is
    the two-tailed zlib junk cut next to the Gopher gates;
    ``winnow_min_shared`` prunes LOCAL-overlap duplicates (MOSS
    fingerprints — quotes/boilerplate blocks MinHash's global similarity
    misses) after the near-dup stage, dropping the LOWER-QUALITY member
    of each candidate pair (the clean_corpus survivor convention;
    ``winnow_max_df`` overrides the library's default boilerplate
    fingerprint cap of 500; None keeps it, a non-positive value disables
    the cap entirely); ``mixture_weights``+``mixture_total_tokens`` run
    token-budget mixture selection (the Pile/Dolma recipe) as the
    alternative to ``mix_temperature`` (mutually exclusive — both decide
    the final mixture).

    Round-8 stages: ``min_entropy`` gates on per-doc unigram Shannon
    entropy (textstats.token_entropy — the low-diversity spam cut the
    fixed-gram repetition caps miss), applied up front with the other
    cheap rejections. ``bloom_prescreen=True`` puts the Bloom-filter
    probe (ops/sketch.py) in FRONT of the exact decontamination join:
    only Bloom-flagged docs enter the exact inverted-index check. The
    sketch has NO false negatives, so the screen is LOSSLESS — the final
    corpus is bit-identical with or without it (pinned by a parity
    test); what changes is that the gram-keyed exact join runs over the
    flagged sliver instead of the whole corpus, which is the 100 TB
    shape. ``bloom_m_bits``/``bloom_k`` size the filter.

    Returns the surviving docs with ``lang_pred``/``quality`` from the
    cleaning stages plus ``(n_tokens, seq_id, seq_offset)`` packing
    placement. Every stage before near-dup is one pipelined scan; near-dup
    and decontamination are banded/inverted-index joins (never all-pairs);
    the nll cut is a postings-aggregate join; packing is a per-shard
    window. The whole recipe is a handful of shuffles regardless of
    corpus size.

    ``pin_strategy`` picks how stage boundaries are materialized (see
    ``PIN_STRATEGIES``): the default ``"local"`` is eager and fast but
    unsafe under executor loss / dynamic allocation; pass
    ``"reliable"`` (checkpoint dir) on real clusters, ``"persist"``
    for a lazy replicated pin, or ``"none"`` to keep the fully-lazy
    multiplicative-scan plan.
    """
    from cdc_connector_spark.ops.corpus import decontaminate, pack_sequences
    from cdc_connector_spark.ops.textstats import gopher_quality

    if (mixture_weights is None) != (mixture_total_tokens is None):
        raise ValueError("mixture_weights and mixture_total_tokens go together")
    if mixture_weights is not None and mix_temperature is not None:
        raise ValueError(
            "mix_temperature and mixture_weights are mutually exclusive — "
            "both decide the final source mixture"
        )
    if min_source_docs is not None or min_source_quality is not None:
        from cdc_connector_spark.ops.corpus import source_quality_filter

        rep = source_quality_filter(
            docs,
            min_docs=min_source_docs if min_source_docs is not None else 1,
            min_mean_quality=(
                min_source_quality if min_source_quality is not None else 0.0
            ),
            text_col=text_col,
            source_col=shard_col,
        )
        docs = docs.join(
            F.broadcast(rep.filter(F.col("keep")).select(shard_col)),
            shard_col,
            "left_semi",
        )
    # per-doc gates (gopher / compression / repetition / entropy) are
    # DOCUMENT-LOCAL functions: each flag frame derives from the SAME
    # base and the id-set semi-joins chain onto it once — identical kept
    # set to the old progressive chaining (a doc's flags don't depend on
    # other docs), but the base is scanned once per enabled gate instead
    # of multiplicatively through nested joins (r13 review, see _pin)
    flags = gopher_quality(docs, text_col=text_col, id_col=id_col)
    gate_ids = [flags.filter(F.col("keep")).select(id_col)]
    if compression_ratio_bounds is not None:
        from cdc_connector_spark.ops.textstats import compression_ratio

        lo, hi = compression_ratio_bounds
        gate_ids.append(
            compression_ratio(docs, text_col=text_col, id_col=id_col)
            .filter(F.col("ratio").isNotNull() & F.col("ratio").between(lo, hi))
            .select(id_col)
        )
    if max_top_2gram_frac is not None or max_dup_line_frac is not None:
        from cdc_connector_spark.ops.textstats import repetition_stats

        rep = repetition_stats(docs, text_col=text_col, id_col=id_col)
        cond = F.lit(True)
        if max_top_2gram_frac is not None:
            cond = cond & (F.col("top_2gram_frac") <= max_top_2gram_frac)
        if max_dup_line_frac is not None:
            cond = cond & (F.col("dup_line_frac") <= max_dup_line_frac)
        gate_ids.append(rep.filter(cond).select(id_col))
    if min_entropy is not None:
        from cdc_connector_spark.ops.textstats import token_entropy

        gate_ids.append(
            token_entropy(docs, text_col=text_col, id_col=id_col)
            .filter(F.col("entropy") >= min_entropy)
            .select(id_col)
        )
    kept = docs
    for ids in gate_ids:
        kept = kept.join(ids, id_col, "left_semi")
    cleaned = clean_corpus(
        kept,
        text_col=text_col,
        id_col=id_col,
        keep_langs=keep_langs,
        near_dup=near_dup,
        jaccard_threshold=jaccard_threshold,
    )
    _post = (max_nll is not None or min_dsir is not None or quality_model is not None or eval_set is not None or winnow_min_shared is not None)
    cleaned = _pin(cleaned, _post, pin_strategy)
    if max_nll is not None:
        from cdc_connector_spark.ops.textstats import unigram_nll

        ok_ids = (
            unigram_nll(cleaned, text_col=text_col, id_col=id_col)
            .filter(F.col("nll") <= max_nll)
            .select(id_col)
        )
        cleaned = _pin(cleaned.join(ok_ids, id_col, "left_semi"), _post, pin_strategy)
    if min_dsir is not None:
        if dsir_target is None:
            raise ValueError("min_dsir needs dsir_target (the target-domain column)")
        from cdc_connector_spark.ops.textstats import dsir_scores

        liked = (
            dsir_scores(cleaned, target=dsir_target, text_col=text_col, id_col=id_col)
            .filter(F.col("dsir_score") >= min_dsir)
            .select(id_col)
        )
        cleaned = _pin(cleaned.join(liked, id_col, "left_semi"), _post, pin_strategy)
    if quality_model is not None:
        if (quality_pareto_alpha is None) == (min_quality_prob is None):
            raise ValueError(
                "quality_model needs exactly one of quality_pareto_alpha "
                "(GPT-3 keep rule) or min_quality_prob (hard threshold)"
            )
        from cdc_connector_spark.ops.classifier import (
            pareto_quality_filter,
            score_quality,
        )

        scores = score_quality(cleaned, quality_model, text_col=text_col, id_col=id_col)
        if min_quality_prob is not None:
            kept_q = scores.filter(F.col("quality_prob") >= min_quality_prob)
        else:
            kept_q = pareto_quality_filter(scores, id_col=id_col, alpha=quality_pareto_alpha)
        cleaned = _pin(cleaned.join(kept_q.select(id_col), id_col, "left_semi"), _post, pin_strategy)
    if eval_set is not None:
        base = cleaned
        if bloom_prescreen:
            from cdc_connector_spark.ops.sketch import bloom_decontaminate

            # min_flagged=1: ANY flagged gram makes a doc a candidate —
            # with the sketch's zero-false-negative guarantee the screen
            # is a strict superset of the exact check's positives, so
            # the composition is lossless
            flagged = bloom_decontaminate(
                cleaned,
                eval_set,
                n=decontam_ngram,
                m_bits=bloom_m_bits,
                k=bloom_k,
                min_flagged=1,
                text_col=text_col,
                id_col=id_col,
            ).select(id_col)
            base = cleaned.join(flagged, id_col, "left_semi")
        dirty = (
            decontaminate(
                base,
                eval_set,
                n=decontam_ngram,
                min_overlap=decontam_min_overlap,
                text_col=text_col,
                id_col=id_col,
            )
            .select(F.col("train_id").alias(id_col))
            .distinct()
        )
        cleaned = _pin(cleaned.join(dirty, id_col, "left_anti"), _post, pin_strategy)
    if winnow_min_shared is not None:
        from cdc_connector_spark.ops.dedup import winnow_candidate_pairs

        # winnow_max_df=None defers to the library's safe default cap
        # (500); a non-positive value explicitly DISABLES the cap (there
        # must be a way to express "uncapped" now that None means default)
        if winnow_max_df is None:
            extra = {}
        elif winnow_max_df <= 0:
            extra = {"max_df": None}
        else:
            extra = {"max_df": winnow_max_df}
        pairs = winnow_candidate_pairs(
            cleaned,
            min_shared=winnow_min_shared,
            text_col=text_col,
            id_col=id_col,
            **extra,
        )
        # same survivor convention as the MinHash stage: drop the
        # LOWER-QUALITY member of each pair. Pairs always arrive with
        # id_a < id_b (winnow_candidate_pairs enforces it), so on a
        # quality tie the otherwise(id_b) branch drops the larger id —
        # "ties -> larger id loses" needs no explicit tie conjunct.
        # Pairwise mode shares clean_corpus's documented transitive-chain
        # hazard — close the pair graph with ops/components and keep one
        # best per component when chains matter
        q = cleaned.select(F.col(id_col).alias("__qid"), F.col("quality").alias("__q"))
        losers = (
            pairs.join(
                q.withColumnRenamed("__qid", "id_a").withColumnRenamed("__q", "q_a"),
                "id_a",
            )
            .join(
                q.withColumnRenamed("__qid", "id_b").withColumnRenamed("__q", "q_b"),
                "id_b",
            )
            .select(
                F.when(F.col("q_b") > F.col("q_a"), F.col("id_a"))
                .otherwise(F.col("id_b"))
                .alias("loser")
            )
            .distinct()
        )
        cleaned = _pin(
            cleaned.join(losers, cleaned[id_col] == losers.loser, "left_anti"),
            _post,
            pin_strategy,
        )
    if mix_temperature is not None:
        from cdc_connector_spark.ops.corpus import temperature_sample

        cleaned = temperature_sample(
            cleaned,
            source_col=shard_col,
            temperature=mix_temperature,
            key_col=id_col,
        )
    if mixture_weights is not None:
        from cdc_connector_spark.ops.corpus import budget_mixture

        chosen = budget_mixture(
            cleaned,
            weights=mixture_weights,
            total_tokens=mixture_total_tokens,
            text_col=text_col,
            source_col=shard_col,
            id_col=id_col,
        )
        cleaned = cleaned.join(chosen.select(id_col), id_col, "left_semi")
    placed = pack_sequences(
        cleaned, budget=pack_budget, shard_col=shard_col, text_col=text_col, id_col=id_col
    )
    return cleaned.join(
        placed.select(id_col, "n_tokens", "seq_id", "seq_offset"), id_col
    )
