"""clean_corpus: language/quality gates, best-quality dedup, near-dup prune."""

import pytest

from pyspark.sql import functions as F

from cdc_connector_spark.ops.pipeline import clean_corpus

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and the cat is in the house "
    "with that other dog and the weather is fine today in the park"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD_EN),                       # keeper
        (2, GOOD_EN),                       # exact dup of 1 (same fingerprint)
        (3, "el la los de que es en la casa grande de los amigos es que la"),  # spanish
        (4, "zz"),                          # junk: too short, low quality
        (5, GOOD_EN + " extra tail words here making it a near duplicate of one"),  # near-dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_language_and_quality_gates(corpus):
    out = clean_corpus(corpus, keep_langs=("en",), min_quality=0.3)
    ids = {r["doc_id"] for r in out.collect()}
    assert 3 not in ids and 4 not in ids  # es + junk gone
    assert 1 in ids or 2 in ids


def test_exact_dedup_keeps_one_best(corpus):
    out = clean_corpus(corpus, keep_langs=("en",), min_quality=0.0)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids.count(1) + ids.count(2) == 1  # one representative of the pair
    assert 1 in ids  # equal quality → smallest id wins


def test_near_dup_prunes_lower_quality_member(corpus):
    base = clean_corpus(corpus, keep_langs=("en",), min_quality=0.0)
    n_base = base.count()
    pruned = clean_corpus(
        corpus, keep_langs=("en",), min_quality=0.0, near_dup=True, jaccard_threshold=0.5
    )
    ids = {r["doc_id"] for r in pruned.collect()}
    assert pruned.count() <= n_base
    assert len({1, 5} & ids) == 1  # exactly one of the near-dup pair survives


def test_output_carries_scores(corpus):
    out = clean_corpus(corpus)
    assert {"lang_pred", "quality"} <= set(out.columns)
    assert out.filter(F.col("quality").isNull()).count() == 0


def test_pretrain_corpus_full_recipe(spark):
    from cdc_connector_spark.ops.pipeline import pretrain_corpus

    base = GOOD_EN + " and still more ordinary english words follow here"
    rows = [
        (1, base, "sA"),
        (2, base, "sA"),                                     # exact dup → dropped
        (3, "x " * 8, "sA"),                                 # fails Gopher word floor
        (4, base + " benchmark sentinel secret eval phrase words", "sB"),  # contaminated
        (5, "the plain second keeper with the fine ordinary english words "
            "and the weather is good today in that green park of the town "
            "with the dog and the cat walking along the quiet river", "sB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    eval_set = spark.createDataFrame(
        [(100, "benchmark sentinel secret eval phrase words")],
        "doc_id int, text string",
    )
    out = pretrain_corpus(
        docs,
        eval_set=eval_set,
        near_dup=False,
        decontam_min_overlap=3,
        pack_budget=64,
    )
    rows_out = {r["doc_id"]: r for r in out.collect()}
    assert set(rows_out) == {1, 5}          # dup, junk, contaminated all gone
    for r in rows_out.values():             # packing placement present + sane
        assert r["seq_offset"] < 64 and r["n_tokens"] > 0 and r["seq_id"] >= 0


def test_group_dedup_keeps_exactly_one_per_cluster(spark):
    """Pairwise-loser pruning keeps BOTH survivors of a transitive cluster
    whose members were never directly paired; group mode keeps exactly the
    best one. Construct A~B, A~C (A lowest quality; B,C not a pair)."""
    mid = "the quick brown fox jumps over the lazy dog near the riverbank today"
    corpus = spark.createDataFrame(
        [
            # A: near-dup of both B and C, lowest quality (short tail)
            (1, mid + " x"),
            # B: high-quality variant sharing most shingles with A
            (2, mid + " while the sun rises over the quiet valley and birds sing"),
            # C: another high-quality variant of A, different tail than B
            (3, mid + " as the evening settles over the sleepy harbor and boats rest"),
            (9, "an entirely different document about spark shuffle exchanges in query plans"),
        ],
        "doc_id long, text string",
    )
    pairwise = clean_corpus(
        corpus, keep_langs=None, min_quality=0.0, near_dup=True, jaccard_threshold=0.4
    )
    grouped = clean_corpus(
        corpus, keep_langs=None, min_quality=0.0, near_dup=True,
        jaccard_threshold=0.4, group_dedup=True,
    )
    pw_ids = {r["doc_id"] for r in pairwise.collect()}
    gr_ids = {r["doc_id"] for r in grouped.collect()}
    # precondition: the cluster is transitive-only (B~C not directly paired)
    from cdc_connector_spark.ops.dedup import minhash_dedup_pairs

    pairs = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(
        corpus, jaccard_threshold=0.4).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) not in pairs
    assert pw_ids == {2, 3, 9}  # pairwise keeps both cluster survivors
    assert len(gr_ids & {1, 2, 3}) == 1 and 9 in gr_ids  # group keeps ONE


def test_pretrain_corpus_nll_cut_and_mixing(spark):
    from cdc_connector_spark.ops.pipeline import pretrain_corpus

    base = GOOD_EN + " and still more ordinary english words follow here"
    # one rare-token-soup doc that passes Gopher/lang/quality but has a
    # far-out-of-distribution unigram NLL vs the repetitive-corpus docs
    soup = ("the zyx qwv plj ghk mnb vcx trw ews dfg hjk lkm nbv cxz asd "
            "qwe rty uio pas dfe ghr tyu iop zxc vbn mlk jhg fds apo iuy")
    rows = [(i, base + f" tail variant {i}", "sA") for i in range(1, 9)] + [
        (9, soup, "sB")
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")

    no_cut = pretrain_corpus(docs, near_dup=False, pack_budget=64)
    assert 9 in {r["doc_id"] for r in no_cut.collect()}

    # calibrate the cut between the common docs' nll and the soup's
    from cdc_connector_spark.ops.textstats import unigram_nll

    nlls = {r["doc_id"]: r["nll"] for r in unigram_nll(docs).collect()}
    cut = (max(v for k, v in nlls.items() if k != 9) + nlls[9]) / 2
    cut_out = pretrain_corpus(docs, near_dup=False, pack_budget=64, max_nll=cut)
    assert 9 not in {r["doc_id"] for r in cut_out.collect()}

    # temperature mixing thins the dominant source toward n^(1/T)
    mixed = pretrain_corpus(
        docs, near_dup=False, pack_budget=64, mix_temperature=2.0
    )
    by_src = {}
    for r in mixed.collect():
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    # smallest source is never thinned; dominant one is
    assert by_src.get("sB", 0) == 1
    assert by_src["sA"] < 8


def test_pretrain_corpus_repetition_caps_and_dsir(spark):
    from cdc_connector_spark.ops.pipeline import pretrain_corpus

    base = GOOD_EN + " and still more ordinary english words follow here"
    # doc 8: keyword-stuffed — passes Gopher (its trigram dup ratio stays
    # under 0.6 because the stuffing is a bigram) but the top-bigram cap
    # catches it
    stuffed = base + " " + ("buy gold " * 12)
    rows = [(i, base + f" tail variant {i}", "sA") for i in range(1, 8)] + [
        (8, stuffed, "sA")
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")

    no_cap = pretrain_corpus(docs, near_dup=False, pack_budget=64)
    assert 8 in {r["doc_id"] for r in no_cap.collect()}
    # calibrate the cap between the stuffed doc's top-bigram coverage and
    # the clean docs' (same pattern as the nll-cut test)
    from cdc_connector_spark.ops.textstats import repetition_stats

    fr = {
        r["doc_id"]: r["top_2gram_frac"] for r in repetition_stats(docs).collect()
    }
    cap = (fr[8] + max(v for k, v in fr.items() if k != 8)) / 2
    assert fr[8] > max(v for k, v in fr.items() if k != 8)  # signal exists
    capped = pretrain_corpus(
        docs, near_dup=False, pack_budget=64, max_top_2gram_frac=cap
    )
    kept = {r["doc_id"] for r in capped.collect()}
    assert 8 not in kept and {1, 2} <= kept

    # DSIR selection: target = source sB docs with distinct vocabulary;
    # docs that share none of it score below 0 and the cut drops them
    t_rows = [(i, base + f" tail variant {i}", "sA") for i in range(1, 5)] + [
        (20, "quantum ledger protocol consensus and the node the gossip "
             "of the byzantine quorum with the stake in the epoch and the "
             "slot of the chain is final in the round of the vote today",
         "sB"),
    ]
    t_docs = spark.createDataFrame(t_rows, "doc_id int, text string, source string")
    from cdc_connector_spark.ops.textstats import dsir_scores

    scores = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(t_docs, F.col("source") == "sB").collect()
    }
    cut = (scores[20] + max(v for k, v in scores.items() if k != 20)) / 2
    picked = pretrain_corpus(
        t_docs,
        near_dup=False,
        pack_budget=64,
        dsir_target=F.col("source") == "sB",
        min_dsir=cut,
    )
    assert {r["doc_id"] for r in picked.collect()} == {20}

    import pytest as _pt

    with _pt.raises(ValueError, match="dsir_target"):
        pretrain_corpus(t_docs, near_dup=False, min_dsir=0.0)


def test_pretrain_corpus_model_quality_stage(spark):
    import random

    from cdc_connector_spark.ops.classifier import train_quality_classifier
    from cdc_connector_spark.ops.pipeline import pretrain_corpus

    base = GOOD_EN + " and still more ordinary english words follow here"
    junk_words = "zxq wvv qqj klp mnx bbz ttk rrw ggh ffd click buy cheap".split()
    rng = random.Random(11)
    junk = " ".join(rng.choice(junk_words) for _ in range(40))
    docs = spark.createDataFrame(
        [(i, base + f" tail variant {i}", "sA") for i in range(1, 6)]
        + [(6, junk, "sA")],
        "doc_id int, text string, source string",
    )
    labeled = spark.createDataFrame(
        [(100 + i, base + f" v{i}", 1) for i in range(30)]
        + [(200 + i, " ".join(rng.choice(junk_words) for _ in range(30)), 0) for i in range(30)],
        "doc_id int, text string, label int",
    )
    model = train_quality_classifier(labeled, label_col="label")

    # the junk doc passes lang/Gopher? It won't (no stopwords) — disable
    # heuristics to isolate the model stage
    kept = pretrain_corpus(
        docs, keep_langs=None, near_dup=False, pack_budget=64,
        quality_model=model, min_quality_prob=0.5,
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 6 not in ids and {1, 2, 3} <= ids

    import pytest as _pt

    with _pt.raises(ValueError, match="exactly one"):
        pretrain_corpus(docs, quality_model=model)
    with _pt.raises(ValueError, match="exactly one"):
        pretrain_corpus(
            docs, quality_model=model, min_quality_prob=0.5, quality_pareto_alpha=9.0
        )


def test_pretrain_corpus_r7_stages(spark):
    """Source blocking, compression caps, winnow local-overlap pruning,
    and budget-mixture selection all compose into the recipe."""
    from cdc_connector_spark.ops.pipeline import pretrain_corpus

    import random

    rng = random.Random(9)
    vocab = ("the quick brown fox river garden window music mountain letter "
             "coffee evening story market bridge doctor yellow silver copper "
             "with and that from over under into about").split()

    def filler(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    shared = "a long shared boilerplate block of nine plus tokens repeated verbatim across docs"
    rows = [
        (1, filler(60), "sA"),
        (2, filler(60), "sA"),
        # local-overlap pair: same 12-token block inside otherwise-unique docs
        (3, filler(30) + " " + shared + " " + filler(20), "sA"),
        (4, filler(30) + " " + shared + " " + filler(20), "sA"),
        # junk source: 6 docs of repeated noise -> source mean quality tanks
        *[(10 + i, "zz " * 4, "junk") for i in range(6)],
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    out = pretrain_corpus(
        docs,
        near_dup=False,
        min_source_docs=2,
        min_source_quality=0.45,
        compression_ratio_bounds=(0.05, 0.9),
        winnow_min_shared=1,
        pack_budget=64,
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert not ids & {10, 11, 12, 13, 14, 15}  # whole junk source blocked
    assert 3 in ids and 4 not in ids           # winnow keeps the smaller id
    assert {1, 2} <= ids
    # budget mixture path: exclusive with temperature, selects within budget
    import pytest as _pt

    with _pt.raises(ValueError, match="mutually exclusive"):
        pretrain_corpus(docs, mix_temperature=2.0, mixture_weights={"sA": 1.0},
                        mixture_total_tokens=10)
    with _pt.raises(ValueError, match="go together"):
        pretrain_corpus(docs, mixture_weights={"sA": 1.0})
    mixed = pretrain_corpus(
        docs, near_dup=False, mixture_weights={"sA": 1.0}, mixture_total_tokens=15,
        pack_budget=64,
    )
    got = mixed.collect()
    assert all(r["source"] == "sA" for r in got)
    # budget crossed at most once: selected tokens stay below 15 + one doc
    assert 0 < sum(r["n_tokens"] for r in got) <= 15 + max(r["n_tokens"] for r in got)


def test_pretrain_winnow_keeps_higher_quality_member(spark):
    """Review r7 finding: the winnow stage must keep the HIGHER-quality
    member of a local-overlap pair (the clean_corpus survivor
    convention), not blindly the smaller id."""
    from cdc_connector_spark.ops.pipeline import pretrain_corpus
    from cdc_connector_spark.ops.textstats import quality_score
    from pyspark.sql import functions as F

    shared = "a long shared boilerplate block of nine plus tokens repeated verbatim across docs"
    # doc 1 (smaller id): junky short tail -> lower quality
    # doc 2: long varied prose -> higher quality
    low = "zz qq " * 12 + shared
    high = (GOOD_EN + " and still more fine ordinary english words follow here today "
            + shared + " with a graceful ending about the quiet river and the park")
    docs = spark.createDataFrame(
        [(1, low, "sA"), (2, high, "sA")], "doc_id int, text string, source string"
    )
    qs = {r["doc_id"]: r["q"] for r in docs.select("doc_id", F.round(quality_score("text"), 3).alias("q")).collect()}
    assert qs[2] > qs[1]  # fixture sanity
    out = pretrain_corpus(
        docs, near_dup=False, keep_langs=None, winnow_min_shared=1, pack_budget=64
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {2}  # higher quality survives despite the larger id


# --------------------------------- r8 stages: entropy gate, bloom prescreen


def test_min_entropy_gate_drops_low_diversity(spark):
    """Both docs pass the Gopher gate (pinned in-test — a fixture Gopher
    rejects would pass this test without ever exercising the entropy
    stage); only the low-entropy one falls to min_entropy."""
    import random

    from cdc_connector_spark.ops.pipeline import pretrain_corpus
    from cdc_connector_spark.ops.textstats import gopher_quality

    rng = random.Random(3)
    low = [f"tok{i}" for i in range(16)] * 5      # H = ln 16 ~ 2.77
    rng.shuffle(low)
    high = [f"word{i}" for i in range(80)]        # H = ln 80 ~ 4.38
    rows = [(1, " ".join(low), "s0"), (2, " ".join(high), "s0")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import pyspark.sql.functions as SF

    assert {
        r["doc_id"] for r in gopher_quality(docs).filter(SF.col("keep")).collect()
    } == {1, 2}
    out = pretrain_corpus(docs, keep_langs=None, near_dup=False, min_entropy=3.5)
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_bloom_prescreen_is_lossless(spark):
    """The whole point: with a TINY filter (false positives everywhere)
    the final corpus must still be IDENTICAL to the unscreened run —
    the exact stage re-checks every candidate; the sketch only prunes.
    Docs are built to pass the upstream Gopher/quality gates (pinned)."""
    from cdc_connector_spark.ops.pipeline import pretrain_corpus
    from cdc_connector_spark.ops.textstats import gopher_quality

    def filler(i):
        return " ".join(f"tok{i}x{j} mid{i}y{j}" for j in range(18))  # 36 words

    rows = [(i, f"unique{i} " + filler(i), "s0") for i in range(8)]
    dirty_phrase = "alpha beta gamma delta epsilon zeta"
    rows[6] = (6, dirty_phrase + " eta theta " + filler(6), "s0")
    rows[7] = (7, dirty_phrase + " other words " + filler(7), "s0")
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import pyspark.sql.functions as SF

    assert gopher_quality(docs).filter(SF.col("keep")).count() == 8
    eval_set = spark.createDataFrame(
        [(100, dirty_phrase)], "doc_id long, text string"
    )
    kw = dict(
        keep_langs=None, near_dup=False, decontam_ngram=3, decontam_min_overlap=3
    )
    plain = {
        r["doc_id"]
        for r in pretrain_corpus(docs, eval_set=eval_set, **kw).collect()
    }
    screened = {
        r["doc_id"]
        for r in pretrain_corpus(
            docs, eval_set=eval_set, bloom_prescreen=True, bloom_m_bits=16,
            bloom_k=2, **kw
        ).collect()
    }
    assert screened == plain
    assert 6 not in plain and 7 not in plain and 1 in plain


def test_pretrain_corpus_composed_plan_stays_bounded(spark, sf_dir):
    """r13 review pin: with several optional stages enabled the composed
    plan must NOT nest the corpus on both sides of every gate join — the
    pre-r13 shape measured 578 parquet scans / 395 exchanges for five
    stages (the upstream plan multiplied through each semi-join). Stage
    pinning caps the FINAL plan at the post-checkpoint tail; without any
    post-clean stage no checkpoint happens and the lazy plan still reads
    parquet directly."""
    import sys

    sys.path.insert(0, ".")
    from tools.plan_report import plan_facts

    from cdc_connector_spark.ops.pipeline import pretrain_corpus
    from cdc_connector_spark.tables import load_table

    docs_df = load_table(spark, sf_dir, "documents")
    ev = docs_df.limit(3).select("doc_id", "text")
    out = pretrain_corpus(
        docs_df,
        eval_set=ev,
        near_dup=False,
        compression_ratio_bounds=(0.1, 0.99),
        max_top_2gram_frac=0.9,
        min_entropy=0.1,
        max_nll=50.0,
    )
    f = plan_facts(out)
    assert len(f["scans"]) <= 2, len(f["scans"])
    assert f["exchanges"] <= 4, f["exchanges"]
    assert out.count() > 0
    # no post-clean stages -> no pin -> plan still scans the source lazily
    lazy = pretrain_corpus(docs_df, near_dup=False)
    assert len(plan_facts(lazy)["scans"]) > 0


def test_pin_strategy_variants_agree(corpus):
    """persist (lazy, replicated) and none (fully lazy) produce the same
    survivor set as the default eager localCheckpoint pin — the strategy
    only changes materialization, never semantics (advisor, r14)."""
    kw = dict(keep_langs=("en",), min_quality=0.0, near_dup=True, jaccard_threshold=0.5)
    expect = sorted(r["doc_id"] for r in clean_corpus(corpus, **kw).collect())
    for strat in ("persist", "none"):
        got = clean_corpus(corpus, pin_strategy=strat, **kw)
        assert sorted(r["doc_id"] for r in got.collect()) == expect, strat
    with pytest.raises(ValueError, match="unknown pin_strategy"):
        clean_corpus(corpus, pin_strategy="bogus", **kw)


def test_release_pins_unpersists_persist_strategy(corpus):
    """r15 advisor pin: persist-strategy stage boundaries are tracked and
    release_pins() unpersists them all — repeated recipe calls in one
    session must not accumulate disk-cache blocks forever."""
    from cdc_connector_spark.ops.pipeline import _PINNED, release_pins

    release_pins()  # drain anything a prior test pinned
    kw = dict(keep_langs=("en",), min_quality=0.0, near_dup=True, jaccard_threshold=0.5)
    out = clean_corpus(corpus, pin_strategy="persist", **kw)
    n_rows = out.count()
    assert len(_PINNED) >= 1
    pinned = list(_PINNED)
    assert all(df.storageLevel.useDisk for df in pinned)
    released = release_pins(blocking=True)
    assert released == len(pinned)
    assert not _PINNED
    assert all(not df.storageLevel.useDisk for df in pinned)
    # lineage retained: the result is still computable after release
    assert out.count() == n_rows
    # localCheckpoint (default) pins are NOT tracked — nothing to release
    clean_corpus(corpus, **kw).count()
    assert release_pins() == 0


def test_pin_strategy_reliable_checkpoint(corpus, tmp_path):
    """reliable = df.checkpoint() to a configured dir (the cluster-safe
    pin): clear error when no dir is set, identical survivors once it is."""
    kw = dict(keep_langs=("en",), min_quality=0.0, near_dup=True, jaccard_threshold=0.5)
    sc = corpus.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            clean_corpus(corpus, pin_strategy="reliable", **kw)
    expect = sorted(r["doc_id"] for r in clean_corpus(corpus, **kw).collect())
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    got = clean_corpus(corpus, pin_strategy="reliable", **kw)
    assert sorted(r["doc_id"] for r in got.collect()) == expect
