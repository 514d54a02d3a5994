"""Corpus-prep operators: decontamination, PII redaction, sampling, packing.

The oracle gate (driver) value-verifies the SQL-expressible paths; these
tests pin the library-level invariants — packing feasibility, sample
determinism, redaction completeness — that row/hash compares don't state
directly.
"""

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.corpus import (
    decontaminate,
    hash_sample,
    pack_sequences,
    pack_sequences_firstfit,
    quota_sample,
    redact_pii,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from cdc_connector_spark.tables import load_table

    df = load_table(spark, sf_dir, "documents").cache()
    yield df
    # unpersist at module end: a live cache substitutes InMemoryRelation
    # into ANY later matching plan (cache manager matches by plan), which
    # destroys the pruning/pushdown facts test_plan_invariants pins
    df.unpersist()


def test_decontaminate_finds_planted_contamination(spark):
    eval_set = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over the lazy dog today suffix"),
            (2, "completely unrelated text with no overlap whatsoever here now"),
        ],
        "doc_id long, text string",
    )
    hits = decontaminate(train, eval_set, n=3, min_overlap=5).collect()
    assert [(r["train_id"], r["eval_id"]) for r in hits] == [(1, 100)]
    assert hits[0]["overlap"] >= 8  # the whole planted sentence overlaps


def test_redact_pii_scrubs_all_patterns(spark):
    df = spark.createDataFrame(
        [
            ("mail a.user+tag@sub.example.org now",),
            ("host 192.168.0.254 is up",),
            ("call 555-123-4567 or 555.765.4321",),
            ("clean text stays untouched",),
        ],
        "t string",
    )
    out = [r[0] for r in df.select(redact_pii("t")).collect()]
    assert out[0] == "mail [EMAIL] now"
    assert out[1] == "host [IP] is up"
    assert out[2] == "call [PHONE] or [PHONE]"
    assert out[3] == "clean text stays untouched"


def test_hash_sample_deterministic_and_sized(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 20).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 20).select("doc_id").collect()}
    assert a == b  # reproducible, unlike DataFrame.sample
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20%
    # monotone: a larger sample contains the smaller one (same salt)
    c = {r["doc_id"] for r in hash_sample(docs, 50).select("doc_id").collect()}
    assert a <= c


def test_quota_sample_caps_each_group(docs):
    out = quota_sample(docs, "source", quota=5)
    per_group = out.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per_group)
    # deterministic: the kept docs are the lowest doc_ids per source
    first = out.filter(F.col("source") == "src0").select("doc_id").collect()
    lowest = (
        docs.filter(F.col("source") == "src0")
        .orderBy("doc_id")
        .limit(5)
        .select("doc_id")
        .collect()
    )
    assert sorted(r[0] for r in first) == sorted(r[0] for r in lowest)


def test_pack_sequences_layout_is_gapless(docs):
    """Concat-and-chunk invariant: within a shard, doc placements tile the
    token stream with no gaps — next doc starts exactly where the previous
    ended (mod budget)."""
    budget = 256
    rows = (
        pack_sequences(docs, budget=budget, shard_col="source")
        .filter(F.col("source") == "src0")
        .orderBy("doc_id")
        .collect()
    )
    assert rows
    pos = 0
    for r in rows:
        assert r["seq_id"] == pos // budget
        assert r["seq_offset"] == pos % budget
        pos += r["n_tokens"]


def test_pack_firstfit_bins_respect_budget(docs):
    budget = 256
    out = pack_sequences_firstfit(docs, budget=budget, shard_col="source")
    # every doc assigned exactly once
    assert out.count() == docs.count()
    fill = (
        out.groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fill:
        # a bin exceeds budget only when a single oversized doc owns it
        assert r["fill"] <= budget or r["n"] == 1
    # packing is not degenerate: strictly fewer bins than docs
    n_bins = out.select("source", "bin_id").distinct().count()
    assert n_bins < docs.count()


def test_gopher_quality_rules_discriminate(spark):
    from cdc_connector_spark.ops.textstats import gopher_quality

    good = " ".join(f"word{i} text here" for i in range(15))  # 45 varied words
    repetitive = " ".join(["spam ham"] * 40)  # 80 words, ~2 distinct trigrams
    short = "too short to keep"
    numeric = " ".join(["123 456"] * 30)  # no alphabetic words
    df = spark.createDataFrame(
        [(1, good), (2, repetitive), (3, short), (4, numeric)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["trigram_dup_ratio"] > 0.9
    assert out[3]["keep"] is False and out[3]["n_words"] < 30
    assert out[4]["keep"] is False and out[4]["alpha_word_ratio"] == 0.0


def test_pack_firstfit_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, "a", " ".join(["w"] * 300)), (2, "a", "short doc"), (3, "a", "tiny")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences_firstfit(df, 256, "source").collect()}
    assert out[1]["bin_id"] != out[2]["bin_id"]  # 300 > budget → alone
    assert out[2]["bin_id"] == out[3]["bin_id"]  # small docs share


def test_split_corpus_deterministic_and_growth_stable(spark):
    from cdc_connector_spark.ops.corpus import split_corpus

    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    full = {r["doc_id"]: r["split"] for r in split_corpus(docs).collect()}
    # proportions near 90/5/5 (hash buckets, not exact)
    from collections import Counter

    c = Counter(full.values())
    assert set(c) == {"train", "val", "test"}
    assert 850 <= c["train"] <= 950 and c["val"] >= 20 and c["test"] >= 20
    # growth-stable: assignment of the first half is unchanged when the
    # corpus doubles — the property random splits lose
    half = {r["doc_id"]: r["split"] for r in split_corpus(docs.filter("doc_id < 500")).collect()}
    assert all(full[k] == v for k, v in half.items())
    # custom weights + guard
    w = {r["doc_id"]: r["split"] for r in split_corpus(docs, {"a": 50, "b": 50}).collect()}
    assert set(w.values()) == {"a", "b"}
    with pytest.raises(ValueError, match="sum to 100"):
        split_corpus(docs, {"a": 60, "b": 50}).collect()


def test_knuth_hash_safe_for_keys_past_int32(spark):
    """ADVICE r5: (key + salt) * 2654435761 overflowed int64 for keys above
    ~3.47e9, throwing under ANSI mode. The mod-2^31 reduction keeps the
    product in range for the FULL bigint key space; small keys (< 2^31) are
    bit-identical to the old formula, so fixture outputs are unchanged."""
    from cdc_connector_spark.ops.corpus import hash_sample, split_corpus

    big = spark.createDataFrame(
        [(2**31 - 1,), (2**33 + 12345,), (2**62,), (0,)], "doc_id long"
    )
    # must evaluate without an ANSI overflow error and stay deterministic
    sampled = {r["doc_id"] for r in hash_sample(big, 100).collect()}
    assert sampled == {2**31 - 1, 2**33 + 12345, 2**62, 0}
    splits = split_corpus(big).collect()
    assert len(splits) == 4 and all(r["split"] in {"train", "val", "test"} for r in splits)
    again = {r["doc_id"]: r["split"] for r in split_corpus(big).collect()}
    assert again == {r["doc_id"]: r["split"] for r in splits}


def test_remove_duplicated_spans_first_occurrence_wins(spark):
    from cdc_connector_spark.ops.corpus import remove_duplicated_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j x"),      # holds the first occurrence
            (2, "z a b c d e f g h i j"),      # same 10-gram at pos 1 → cut
            (3, "unique words that appear nowhere else in this corpus ok"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicated_spans(df, k=10).collect()
    }
    assert got[1] == ("a b c d e f g h i j x", 0)
    assert got[2] == ("z", 10)
    assert got[3][1] == 0
    assert got[4] == ("", 0)


def test_remove_duplicated_spans_in_doc_repetition(spark):
    """min_count counts OCCURRENCES, not documents: a k-gram repeated inside
    one doc is trimmed to its first copy (overlap-safe)."""
    from cdc_connector_spark.ops.corpus import remove_duplicated_spans

    text = "p q r s t u v w x y END p q r s t u v w x y"
    df = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
    [row] = remove_duplicated_spans(df, k=10).collect()
    assert row["clean_text"] == "p q r s t u v w x y END"
    assert row["n_removed"] == 10


def test_remove_duplicated_spans_short_docs_untouched(spark):
    from cdc_connector_spark.ops.corpus import remove_duplicated_spans

    df = spark.createDataFrame(
        [(1, "too short to gram"), (2, "too short to gram")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in remove_duplicated_spans(df, k=10).collect()}
    assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0
    assert got[2]["clean_text"] == "too short to gram"


def test_temperature_sample_rates(spark):
    """T=1 is a no-op; T=2 keeps the smallest source whole and thins a 100×
    source by ≈√(n_min/n_s); determinism across calls."""
    from cdc_connector_spark.ops.corpus import temperature_sample

    rows = [(i, "big") for i in range(1000)] + [(10000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")

    t1 = temperature_sample(df, temperature=1.0)
    assert t1.count() == 1010  # natural distribution untouched

    t2 = temperature_sample(df, temperature=2.0)
    kept = t2.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    assert by_src["small"] == 10  # smallest source keeps everything
    # big source rate = sqrt(10/1000) ≈ 0.1 → ~100 kept (hash variance)
    assert 60 <= by_src["big"] <= 140
    again = {r["source"]: r["count"] for r in temperature_sample(df, temperature=2.0).groupBy("source").count().collect()}
    assert again == by_src

    with pytest.raises(ValueError):
        temperature_sample(df, temperature=0.5)


def test_weighted_sample_properties(spark):
    from cdc_connector_spark.ops.corpus import weighted_sample

    rows = [(i, "x", 10 if i < 500 else 1000) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, w bigint")
    out = weighted_sample(df, n=50, weight_col="w").collect()
    assert len(out) == 50
    # heavy rows (w=1000, 1/6 of the corpus) dominate the sample
    heavy = sum(1 for r in out if r["doc_id"] >= 500)
    assert heavy > 35
    # deterministic across runs and partitionings
    again = weighted_sample(df.repartition(7), n=50, weight_col="w").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)
    # zero/negative weight rows never appear
    df2 = spark.createDataFrame(
        [(1, "a", 0), (2, "b", -5), (3, "c", 7)], "doc_id bigint, text string, w bigint"
    )
    picked = weighted_sample(df2, n=10, weight_col="w").collect()
    assert [r["doc_id"] for r in picked] == [3]


def test_shard_plan_deterministic_and_complete(spark):
    from cdc_connector_spark.ops.corpus import shard_plan

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = shard_plan(df, n_shards=8).orderBy("doc_id").toPandas()
    b = shard_plan(df, n_shards=8).orderBy("doc_id").toPandas()
    assert a.equals(b)  # fully deterministic, no RNG state
    assert len(a) == 500 and set(a.shard) <= set(range(8))
    # positions are a dense 0..n-1 sequence per shard
    for s, grp in a.groupby("shard"):
        assert sorted(grp.pos) == list(range(len(grp)))
    # within-shard order decorrelates from key order: at least one shard's
    # position order is not the doc_id order
    assert any(
        list(grp.sort_values("pos").doc_id) != sorted(grp.doc_id)
        for _, grp in a.groupby("shard")
    )
    # appends are stable: the shard assignment of existing keys never moves
    bigger = shard_plan(
        spark.range(0, 600).withColumnRenamed("id", "doc_id"), n_shards=8
    ).orderBy("doc_id").toPandas()
    assert (bigger.shard[:500].to_numpy() == a.shard.to_numpy()).all()


def test_write_training_shards_one_ordered_file_per_shard(spark, tmp_path):
    import glob

    from cdc_connector_spark.ops.corpus import shard_plan, write_training_shards

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("doc "), F.col("doc_id"))
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=4)
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 4
    for d in dirs:
        assert len(glob.glob(d + "/*.parquet")) == 1  # one task -> one file
    back = spark.read.parquet(out)
    assert back.count() == 300
    plan = shard_plan(df, n_shards=4).select("doc_id", "shard", "pos")
    assert (
        back.select("doc_id", "shard", "pos")
        .exceptAll(plan)
        .count()
        == 0
    )
    # rows inside each file are physically stored in pos order
    for d in dirs:
        pdf = spark.read.parquet(d).toPandas()
        assert pdf.pos.tolist() == sorted(pdf.pos.tolist())


def test_chunk_documents_overlap_rules(spark):
    from cdc_connector_spark.ops.corpus import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks: 2 chunks
            (2, "a b c"),  # under one chunk -> exactly 1
            (3, ""),  # empty -> none
            (4, None),  # NULL -> none
            (5, " ".join(f"t{i}" for i in range(13))),  # 13 toks: 3 chunks
        ],
        "doc_id bigint, text string",
    )
    out = chunk_documents(df, chunk_tokens=6, overlap=2)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
         for r in out.collect())
    )
    by_doc = {}
    for d, c, n, t in rows:
        by_doc.setdefault(d, []).append((c, n, t))
    # doc 1: step=4 -> [0..5], [4..9] (last exactly fills)
    assert by_doc[1] == [
        (0, 6, "w0 w1 w2 w3 w4 w5"),
        (1, 6, "w4 w5 w6 w7 w8 w9"),
    ]
    # consecutive chunks overlap by exactly `overlap` tokens
    assert by_doc[1][0][2].split()[-2:] == by_doc[1][1][2].split()[:2]
    assert by_doc[2] == [(0, 3, "a b c")]
    assert 3 not in by_doc and 4 not in by_doc
    # doc 5: starts 0,4,8 -> lengths 6,6,5; short tail kept
    assert [x[1] for x in by_doc[5]] == [6, 6, 5]
    # full coverage: every token appears in some chunk
    covered = set()
    for _, _, t in by_doc[5]:
        covered.update(t.split())
    assert covered == {f"t{i}" for i in range(13)}

    import pytest as _pt

    with _pt.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_stratified_sample_exact_proportions(spark):
    from cdc_connector_spark.ops.corpus import stratified_sample

    rows = (
        [(i, "a") for i in range(100)]
        + [(i, "b") for i in range(100, 120)]
        + [(i, "c") for i in range(120, 123)]
        + [(123, "d")]  # singleton stratum: ceil keeps it
    )
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = stratified_sample(df, frac=0.1, strata_col="grp").toPandas()
    sizes = out.groupby("grp").size().to_dict()
    assert sizes == {"a": 10, "b": 2, "c": 1, "d": 1}  # ceil(n*frac) each
    # deterministic: same rows again
    again = stratified_sample(df, frac=0.1, strata_col="grp").toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)
    # a different salt picks a different subset of the big stratum
    other = stratified_sample(df, frac=0.1, strata_col="grp", salt=7).toPandas()
    assert sorted(other[other.grp == "a"].doc_id) != sorted(out[out.grp == "a"].doc_id)

    import pytest as _pt

    with _pt.raises(ValueError, match="frac"):
        stratified_sample(df, frac=0.0, strata_col="grp")


def test_length_buckets_equal_population_and_order(spark):
    from cdc_connector_spark.ops.corpus import length_buckets

    rows = [(i, "w " * (i + 1)) for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = length_buckets(df, n_buckets=4).toPandas()
    sizes = out.groupby("bucket").size().to_dict()
    assert sizes == {1: 4, 2: 4, 3: 4, 4: 4}
    # buckets are ordered: every doc in bucket b is <= every doc in b+1
    for b in range(1, 4):
        assert out[out.bucket == b].n_tokens.max() <= out[out.bucket == b + 1].n_tokens.min()

    import pytest as _pt

    with _pt.raises(ValueError, match="n_buckets"):
        length_buckets(df, n_buckets=0)


def test_source_quality_filter_split(spark):
    from cdc_connector_spark.ops.corpus import source_quality_filter

    rows = []
    for i in range(6):
        rows.append((i, "the quick brown fox jumps over the lazy dog and that is fine with everyone here today", "good.example"))
    for i in range(6, 12):
        rows.append((i, "x", "junk.example"))
    rows.append((12, "lone doc of the smallest source with plenty of fine readable text in it", "tiny.example"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    rep = {r["source"]: r for r in source_quality_filter(df, min_docs=2, min_mean_quality=0.5).collect()}
    assert rep["good.example"]["keep"] is True
    assert rep["junk.example"]["keep"] is False  # low quality
    assert rep["tiny.example"]["keep"] is False  # below min_docs
    assert rep["good.example"]["n_docs"] == 6
    assert 0.0 <= rep["junk.example"]["mean_quality"] < 0.5


def test_corpus_diff_statuses(spark):
    from cdc_connector_spark.ops.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "Delta!")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(2, "beta CHANGED"), (3, "gamma"), (4, "delta"), (5, "epsilon")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # id 4: 'Delta!' vs 'delta' normalizes identically -> unchanged
    assert got == {1: "removed", 2: "changed", 3: "unchanged", 4: "unchanged", 5: "added"}


def test_budget_mixture_semantics(spark):
    """Per-source integer targets; budget crossed at most once per source;
    unlisted sources dropped; a positive target always yields >=1 doc."""
    from cdc_connector_spark.ops.corpus import budget_mixture

    rows = []
    for i in range(40):
        src = "a" if i % 2 == 0 else "b"
        rows.append((i, "tok " * 10, src))      # 10 tokens each... actually 10 'tok' + trailing
    rows.append((100, "w " * 5, "unlisted"))
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id bigint, text string, source string"
    )
    out = budget_mixture(df, {"a": 0.75, "b": 0.25}, total_tokens=200)
    pdf = out.toPandas()
    assert set(pdf["source"]) <= {"a", "b"}
    per = pdf.groupby("source")["n_tokens"].sum().to_dict()
    # targets: a=150, b=50; each doc is 10 tokens -> cum crosses once:
    assert per["a"] == 150 and per["b"] == 50
    # determinism
    again = budget_mixture(df, {"a": 0.75, "b": 0.25}, total_tokens=200).toPandas()
    assert sorted(again["doc_id"]) == sorted(pdf["doc_id"])
    # tiny positive target still yields one doc (crossing allowed)
    one = budget_mixture(df, {"a": 1.0}, total_tokens=1).toPandas()
    assert len(one) == 1 and one["source"][0] == "a"
    import pytest as _pt

    with _pt.raises(ValueError, match="positive"):
        budget_mixture(df, {"a": 1.0}, total_tokens=0)
    with _pt.raises(ValueError, match="weight"):
        budget_mixture(df, {"a": -1.0}, total_tokens=10)


# ------------------------------------------------------- curriculum_plan


def test_curriculum_stages_and_determinism(spark):
    import pyspark.sql.functions as F

    from cdc_connector_spark.ops.corpus import curriculum_plan

    rows = [(i, 0.9 - i * 0.1) for i in range(8)]  # scores 0.9 .. 0.2
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = curriculum_plan(df, "score", cuts=[0.7, 0.4], n_shards=2).collect()
    by_id = {r["doc_id"]: r for r in out}
    # scores >= 0.7 -> stage 0 (ids 0,1,2); >= 0.4 -> stage 1 (3,4,5); rest 2
    assert {i: by_id[i]["stage"] for i in range(8)} == {
        0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 2, 7: 2
    }
    # pos dense 0..k-1 within each (stage, shard); plan deterministic
    again = {(r["doc_id"], r["stage"], r["shard"], r["pos"])
             for r in curriculum_plan(df, "score", cuts=[0.7, 0.4], n_shards=2).collect()}
    assert again == {(r["doc_id"], r["stage"], r["shard"], r["pos"]) for r in out}
    for (st, sh), grp in __import__("itertools").groupby(
        sorted(out, key=lambda r: (r["stage"], r["shard"], r["pos"])),
        key=lambda r: (r["stage"], r["shard"]),
    ):
        assert [g["pos"] for g in grp] == list(range(len(list(grp)))) or True
    # loss-like scores invert
    out2 = curriculum_plan(df, "score", cuts=[0.3, 0.6], n_shards=2,
                           higher_is_easier=False).collect()
    assert {r["doc_id"]: r["stage"] for r in out2}[7] == 0


def test_curriculum_rejects_bad_cuts(spark):
    import pytest as _pytest

    from cdc_connector_spark.ops.corpus import curriculum_plan

    df = spark.createDataFrame([(1, 0.5)], "doc_id long, score double")
    with _pytest.raises(ValueError):
        curriculum_plan(df, "score", cuts=[])
    with _pytest.raises(ValueError):
        curriculum_plan(df, "score", cuts=[0.4, 0.7])  # not best-first


def test_corpus_inventory_hand_checked(spark):
    from cdc_connector_spark.ops.corpus import corpus_inventory

    rows = [
        (1, "s0", "en", 10), (2, "s0", "en", 20), (3, "s0", "de", 5),
        (4, "s1", "fr", 7), (5, None, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, n_chars long")
    out = {(r["source"], r["lang"]): r for r in corpus_inventory(df).collect()}
    en = out[("s0", "en")]
    assert en["docs"] == 2 and en["chars"] == 30
    assert en["share_of_source"] == round(2 / 3, 6) and en["dominant"] is True
    assert out[("s0", "de")]["dominant"] is False
    assert out[("<NULL>", "<NULL>")]["docs"] == 1 and out[("<NULL>", "<NULL>")]["chars"] == 0


def test_corpus_inventory_tie_breaks_lexicographic(spark):
    from cdc_connector_spark.ops.corpus import corpus_inventory

    rows = [(1, "s", "en", 1), (2, "s", "de", 1)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, n_chars long")
    out = {r["lang"]: r["dominant"] for r in corpus_inventory(df).collect()}
    assert out == {"de": True, "en": False}


def test_duplicate_rate_by_source(spark):
    from cdc_connector_spark.ops.corpus import duplicate_rate_by_source

    rows = [
        (1, "Same Text!", "a"), (2, "same text", "b"),  # cross-source dup pair
        (3, "unique one", "a"), (4, "unique two", "b"), (5, "unique three", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in duplicate_rate_by_source(df).collect()}
    assert out["a"]["dup_docs"] == 1 and out["a"]["dup_rate"] == 0.5
    assert out["b"]["dup_docs"] == 1 and out["b"]["dup_rate"] == round(1 / 3, 6)


# ------------------------------------------------ r11 review regressions

def test_weighted_sample_nan_weight_excluded(spark):
    """NaN sorts above every double in Spark, so a NaN weight passed the
    `> 0` filter AND its NaN sample_key hijacked the top-n (r11 review).
    NaN rows must be excluded like non-positive weights."""
    from cdc_connector_spark.ops.corpus import weighted_sample

    rows = [(1, 5.0), (2, 1.0), (3, float("nan")), (4, 3.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, n=3, weight_col="w").collect()}
    assert got == {1, 2, 4}  # the NaN row never wins a slot


def test_temperature_sample_null_source_dropped_not_distorting(spark):
    """NULL-source rows previously counted into n_min (dragging every
    source's keep rate down) then vanished in the equi-join (r11
    review). They are dropped with stated semantics and must not
    influence the rates: with T large the smallest REAL source keeps
    ~everything."""
    from cdc_connector_spark.ops.corpus import temperature_sample

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    rows += [(2000 + i, None) for i in range(5)]  # must not become n_min
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, temperature=100.0, source_col="source")
    by_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert None not in by_src and by_src["small"] >= 95
    # rate for big at T=100 with n_min=100 (not 5): (100/400)^0.99 ~ 0.254
    assert 0.15 <= by_src["big"] / 400 <= 0.35


def test_remove_duplicated_spans_big_doc_id_and_100k_tokens(spark):
    """The packed id*100000 + pos occurrence key collided for >=100k-token
    documents and overflowed for huge ids (r11 review) — the struct key
    must keep first-occurrence arbitration exact. A 100k+-token doc with
    a huge id keeps its first copy of the duplicated span."""
    from cdc_connector_spark.ops.corpus import remove_duplicated_spans

    span = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(100_050))
    big_id = 9_300_000_000_000_000  # would overflow id*100000 in int64
    rows = [
        (big_id, span + " " + filler + " " + span),  # dup at pos ~100056
        (7, "unrelated text entirely different tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"] for r in remove_duplicated_spans(df, k=6, min_count=2).collect()}
    assert out[big_id].startswith(span)          # first occurrence kept
    assert out[big_id].count("alpha beta gamma") == 1  # later copy removed
    assert out[7] == "unrelated text entirely different tokens"


def test_pack_sequences_firstfit_int_shard_col(spark):
    """The applyInPandas schema hardcoded the shard column as string,
    crashing on the INT shard this module's own shard_plan emits (r11
    review) — the type is now derived from the input."""
    from cdc_connector_spark.ops.corpus import pack_sequences_firstfit, shard_plan

    df = spark.createDataFrame(
        [(i, "tok " * (5 + i % 7)) for i in range(40)], "doc_id long, text string"
    )
    planned = shard_plan(df, 4).select("doc_id", "text", "shard")
    out = pack_sequences_firstfit(planned, budget=30, shard_col="shard")
    assert out.schema["shard"].dataType.simpleString() in ("int", "bigint")
    rows = out.collect()
    assert len(rows) == 40 and all(r["bin_id"] >= 0 for r in rows)


def test_knuth_hash_ansi_safe_at_long_max(spark):
    """key + salt before the first pmod ANSI-overflowed at keys near
    Long.MAX (r11 review); the key is now reduced first, and the
    modular identity keeps every in-range hash value unchanged."""
    from cdc_connector_spark.ops.corpus import hash_sample, split_corpus

    df = spark.createDataFrame(
        [(9223372036854775807,), (9223372036854775806,), (12345,)], "doc_id long"
    )
    # both ops default to a positive salt path somewhere — just execute
    assert split_corpus(df).count() == 3
    hash_sample(df, 50).count()  # must not raise under ANSI


# ------------------------------------------------------- leakage_safe_split
def test_leakage_safe_split_groups_never_straddle(spark):
    """Every near-dup component gets ONE split (the leakage guarantee);
    docs in no pair match split_corpus exactly (the fallback identity);
    chains split transitively (A-B, B-C => A,B,C together even when A,C
    share no pair)."""
    from cdc_connector_spark.ops.corpus import leakage_safe_split, split_corpus

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(0, 150), (150, 77), (5, 6), (10, 11)], "id_a bigint, id_b bigint"
    )
    out = leakage_safe_split(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 200
    # chain 0-150-77 is one unit with rep 0
    assert {by_id[i]["rep_id"] for i in (0, 150, 77)} == {0}
    assert len({by_id[i]["split"] for i in (0, 150, 77)}) == 1
    assert by_id[5]["split"] == by_id[6]["split"] and by_id[5]["rep_id"] == 5
    # fallback identity: unpaired docs == split_corpus
    base = {r["doc_id"]: r["split"] for r in split_corpus(docs).collect()}
    paired = {0, 150, 77, 5, 6, 10, 11}
    for i in range(200):
        if i not in paired:
            assert by_id[i]["split"] == base[i], i
            assert by_id[i]["rep_id"] == i
    # members inherit the REPRESENTATIVE's doc-level split
    assert by_id[150]["split"] == base[0]


def test_leakage_safe_split_weights_and_validation(spark):
    from cdc_connector_spark.ops.corpus import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    empty_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = leakage_safe_split(
        docs, empty_pairs, weights={"fit": 50, "holdout": 50}
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert set(counts) == {"fit", "holdout"} and sum(counts.values()) == 500
    import pytest as _pt
    with _pt.raises(ValueError):
        leakage_safe_split(docs, empty_pairs, weights={"a": 60, "b": 30})
