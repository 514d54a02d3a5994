"""Dedup operator family: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_dedup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun near the garden"
)
NEAR = BASE.replace("afternoon", "evening")  # one-word edit → near-dup
FAR = (
    "completely different text about database systems and distributed "
    "query processing with shuffle partitions and broadcast joins everywhere"
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),          # exact dup of 1
        (3, NEAR),          # near dup of 1
        (4, FAR),
        (5, "The  Quick Brown FOX jumps over the lazy dog while the cat sleeps on the warm windowsill in the afternoon sun near the garden"),  # case/ws variant of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalized(spark, docs):
    kept = exact_dedup(docs).collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in kept}
    # 1,2,5 collapse (normalized fingerprint); 3 and 4 stay
    assert by_id == {1: 3, 3: 1, 4: 1}


def test_shingles_and_signature_shapes(spark, docs):
    out = docs.select(
        F.size(shingles("text", 3)).alias("n_sh"),
        F.size(minhash_signature(shingles("text", 3), 32)).alias("n_sig"),
    ).collect()
    assert all(r["n_sig"] == 32 for r in out)
    assert all(r["n_sh"] > 5 for r in out)


def test_minhash_finds_near_dup_not_far(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(docs, jaccard_threshold=0.5).collect()}
    assert (1, 2) in pairs          # exact dup always caught
    assert (1, 3) in pairs          # near dup caught
    assert all(4 not in p for p in pairs)  # unrelated doc never pairs


def test_simhash_identical_and_near(spark, docs):
    sigs = {r["doc_id"]: r["s"] for r in docs.select("doc_id", simhash("text").alias("s")).collect()}
    assert sigs[1] == sigs[2]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_dedup_pairs(docs, max_hamming=6).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs
    assert all(4 not in (a, b) for (a, b) in pairs)


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0
    assert all(4 not in (a, b) for (a, b) in pairs)


def test_simhash_arrow_matches_expression(spark):
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.dedup import simhash, simhash_arrow

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, ""), (3, "der schnelle braune fuchs")],
        "doc_id int, text string",
    )
    expr = {r["doc_id"]: r["sig"] for r in df.select("doc_id", simhash("text").alias("sig")).collect()}
    arrow = {r["id"]: r["sig"] for r in simhash_arrow(df).collect()}
    assert expr == arrow


def test_minhash_arrow_matches_expression_pipeline(spark):
    """The fused Arrow kernel must be BIT-identical to hashed_shingles +
    minhash_from_hashes (int64 wrap + pmod parity)."""
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.dedup import (
        hashed_shingles,
        minhash_from_hashes,
        minhash_signatures_arrow,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "two words"),
            (3, "one"),
            (4, ""),
            (5, "the quick brown fox jumps over the lazy cat"),
        ],
        "doc_id int, text string",
    )
    expr = {
        r["doc_id"]: list(r["sig"])
        for r in df.select(
            "doc_id", minhash_from_hashes(hashed_shingles("text", 3), 64).alias("sig")
        ).collect()
    }
    arrow = {r["id"]: list(r["sig"]) for r in minhash_signatures_arrow(df).collect()}
    assert expr == arrow


def test_simhash_pigeonhole_guarantee(spark):
    """A Hamming-6 pair whose differing bits touch ALL four 16-bit blocks:
    the old 4×16 blocking could never generate it as a candidate; 8×8-bit
    pigeonhole must (≤7 differing bits leave ≥1 of 8 blocks intact)."""
    from cdc_connector_spark.ops.dedup import simhash_pairs_from_sigs

    # bits 0,1 | 16,17 | 32 | 48 → every 16-bit block differs, Hamming = 6
    sig_b = (1 | 2 | (1 << 16) | (1 << 17) | (1 << 32) | (1 << 48))
    sigs = spark.createDataFrame(
        [(1, 0), (2, sig_b), (3, -4611686018427387904)], "id long, sig long"
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs_from_sigs(sigs, max_hamming=6, blocks=8).collect()}
    assert pairs.get((1, 2)) == 6
    # the old default (4 blocks) with max_hamming=6 is a silent recall hole —
    # now rejected outright
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs_from_sigs(sigs, max_hamming=6, blocks=4)


def test_simhash_dense_corpus_cap_audit(spark):
    """On a near-dup-dense corpus, small caps silently drop whole buckets;
    the audit must quantify exactly what the pair path would lose, and the
    default cap must keep the planted pair."""
    from cdc_connector_spark.ops.dedup import simhash_dropped_buckets, simhash_pairs_from_sigs

    # 600 identical signatures (all-zero) + one Hamming-2 neighbor
    rows = [(i, 0) for i in range(600)] + [(9999, 3)]
    sigs = spark.createDataFrame(rows, "id long, sig long")
    # identical sigs share every m=2 block-pair key → C(8,2)=28 oversized
    dropped = simhash_dropped_buckets(sigs, blocks=8, max_bucket=500).collect()
    assert len(dropped) == 28 and all(r["bucket_size"] >= 600 for r in dropped)
    # with the tight cap every bucket is dropped → planted pair lost
    lost = simhash_pairs_from_sigs(sigs, max_hamming=6, blocks=8, max_bucket=500)
    assert not any(r["id_b"] == 9999 for r in lost.collect())
    # at the default cap the pair (and the dense clique) survives
    kept = simhash_pairs_from_sigs(sigs, max_hamming=6, blocks=8).collect()
    assert any(r["id_b"] == 9999 and r["hamming"] == 2 for r in kept)


def test_dedup_hashes_survive_ansi_mode(spark, docs):
    """The driver's oracle harness runs on a default session where
    ``spark.sql.ansi.enabled=true`` — every hash combine must be
    overflow-free (regression for the round-1 ARITHMETIC_OVERFLOW in
    hashed_shingles' old polynomial combine)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()
        }
        assert pairs[(1, 2)] == 1.0
        mh = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(docs, jaccard_threshold=0.5).collect()}
        assert (1, 2) in mh and (1, 3) in mh
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_simhash_portable_blocked_equals_bruteforce(spark):
    """The portable (md5-hash) simhash variant backs the value-verified
    driver oracle (simhash_neardup_subset): the pigeonhole-blocked pair path
    over portable signatures must equal brute-force all-pairs Hamming, and
    the signature must stay within 60 bits (top 4 bits zero) so both engines
    agree on bit arithmetic."""
    from itertools import combinations

    from cdc_connector_spark.ops.dedup import simhash_pairs_from_sigs, simhash_portable

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox jumps over one lazy cat"),
            (4, "completely different content about spark shuffles"),
            (5, ""),
            (6, None),
        ],
        "doc_id int, text string",
    )
    sig = df.select(F.col("doc_id").alias("id"), simhash_portable("text").alias("sig"))
    sigs = {r["id"]: r["sig"] for r in sig.collect()}
    assert all(0 <= s < (1 << 60) for s in sigs.values())
    # empty and NULL text both hash to the all-zero signature
    assert sigs[5] == 0 and sigs[6] == 0
    expected = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 6
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_from_sigs(sig, max_hamming=6).collect()
    }
    assert got == expected and expected  # non-vacuous: at least one pair


def test_minhash_index_incremental_lookup(spark, tmp_path):
    """Incremental dedup: corpus indexed once; a new batch probes it.
    Matches must equal the batch-vs-corpus subset of the all-pairs truth,
    and appending the batch then re-probing must also surface batch-vs-batch
    duplicates without self-pairs."""
    from cdc_connector_spark.ops.dedup import (
        minhash_index_lookup,
        minhash_index_write,
        minhash_verified_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base),  # dup of 1 (corpus-internal)
        (3, base.replace("dog", "cat")),  # near-dup of 1/2
        (4, "completely different text about spark exchanges and shuffles here"),
        (10, base),  # NEW batch: dup of 1/2/3
        (11, "another unrelated document that matches nothing in the corpus"),
        (12, "completely different text about spark exchanges and shuffles here"),  # dup of 4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.filter("doc_id < 10")
    batch = docs.filter("doc_id >= 10")
    path = str(tmp_path / "mh_index")
    minhash_index_write(corpus, path)

    got = {
        (r["new_id"], r["corpus_id"]): round(r["jaccard"], 6)
        for r in minhash_index_lookup(batch, path, jaccard_threshold=0.5).collect()
    }
    # ground truth: all-pairs verified minhash, restricted to batch×corpus
    truth = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])): round(r["jaccard"], 6)
        for r in minhash_verified_pairs(docs, jaccard_threshold=0.5).collect()
        if (r["id_a"] >= 10) != (r["id_b"] >= 10)
    }
    assert got == truth and (10, 1) in got and (12, 4) in got

    # append the batch; re-probe: self-pairs excluded, batch-internal and
    # batch-vs-corpus dups both visible now
    minhash_index_write(batch, path, mode="append")
    got2 = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_index_lookup(batch, path, jaccard_threshold=0.5).collect()
    }
    assert (10, 10) not in got2 and (10, 1) in got2 and (12, 4) in got2

    # parameter guard: appending with different params must refuse
    with pytest.raises(ValueError, match="was built with"):
        minhash_index_write(batch, path, mode="append", num_hashes=32)


def test_index_append_requires_meta(spark, tmp_path, docs):
    """ADVICE r5: append into an index whose _META is missing (half-built or
    foreign directory) must fail fast, not silently skip the param check;
    and a fresh build commits _META last, so only a completed build is
    appendable."""
    from cdc_connector_spark.ops.dedup import minhash_index_write

    path = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="_META"):
        minhash_index_write(docs, path, mode="append")
    minhash_index_write(docs, path)  # initial build commits _META
    minhash_index_write(docs, path, mode="append")  # now legal
    with pytest.raises(ValueError, match="built with"):
        minhash_index_write(docs, path, num_hashes=32, bands=16, mode="append")


def test_incremental_lookup_survives_fixture_mutation(spark, tmp_path):
    """Verdict r5 #3: the cached temp index is keyed by fixture CONTENT, so
    mutating the data at the same path cannot serve stale probe results."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import incremental_dedup_lookup

    sf = tmp_path / "sf"
    sf.mkdir()
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the warm windowsill in the afternoon sun near the garden"
    )
    # doc 3 (batch: 3 % 7 == 3) is a near-dup of corpus doc 1
    spark.createDataFrame(
        [(1, base), (2, "totally unrelated words " * 6), (3, base + " extra")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    first = incremental_dedup_lookup(spark, str(sf)).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in first} == {(3, 1)}

    # mutate the fixture: corpus doc 1 becomes unrelated -> no match left
    spark.createDataFrame(
        [(1, "now something else entirely " * 5), (2, "totally unrelated words " * 6),
         (3, base + " extra")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    second = incremental_dedup_lookup(spark, str(sf)).collect()
    assert second == []  # a stale index would still report (3, 1)


def test_winnow_fingerprints_local_overlap(spark):
    """Winnowing coverage: two docs sharing a run of >= w+k-1 tokens share
    at least one fingerprint; disjoint docs share none; short docs (<k
    tokens) yield none."""
    from cdc_connector_spark.ops.dedup import (
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    shared = "the winnowing theorem guarantees a shared selected fingerprint here"
    rows = [
        (0, f"intro words first {shared} tail a"),
        (1, f"completely different framing text {shared} and another ending"),
        (2, "nothing in common with either of the other two documents at all"),
        (3, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnow_fingerprints(df, k=5, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared 9-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert 3 not in by_doc  # < k tokens -> no fingerprints
    pairs = {(r["id_a"], r["id_b"]): r["shared"] for r in winnow_candidate_pairs(df, k=5, w=4).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert (0, 2) not in pairs
    # selection density: ~2/(w+1) of grams, never more than all of them
    n_grams_doc0 = len(rows[0][1].split()) - 4
    assert 1 <= len(by_doc[0]) <= n_grams_doc0
    import pytest as _pt

    with _pt.raises(ValueError, match="k and w"):
        winnow_fingerprints(df, k=0)


def test_winnow_max_df_prunes_boilerplate_fingerprints(spark):
    """A fingerprint shared by the whole corpus is template text, not a
    copy signal: max_df drops it before the quadratic self-join."""
    from cdc_connector_spark.ops.dedup import winnow_candidate_pairs

    boiler = "this exact template footer block appears on every single page here"
    rows = [(i, f"unique{i} alpha{i} beta{i} gamma{i} delta{i} " + boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # without the cap every doc pairs with every other
    assert winnow_candidate_pairs(df).count() == 15
    # the boilerplate fingerprints hit df=6 > 3 and vanish; unique prefixes share nothing
    assert winnow_candidate_pairs(df, max_df=3).count() == 0


def test_winnow_default_cap_drops_corpus_wide_boilerplate(spark):
    """The safe cap is the DEFAULT: a boilerplate block planted in 510
    docs (> the default max_df=500) contributes ZERO pairs unless the
    caller opts out with max_df=None, and the dropped fingerprints are
    surfaced by the winnow_dropped_fingerprints audit with their df."""
    from cdc_connector_spark.ops.dedup import (
        winnow_candidate_pairs,
        winnow_dropped_fingerprints,
    )

    boiler = "this exact template footer block appears on every single page here"
    rows = [
        (i, f"unique{i} alpha{i} beta{i} gamma{i} delta{i} " + boiler)
        for i in range(510)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # default: boilerplate capped out, unique prefixes share nothing
    assert winnow_candidate_pairs(df).count() == 0
    # audit surfaces exactly the dropped fingerprints, each at df=510
    dropped = winnow_dropped_fingerprints(df).collect()
    assert dropped and all(r["n_docs"] == 510 for r in dropped)
    # opting out reinstates the quadratic fan-out (C(510,2) pairs)
    assert winnow_candidate_pairs(df, max_df=None).count() == 510 * 509 // 2


def test_ngram_overlap_containment(spark):
    """Overlap coefficient catches a quote fully contained in a much
    larger doc that Jaccard misses; threshold and pair orientation pin."""
    from cdc_connector_spark.ops.dedup import ngram_jaccard_pairs, ngram_overlap_pairs

    quote = "the quick brown fox jumps over the lazy dog near the river bank"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote), (3, "totally unrelated text body")],
        "doc_id bigint, text string",
    )
    got = {(r["id_a"], r["id_b"]): r for r in ngram_overlap_pairs(df, threshold=0.8).collect()}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    # every shingle of the quote appears in doc 2 -> containment 1.0
    assert r["overlap"] == 1.0 and r["n_a"] < r["n_b"]
    # Jaccard at 0.5 misses the same pair (tiny intersection / huge union)
    jac = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert (1, 2) not in jac


def test_duplicate_spans_exact_positions(spark):
    """ExactSubstr span dedup (Lee et al. 2022 shape): a planted 10-token
    shared run is reported ONCE as a maximal span with exact start
    positions and length on both sides; disjoint docs produce nothing;
    a sub-threshold (5-token < length=6) overlap produces nothing."""
    from cdc_connector_spark.ops.dedup import duplicate_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"prefix one two {shared} suffix here"),             # run at pos 4
        (2, f"{shared} trailing words only"),                    # run at pos 1
        (3, "totally unrelated text with no overlap whatsoever at all today"),
        (4, "alpha bravo charlie delta echo nothing else matches further on"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = {
        (r.id_a, r.id_b): (r.start_a, r.start_b, r.span_tokens)
        for r in duplicate_spans(df, length=6, max_df=None).collect()
    }
    # the 10-token run: doc1 tokens 4..13, doc2 tokens 1..10 — one maximal span
    assert spans == {(1, 2): (4, 1, 10)}


def test_duplicate_spans_df_cap_fragments_and_audits(spark):
    """A gram over the occurrence cap is dropped BEFORE the anchor join:
    the island it sat in splits into two conservative halves, and the
    dropped gram surfaces in the audit (never a silent recall hole)."""
    from cdc_connector_spark.ops.dedup import (
        duplicate_span_dropped_grams,
        duplicate_spans,
    )

    # 12-token run shared by two docs; its middle gram (tokens 4..9 of the
    # run) additionally appears in 8 boilerplate docs -> 10 occurrences.
    run = "w1 w2 w3 w4 mid1 mid2 mid3 mid4 mid5 mid6 w11 w12"
    hot = "w4 mid1 mid2 mid3 mid4 mid5"  # the gram starting at run-token 4
    rows = [(1, run), (2, f"lead {run}")] + [
        (10 + i, f"filler{i} {hot} filler{i}b pad{i} more{i} words{i}")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    uncapped = {
        (r.id_a, r.id_b): (r.start_a, r.start_b, r.span_tokens)
        for r in duplicate_spans(df, length=6, max_df=None).collect()
        if r.id_a == 1 and r.id_b == 2
    }
    assert uncapped == {(1, 2): (1, 2, 12)}
    capped = sorted(
        (r.start_a, r.start_b, r.span_tokens)
        for r in duplicate_spans(df, length=6, max_df=9).collect()
        if r.id_a == 1 and r.id_b == 2
    )
    # hot gram at doc1 pos 4 dropped -> islands [1..3] and [5..7] ->
    # spans of 3+5=8 and 3+5=8 tokens starting at 1 and 5
    assert capped == [(1, 2, 8), (5, 6, 8)]
    audit = duplicate_span_dropped_grams(df, length=6, max_df=9).collect()
    assert len(audit) == 1 and audit[0].n_occurrences == 10


def test_duplicate_span_coverage_merges_overlaps(spark):
    """Coverage counts each token once under the earlier-doc-keeps policy:
    two overlapping spans from DIFFERENT earlier partners interval-merge;
    the earliest doc is never charged; ratio is exact-count division."""
    from cdc_connector_spark.ops.dedup import duplicate_span_coverage

    a = "s1 s2 s3 s4 s5 s6 s7 s8"          # 8 tokens
    b = "s5 s6 s7 s8 s9 s10 t1 t2"         # overlaps a's tail
    rows = [
        (1, a),
        (2, b),
        # doc 3 contains a's run at pos 3..10 and b's run at pos 7..14:
        # covered union = tokens 3..14 = 12 of 16 tokens
        (3, f"x1 x2 {a} s9 s10 t1 t2 y1 y2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cov = {r.doc_id: r for r in duplicate_span_coverage(df, length=6, max_df=None).collect()}
    assert 1 not in cov, "the earliest copy is never charged"
    r3 = cov[3]
    assert (r3.n_tokens, r3.dup_tokens) == (16, 12)
    assert r3.dup_ratio == 12 / 16
    # doc 2 shares s5..s8 with doc 1 (4 tokens < length) -> no 6-gram match
    # except via doc 3... doc3 id is HIGHER so doc 2 is only charged by doc 1.
    assert 2 not in cov


# ------------------------------------------------- prefix_jaccard_pairs


def _pj_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_jaccard_pairs(texts, n, num, den):
    """All-pairs reference over distinct word n-gram sets (strings —
    equality of sets of grams == equality of sets of their hashes)."""
    def grams(t):
        toks = t.split()
        return set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))

    gs = {i: grams(t) for i, t in enumerate(texts)}
    out = set()
    for a in gs:
        for b in gs:
            if a < b and gs[a] and gs[b]:
                inter = len(gs[a] & gs[b])
                union = len(gs[a] | gs[b])
                if inter * den >= union * num:
                    out.add((a, b))
    return out


def test_prefix_jaccard_matches_bruteforce_random(spark):
    """Completeness theorem end-to-end: the prefix-filtered join must
    return EXACTLY the all-pairs result on randomized near-dup corpora."""
    import random

    from cdc_connector_spark.ops.dedup import prefix_jaccard_pairs

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    base = [" ".join(rng.choice(vocab) for _ in range(20)) for _ in range(12)]
    texts = list(base)
    for t in base[:6]:  # mutated near-dups
        toks = t.split()
        toks[rng.randrange(len(toks))] = rng.choice(vocab)
        texts.append(" ".join(toks))
    for num, den in [(1, 2), (7, 10), (9, 10)]:
        got = {
            (r["id_a"], r["id_b"])
            for r in prefix_jaccard_pairs(
                _pj_docs(spark, texts), shingle_n=3, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == _brute_jaccard_pairs(texts, 3, num, den), (num, den)


def test_prefix_jaccard_exact_threshold_boundary_kept(spark):
    """A pair with Jaccard EXACTLY n/d survives — the integer comparison
    can't misround the boundary the way a float >= can."""
    from cdc_connector_spark.ops.dedup import prefix_jaccard_pairs

    # doc0: grams {a b c, b c d, c d e} ; doc1: {a b c, b c d, c d X}
    # shared 2, union 4 -> J = 1/2 exactly
    docs = _pj_docs(spark, ["a b c d e", "a b c d X"])
    rows = prefix_jaccard_pairs(
        docs, shingle_n=3, threshold_num=1, threshold_den=2
    ).collect()
    assert len(rows) == 1 and rows[0]["shared"] == 2 and rows[0]["jaccard"] == 0.5
    assert (
        prefix_jaccard_pairs(docs, shingle_n=3, threshold_num=51, threshold_den=100)
        .count()
        == 0
    )


def test_prefix_jaccard_short_and_empty_docs(spark):
    from cdc_connector_spark.ops.dedup import prefix_jaccard_pairs

    docs = _pj_docs(spark, ["", "a b", "x y z q", "x y z q"])
    rows = prefix_jaccard_pairs(docs, shingle_n=3, threshold_num=1, threshold_den=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(2, 3)}
    assert rows[0]["jaccard"] == 1.0


def test_prefix_jaccard_rejects_bad_threshold(spark):
    from cdc_connector_spark.ops.dedup import prefix_jaccard_pairs

    import pytest as _pytest

    with _pytest.raises(ValueError):
        prefix_jaccard_pairs(_pj_docs(spark, ["a"]), threshold_num=0, threshold_den=10)
    with _pytest.raises(ValueError):
        prefix_jaccard_pairs(_pj_docs(spark, ["a"]), threshold_num=11, threshold_den=10)


def test_simhash_portable_arrow_bit_identical(spark):
    """The Arrow vote kernel over JVM md5 hashes must produce EXACTLY the
    pure-expression portable signature (the value-verified entry runs the
    Arrow path; the oracle mirrors the expression path — bit-identity is
    what makes them interchangeable). Covers empty/NULL text and the
    60-bit ceiling."""
    from cdc_connector_spark.ops.dedup import simhash_portable, simhash_portable_arrow

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "shuffle partitions and broadcast joins at scale"),
            (4, "a"),
            (5, ""),
            (6, None),
        ],
        "doc_id int, text string",
    )
    expr = {
        (r["id"], r["sig"])
        for r in df.select(
            F.col("doc_id").alias("id"), simhash_portable("text").alias("sig")
        ).collect()
    }
    arrow = {(r["id"], r["sig"]) for r in simhash_portable_arrow(df).collect()}
    assert arrow == expr
    assert all(0 <= s < (1 << 60) for _, s in arrow)


def test_simhash_arrow_trailing_empty_doc_single_partition(spark):
    """ADVICE r15 (high): `_simhash_votes_np` crashed with IndexError when an
    Arrow batch's LAST document tokenized to empty while the batch held at
    least one non-empty doc — that doc's reduceat segment start equals
    len(flat), which np.add.reduceat rejects. The earlier bit-identity tests
    only passed by partition-layout luck; this pins the layout: one coalesced
    partition with the empty/NULL rows last, through both Arrow paths."""
    import numpy as np
    import pandas as pd

    from cdc_connector_spark.ops.dedup import (
        _simhash_votes_np,
        simhash,
        simhash_arrow,
        simhash_portable,
        simhash_portable_arrow,
    )

    # Kernel-level reproduction: non-empty doc followed by a trailing empty.
    sig = _simhash_votes_np(
        pd.Series([np.array([1, 2, 3], dtype=np.int64), np.array([], dtype=np.int64)])
    )
    assert len(sig) == 2 and sig[1] == 0

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, ""), (3, None)],
        "doc_id int, text string",
    ).coalesce(1)
    expr = {
        (r["id"], r["sig"])
        for r in df.select(F.col("doc_id").alias("id"), simhash("text").alias("sig")).collect()
    }
    arrow = {(r["id"], r["sig"]) for r in simhash_arrow(df).collect()}
    assert arrow == expr
    pexpr = {
        (r["id"], r["sig"])
        for r in df.select(
            F.col("doc_id").alias("id"), simhash_portable("text").alias("sig")
        ).collect()
    }
    parrow = {(r["id"], r["sig"]) for r in simhash_portable_arrow(df).collect()}
    assert parrow == pexpr


def test_minhash_verified_pairs_max_bucket_is_honored(spark):
    """max_bucket must be a real parameter (r11 review): the streaming
    corpus dedup configures its cap and the in-batch step silently used
    the hardwired 500. A 3-doc degenerate band bucket yields pairs at
    the default but none at max_bucket=2."""
    from cdc_connector_spark.ops.dedup import minhash_verified_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(3)],
        "doc_id bigint, text string",
    )
    full = minhash_verified_pairs(docs, jaccard_threshold=0.9).collect()
    assert len(full) == 3  # all identical: C(3,2) pairs
    capped = minhash_verified_pairs(
        docs, jaccard_threshold=0.9, max_bucket=2
    ).collect()
    assert capped == []  # every bucket holds all 3 docs > cap
