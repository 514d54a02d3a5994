"""ops/bpe.py — distributed BPE training vs an in-memory reference
implementation of Sennrich et al. 2016 (learn_bpe/apply_bpe semantics).

The reference here is written straight from the paper: count pairs over
the word-frequency dict, merge the argmax (ties lexicographic), repeat;
encoding repeatedly applies the lowest-rank applicable merge. The Spark
path must produce the identical merge table and identical encodings.
"""

from __future__ import annotations

from collections import Counter

import pytest

from cdc_connector_spark.ops.bpe import END, bpe_encode, bpe_train


# ---------- reference implementation (driver-side, paper semantics) ----------

def ref_train(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {tuple(list(w) + [END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (l, r), _ = best
        merges.append((l, r))
        new_vocab = {}
        for syms, c in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def ref_encode(word: str, merges) -> list[str]:
    ranks = {m: i for i, m in enumerate(merges)}
    s = list(word) + [END]
    while len(s) >= 2:
        cand = [(ranks[(a, b)], (a, b)) for a, b in zip(s, s[1:]) if (a, b) in ranks]
        if not cand:
            break
        _, best = min(cand)
        out, j = [], 0
        while j < len(s):
            if j < len(s) - 1 and (s[j], s[j + 1]) == best:
                out.append(s[j] + s[j + 1])
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = out
    return s


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest widest new"),
]


def _counts() -> dict[str, int]:
    c: Counter = Counter()
    for _, t in CORPUS:
        c.update(t.lower().split())
    return dict(c)


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_bpe_train_matches_reference(corpus_df):
    got = bpe_train(corpus_df, n_merges=12, checkpoint_every=3)
    want = ref_train(_counts(), 12)
    assert got == want
    assert len(got) > 4  # the fixture genuinely trains several merges


def test_bpe_train_deterministic_and_early_stop(spark, corpus_df):
    a = bpe_train(corpus_df, n_merges=6)
    b = bpe_train(corpus_df, n_merges=6)
    assert a == b
    # a high min_count stops before n_merges runs out
    few = bpe_train(corpus_df, n_merges=50, min_count=6)
    assert few == ref_train(_counts(), 50, min_count=6)
    assert len(few) < 50


def test_bpe_greedy_overlap_semantics(spark):
    # 'aaaa' under merge (a,a): greedy left-to-right -> [aa, aa, </w>]
    # (NOT [aa, a, a] or [aaa, ...]); next round ties (aa,aa) with
    # (aa,</w>) at count 1 and the lexicographic tie-break picks
    # (aa,</w>) — '<' sorts before 'a'
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id bigint, text string"
    )
    merges = bpe_train(df, n_merges=3, min_count=1)
    assert merges == ref_train({"aaaa": 3}, 3, min_count=1)
    assert merges[0] == ("a", "a") and merges[1] == ("aa", "</w>")


def test_bpe_encode_matches_reference(corpus_df):
    merges = bpe_train(corpus_df, n_merges=10)
    enc = {r["doc_id"]: r for r in bpe_encode(corpus_df, merges).collect()}
    for doc_id, text in CORPUS:
        want = [p for w in text.lower().split() for p in ref_encode(w, merges)]
        assert enc[doc_id]["pieces"] == want, doc_id
        assert enc[doc_id]["n_pieces"] == len(want)
    # unseen word at encode time falls back to finer pieces, never fails
    df2 = corpus_df.sparkSession.createDataFrame(
        [(9, "lowestest"), (10, "")], "doc_id bigint, text string"
    )
    enc2 = {r["doc_id"]: r for r in bpe_encode(df2, merges).collect()}
    assert enc2[9]["pieces"] == ref_encode("lowestest", merges)
    assert enc2[10]["pieces"] == [] and enc2[10]["n_pieces"] == 0


def test_bpe_max_words_head_cut(corpus_df):
    # max_words=2 trains on {low(7), newest(7)} only (count desc, word asc
    # tie-break) — the reference on that reduced dict must agree
    got = bpe_train(corpus_df, n_merges=5, max_words=2, min_count=1)
    counts = _counts()
    head = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:2])
    assert got == ref_train(head, 5, min_count=1)


def test_bpe_pieces_reconstruct_words(corpus_df):
    # lossless property: concatenating a word's pieces (stripping the
    # terminal marker) reproduces the word — for trained AND unseen words
    merges = bpe_train(corpus_df, n_merges=10)
    df = corpus_df.sparkSession.createDataFrame(
        [(50, "low lower lowest brandnewword")], "doc_id bigint, text string"
    )
    [row] = bpe_encode(df, merges).collect()
    words, cur = [], ""
    for p in row["pieces"]:
        cur += p
        if cur.endswith(END):
            words.append(cur[: -len(END)])
            cur = ""
    assert cur == ""  # pieces always close at a word boundary
    assert words == ["low", "lower", "lowest", "brandnewword"]


def test_bpe_save_load_roundtrip(corpus_df, tmp_path):
    from cdc_connector_spark.ops.bpe import bpe_load, bpe_save

    merges = bpe_train(corpus_df, n_merges=6)
    p = str(tmp_path / "tokenizer.json")
    bpe_save(merges, p)
    loaded = bpe_load(p)
    assert loaded == merges
    # encodings under the loaded table are identical
    a = bpe_encode(corpus_df, merges).orderBy("doc_id").collect()
    b = bpe_encode(corpus_df, loaded).orderBy("doc_id").collect()
    assert [r["pieces"] for r in a] == [r["pieces"] for r in b]
    # corrupted convention fails fast
    import json

    json.dump({"version": 2, "end": END, "merges": []}, open(p, "w"))
    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported"):
        bpe_load(p)


def test_bpe_distributed_strategy_matches_reference(corpus_df):
    """The distributed incremental pair-delta loop (verdict r6 #4) must
    produce the IDENTICAL merge table as the paper reference and the
    driver-side loop."""
    dist = bpe_train(corpus_df, n_merges=12, checkpoint_every=3, strategy="distributed")
    drv = bpe_train(corpus_df, n_merges=12, strategy="driver")
    want = ref_train(_counts(), 12)
    assert dist == want
    assert drv == want
    # early stop agrees too
    assert bpe_train(corpus_df, n_merges=50, min_count=6, strategy="distributed") == ref_train(
        _counts(), 50, min_count=6
    )


def test_bpe_ten_thousand_merges_synthetic(spark):
    """Verdict r6 #4 done-criterion: a 10k-merge synthetic run completes
    within budget (driver-side incremental loop — seconds, not 10k jobs)."""
    import random
    import time

    rng = random.Random(7)
    words = {
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(12))
        for _ in range(3000)
    }
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(sorted(words))], "doc_id bigint, text string"
    )
    t0 = time.time()
    merges = bpe_train(df, n_merges=10_000, min_count=1)
    took = time.time() - t0
    assert len(merges) == 10_000
    assert took < 120, f"10k merges took {took:.0f}s"
    # spot-check: a trained merge encodes greedily without error
    out = bpe_encode(df.limit(5), merges)
    assert out.count() == 5
