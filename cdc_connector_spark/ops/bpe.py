"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

Completes the tokenizer story next to ``textstats.build_vocab`` (word-level
ids) and ``textstats.encode_with_vocab``: ``bpe_train`` learns a merge
table from the corpus, ``bpe_encode`` applies it to produce subword
sequences.

Spark-first shape — the classic trick makes this tractable at 100 TB:
BPE statistics depend only on the WORD-FREQUENCY TABLE, not the corpus.
So the corpus is touched exactly once (explode → groupBy(word) with
map-side combine — the same one-shuffle pass as build_vocab), and every
merge iteration runs over the vocabulary-sized word table:

- each word is a symbol array (characters + a terminal ``</w>`` marker);
- pair counts: a higher-order expression emits adjacent symbol pairs,
  weighted by word count — explode → groupBy(pair) → the argmax pair via
  a distributed top-1 (count desc, then lexicographic pair asc for
  engine-independent determinism); ONE scalar row reaches the driver;
- the winning merge applies to all symbol arrays as a pure ``aggregate``
  fold (greedy left-to-right, the reference semantics) — no Python, no
  shuffle;
- lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
  merges so the plan doesn't grow linearly in n_merges.

``max_words`` bounds the iterated table by total-count coverage (keep the
top-N words; at web scale the head words carry ~all pair mass — the
standard practical cut, stated loudly rather than silently applied).

Correctness evidence: ``tests/test_bpe.py`` pins the merge table and the
encodings against an independent in-memory reference implementation of
the paper's algorithm, plus determinism and greedy-overlap edge cases.
(No driver oracle entry: an iterative argmax loop is not expressible as a
single ANSI-SQL statement — same class as the streaming operators.)
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_connector_spark.ops.textstats import tokenize

END = "</w>"


def _word_table(
    df: DataFrame, text_col: str, max_words: int | None
) -> DataFrame:
    """(word, n) frequency table — the ONLY corpus-sized pass."""
    words = (
        df.select(F.explode(tokenize(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words is not None:
        # deterministic head cut: the distributed top-N by (count, word)
        words = words.orderBy(F.col("n").desc(), F.col("word").asc()).limit(max_words)
    return words


def _symbols_col(word_col: str) -> F.Column:
    """word → initial symbol array: characters + the </w> terminal."""
    chars = F.split(F.col(word_col), "")
    # split("ab", "") -> ["a","b"]; filter guards engines/versions that
    # emit boundary empties
    chars = F.filter(chars, lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END)))


def _apply_merge(sym_col: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right application of one merge to a symbol array —
    a pure ``aggregate`` fold (reference BPE semantics: after a merge the
    new symbol participates in the NEXT comparison, so 'aaa' under (a,a)
    becomes [aa, a], not [aa, aa])."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int | None = None,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ordered merge table [(left, right), ...] (rank = list position).

    Stops early when no pair reaches ``min_count`` occurrences (weighted
    by word frequency). Deterministic on any engine/partitioning: ties on
    the pair count break lexicographically.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    syms = _word_table(df, text_col, max_words).select(
        _symbols_col("word").alias("s"), F.col("n")
    )
    syms = syms.localCheckpoint(eager=True)  # cut the corpus lineage
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        # shifted-slice zip (O(len) per word; transform+element_at is
        # interpreted and quadratic — see textstats.word_ngrams)
        m = F.greatest(F.size("s") - 1, F.lit(0))
        pairs = F.zip_with(
            F.slice(F.col("s"), 1, m),
            F.slice(F.col("s"), 2, m),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        top = (
            syms.filter(F.size("s") >= 2)
            .select(F.explode(pairs).alias("p"), "n")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        syms = syms.select(_apply_merge(F.col("s"), left, right).alias("s"), "n")
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents into BPE subword sequences under a trained merge
    table: (id, n_pieces, pieces array<string>) — word boundaries marked
    by the ``</w>`` suffix on each word's last piece; empty docs yield an
    empty array (kept).

    Execution: one Arrow-batched ``mapInPandas`` kernel; the merge table
    rides the closure (it is n_merges pairs — broadcast-sized by
    construction). Inside the kernel the per-word encoding is memoized
    across the batch (Zipf makes the hit rate ~1), and merges apply in
    rank order with the same greedy semantics as training.

    Word-boundary parity: the kernel splits with the EXACT semantics of
    the training side's JVM ``tokenize`` (trim ASCII spaces, split on the
    Java ``\\s`` class ``[ \\t\\n\\x0b\\f\\r]+``) — a naive Python
    ``str.split()`` would also split on Unicode whitespace (NBSP,
    U+2028/U+3000, pervasive in HTML-derived corpora) and encode words
    the merge table never saw."""
    import re

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, NOT Python Unicode \s

    def jvm_tokens(text: str) -> list[str]:
        t = (text or "").lower().strip(" ")
        if not t:
            return []
        toks = ws.split(t)
        while toks and toks[-1] == "":  # Java split drops TRAILING empties
            toks.pop()
        return toks

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        s = list(word) + [END]
        while len(s) >= 2:
            best, best_rank = None, None
            for j in range(len(s) - 1):
                r = ranks.get((s[j], s[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (s[j], s[j + 1]), r
            if best is None:
                break
            out: list[str] = []
            j = 0
            while j < len(s):
                if j < len(s) - 1 and (s[j], s[j + 1]) == best:
                    out.append(s[j] + s[j + 1])
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s = out
        cache[word] = s
        return s

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("n_pieces", T.LongType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pieces = []
            for text in pdf["__txt"]:
                doc: list[str] = []
                for w in jvm_tokens(text):
                    doc.extend(encode_word(w, cache))
                pieces.append(doc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_pieces": [len(p) for p in pieces],
                    "pieces": pieces,
                }
            )

    return df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__txt")
    ).mapInPandas(gen, out_schema)


def bpe_save(merges: Sequence[tuple[str, str]], path: str) -> None:
    """Persist a merge table as a rank-ordered JSON artifact (atomic
    rename, the _META durability convention): the tokenizer is a build
    ARTIFACT — training data pipelines pin it per corpus version, so it
    needs the same crash-safe write discipline as the index metadata."""
    import json
    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"version": 1, "end": END, "merges": [list(m) for m in merges]}, fh)
    os.replace(tmp, path)


def bpe_load(path: str) -> list[tuple[str, str]]:
    """Load a ``bpe_save`` artifact; validates the format version and the
    end-of-word marker so a table trained under a different convention
    fails fast instead of silently mis-tokenizing."""
    import json

    with open(path) as fh:
        meta = json.load(fh)
    if meta.get("version") != 1 or meta.get("end") != END:
        raise ValueError(f"unsupported BPE artifact at {path}: {meta.get('version')=} {meta.get('end')=}")
    return [tuple(m) for m in meta["merges"]]
