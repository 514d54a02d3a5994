"""Probabilistic-sketch operators: Bloom-filter decontamination and
Count-Min-Sketch heavy hitters.

Both sketches exist for the same 100 TB reason: the exact answer needs a
shuffle keyed by a high-cardinality column (every distinct n-gram / every
distinct key), while the sketch replaces it with a FIXED-SIZE broadcast
structure the corpus streams past — the classic memory/accuracy trade
every large-scale pipeline eventually makes. The Bloom probe touches each
training document once against a broadcast bitset (no train-side shuffle
at all beyond the per-doc collapse); the CMS counter table is
``depth × width`` rows regardless of input size, so the heavy-hitter scan
is one map-side-combinable aggregation plus a broadcast join.

Value-portability: every hash is the repo's portable 60-bit md5 fold
(``conv(substring(md5(s),1,15),16,10)`` ↔ DuckDB's hex-digit
``list_reduce`` fold — bit-identical, see ``key_skew_events``), so a SQL
oracle can replay the ENTIRE sketch — bit positions, counter cells,
collisions and all — and the driver hash-matches the sketch's real output
including its false positives / over-estimates. That is the point: the
sketch error is deterministic given (m, k) / (depth, width), not noise.

Sketch semantics guarantees (tested):
- Bloom: NO false negatives — every truly-contaminated gram is flagged;
  false positives possible and surfaced honestly (``flagged >= exact``).
- CMS: estimate >= exact count ALWAYS (counters only ever over-count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_connector_spark.ops.textstats import tokenize, word_ngrams


def portable_hash60(col, salt: str | None = None) -> F.Column:
    """Portable 60-bit hash of a column's string form: the first 15 hex
    digits of md5, base-converted — non-negative, fits a BIGINT, and
    replayable digit-by-digit in any engine with md5. ``salt`` prefixes
    the input (``'<salt>:'``) to derive independent hash functions for
    multi-hash sketches."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    if salt is not None:
        s = F.concat_ws(":", F.lit(salt), s)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def bloom_positions(col, m_bits: int, k: int) -> F.Column:
    """Array of the ``k`` bit positions (each in [0, m_bits)) a value sets
    in the Bloom filter — hash functions derived by salting the portable
    fold with the hash index."""
    return F.array(
        *[F.pmod(portable_hash60(col, salt=str(i)), F.lit(m_bits)) for i in range(k)]
    )


def bloom_build(keys: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """Distinct set-bit positions of the Bloom filter over ``keys`` —
    one ``pos: long`` column, at most ``min(m_bits, k·|keys|)`` rows.
    This IS the broadcast side of every probe: for benchmark
    decontamination the key set is an eval suite (thousands of grams),
    so the bitset is a few KB no matter how large the training corpus."""
    return (
        keys.select(F.explode(bloom_positions(F.col(key_col), m_bits, k)).alias("pos"))
        .distinct()
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 3,
    m_bits: int = 4096,
    k: int = 3,
    min_flagged: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter benchmark decontamination: flag training documents
    whose distinct word ``n``-grams hit the eval-set Bloom filter
    ≥ ``min_flagged`` times.

    Versus the exact inverted-index ``decontaminate`` (ops/corpus.py),
    which joins train grams against eval grams on the gram hash: here the
    eval side collapses to an ``m_bits``-bit filter ONCE, and the training
    corpus only ever joins against that broadcast bitset — no gram-keyed
    shuffle of the 100 TB side, no skew from stop-grams, and the filter is
    reusable verbatim across corpus versions. The price is false
    positives (≈ (1-e^{-kn/m})^k per gram), surfaced honestly: no false
    negatives (guaranteed — a present gram's bits are all set), so the
    flag is a safe SUPERSET screen to route into the exact checker.

    Returns one row per training doc that has ≥ 1 flagged gram:
    (doc_id, n_grams, flagged_grams, contaminated) — ``flagged_grams``
    counts distinct grams whose ``k`` positions are all set;
    ``contaminated`` = flagged_grams ≥ min_flagged.

    Shape: eval → bitset (≤ m_bits rows, broadcast); train → distinct
    grams per doc (one projection) → posexplode to (doc, gram, pos) →
    broadcast LEFT join against the bitset → per-(doc, gram) all-k-hit
    test → per-doc count. The only exchange on the train side is the
    final doc-keyed collapse.
    """
    bits = bloom_build(
        eval_set.select(
            F.explode(
                F.array_distinct(word_ngrams(tokenize(F.col(text_col)), n))
            ).alias("gram")
        ).distinct(),
        "gram",
        m_bits,
        k,
    ).withColumn("__set", F.lit(1))
    grams = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(tokenize(F.col(text_col)), n))).alias(
            "gram"
        ),
    )
    probed = grams.select(
        id_col, "gram", F.explode(bloom_positions(F.col("gram"), m_bits, k)).alias("pos")
    )
    gram_hits = (
        probed.join(F.broadcast(bits), "pos", "left")
        .groupBy(id_col, "gram")
        .agg((F.count(F.col("__set")) == F.lit(k)).alias("__hit"))
    )
    return (
        gram_hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("__hit").cast("long")).alias("flagged_grams"),
        )
        .filter(F.col("flagged_grams") > 0)
        .select(
            id_col,
            "n_grams",
            "flagged_grams",
            (F.col("flagged_grams") >= F.lit(min_flagged)).alias("contaminated"),
        )
    )


def cms_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """The Count-Min-Sketch counter table over ``df[key_col]`` (NULLs
    ignored): one row per (row_idx, pos) cell with its count — at most
    ``depth × width`` rows TOTAL, which is the whole scale argument: the
    aggregation is map-side combinable into a bounded table, so building
    the sketch over 100 TB is one scan plus a trivially small shuffle."""
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__key")
    )
    cells = keyed.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(portable_hash60(F.col("__key"), salt=str(i)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("row_idx", "pos")
    )
    return cells.groupBy("row_idx", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    topn: int = 40,
) -> DataFrame:
    """Heavy hitters by Count-Min-Sketch estimate: for each distinct key,
    the CMS point estimate (min over the sketch's ``depth`` counter rows)
    next to the exact count, top-``topn`` by estimate.

    ``est >= exact`` always (cells only over-count; the min can't dip
    below the key's own contribution), and the over-estimate is exactly
    the hash-collision mass — deterministic under the portable fold, so
    the whole readout value-verifies. In production the exact column is
    dropped and the candidate set comes from a stream; here it's kept to
    make the sketch error measurable row-by-row (``err = est - exact``).

    Shape: counter table (≤ depth×width rows) broadcast; distinct keys
    aggregate once (the same shuffle the exact answer needs — the sketch
    SAVES that shuffle only when the candidate set is external, which is
    how a production heavy-hitter monitor uses it; the entry keeps the
    exact twin to pin the estimate semantics).

    Ordering: (est DESC, exact DESC, key ASC) — total, so top-N is
    deterministic."""
    counters = cms_counters(df, key_col, depth, width)
    keys = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("__key"))
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    probes = keys.select(
        "__key",
        "exact",
        F.posexplode(
            F.array(
                *[
                    F.pmod(portable_hash60(F.col("__key"), salt=str(i)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("row_idx", "pos"),
    )
    est = (
        probes.join(F.broadcast(counters), ["row_idx", "pos"])
        .groupBy("__key", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    return (
        est.select(
            F.col("__key").alias("key"),
            "est",
            "exact",
            (F.col("est") - F.col("exact")).alias("err"),
        )
        .orderBy(F.col("est").desc(), F.col("exact").desc(), F.col("key").asc())
        .limit(topn)
    )
