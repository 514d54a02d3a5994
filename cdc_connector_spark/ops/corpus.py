"""Corpus-preparation operators for LLM training-data pipelines.

Beyond near-dup removal (ops/dedup.py) a production pretraining pipeline
needs: benchmark decontamination, PII redaction, deterministic sampling,
per-domain quotas, and sequence packing. Each operator here is pure
DataFrame algebra (JVM-side, whole-stage codegen) except the first-fit bin
packer, which is an Arrow-batched ``applyInPandas`` per shard.

Scale notes per operator are in the docstrings; the common theme: never
all-pairs, never a global sort unless the semantics demand one, and
anything keyed shuffles once on hashed longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_connector_spark.ops.dedup import hashed_shingles
from cdc_connector_spark.ops.textstats import token_count, tokenize


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 3,
    min_overlap: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥ ``min_overlap``
    distinct word ``n``-grams with any eval/benchmark doc (the standard
    "n-gram collision" decontamination rule used for pretraining corpora).

    Shape: inverted-index join on shingle HASHES — explode both sides to
    (shingle_hash, doc) and join on the hash, so cost is O(matching
    shingles), never O(train × eval). The eval side is small by definition
    (a benchmark suite) and is broadcast; the train side streams through
    one exchange. Returns (train id, eval id, overlap) pairs; aggregate to
    a per-train-doc flag with a groupBy if only the verdict is needed.
    """
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(hashed_shingles(F.col(text_col), n)).alias("sh"),
    )
    e = eval_set.select(
        F.col(id_col).alias("eval_id"),
        F.explode(hashed_shingles(F.col(text_col), n)).alias("sh"),
    )
    return (
        t.join(F.broadcast(e), "sh")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("overlap"))  # shingles are distinct per doc
        .filter(F.col("overlap") >= min_overlap)
    )


# PII patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB/Go): no lookaround, no backrefs. Email first (its local part can
# contain digits that the phone pattern would otherwise eat), then IPv4,
# then phone.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
)


def redact_pii(col) -> F.Column:
    """Chained ``regexp_replace`` scrub of emails, IPv4s, and phone numbers —
    a single projection, fully inside whole-stage codegen (zero Python).
    At 100 TB a regex scrub is scan-bound; keeping it JVM-side means it
    rides the same stage as the scan instead of forcing an Arrow hop."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.coalesce(c, F.lit(""))
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def hash_sample(
    df: DataFrame, pct: int, key_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Deterministic ``pct``-percent sample by multiplicative hash of the key
    (Knuth 2654435761 mod 2^32) — reproducible across engines and runs,
    unlike ``DataFrame.sample`` (seed interacts with partitioning). The
    arithmetic is pure bigint (no 64-bit wraparound, ANSI-safe) so the SAME
    expression evaluates identically in any SQL engine — which is what makes
    a sampling decision auditable. Sampling is a plain filter: no shuffle,
    pushed to the scan."""
    return df.filter(_knuth_bucket(key_col, salt) < pct)


KNUTH_MULT = 2654435761  # xxhash P1 — the default selection hash
ORDER_MULT = 2246822519  # xxhash P2 — independent intra-shard order hash
DRAW_MULT = 3266489917  # xxhash P3 — independent uniform DRAWS (see below)


def knuth_hash(key_col: str, salt: int = 0, mult: int = KNUTH_MULT) -> F.Column:
    """The engine-portable multiplicative hash behind every deterministic
    sampling/sharding decision in this module — in [0, 2^32), overflow-safe
    AND ANSI-safe: the key is reduced mod 2^31 BEFORE the multiply so the
    product stays under 2^63 for every 32-bit odd ``mult`` used here
    ((2^31-1)·3266489917 < 2^63) — pure-bigint arithmetic that never
    wraps, so ANSI Spark and DuckDB evaluate it identically for the full
    bigint key range (keys ≥ 2^31 fold; the hash keeps mixing them).
    Salt must be a small non-negative constant.

    Multiplier discipline: ops that SELECT rows by hash order/threshold
    (hash_sample, stratified_sample, shard placement) share ``KNUTH_MULT``;
    anything that needs a draw INDEPENDENT of those selections (the
    Pareto quality filter, the intra-shard order) must use a different
    prime, or composing it after a hash-ranked sampler correlates the
    draw with survival and the distribution collapses."""
    # pmod the KEY before adding the salt: key + salt first would
    # ANSI-overflow at keys near Long.MAX (r11 review). Modular identity
    # pmod(key + s, m) == pmod(pmod(key, m) + s, m) keeps every hash
    # value bit-identical to the historical form.
    reduced = F.pmod(
        F.pmod(F.col(key_col), F.lit(2147483648)) + F.lit(salt),
        F.lit(2147483648),
    )
    return F.pmod(reduced * F.lit(mult), F.lit(4294967296))


def _knuth_bucket(key_col: str, salt: int) -> F.Column:
    """Percent bucket of ``knuth_hash`` (see its portability contract)."""
    return knuth_hash(key_col, salt) % 100


def quota_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Per-domain quota: keep at most ``quota`` docs per ``group_col``,
    deterministically (ordered by ``order_col``) — the "cap any single
    domain's share of the corpus" step. One shuffle on the group key; with
    heavy skew (one domain = half the corpus) the window degrades to a
    single hot partition — pre-filter such domains with ``hash_sample``
    first (rank-within-sample ≈ rank-within-domain for capping purposes)."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    shard_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing (concat-and-chunk): within each shard,
    documents are concatenated in ``id_col`` order and cut into fixed
    ``budget``-token sequences; a doc straddling a boundary is split (the
    standard pretraining packing — no padding waste, deterministic layout).

    Returns (id, shard, n_tokens, seq_id, seq_offset): doc starts at
    ``seq_offset`` of sequence ``seq_id`` within its shard. Pure window
    algebra: one shuffle on the shard key, a running sum per shard — packing
    100 TB is then embarrassingly parallel across shards, which is why the
    shard column is REQUIRED (a global pack is a single-partition sort by
    construction; shard first, pack within shards, as every production
    pipeline does)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(shard_col),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
        .withColumn("__cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            id_col,
            shard_col,
            "n_tokens",
            F.floor(F.col("__cum_before") / budget).alias("seq_id"),
            (F.col("__cum_before") % budget).alias("seq_offset"),
        )
    )


def pack_sequences_firstfit(
    df: DataFrame,
    budget: int,
    shard_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """First-fit-decreasing bin packing per shard — the NO-SPLIT variant for
    SFT/eval-style data where a document must not straddle sequences.
    Returns (id, shard, n_tokens, bin_id). Docs larger than ``budget`` get a
    bin of their own (callers typically truncate or drop them first).

    Per-shard state (open-bin free space) is inherently sequential, so this
    runs as one Arrow batch per shard via ``applyInPandas`` — parallel
    across shards, exact within a shard. FFD is within 11/9·OPT+1 bins of
    optimal (classical bound), which is why it's the standard packer."""
    import pandas as pd

    with_tokens = df.select(
        F.col(id_col), F.col(shard_col), token_count(F.col(text_col)).alias("n_tokens")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        bins: list[int] = []  # free space per open bin
        assigned = []
        for tok in pdf["n_tokens"]:
            for i, free in enumerate(bins):
                if tok <= free:
                    bins[i] = free - tok
                    assigned.append(i)
                    break
            else:
                bins.append(max(budget - tok, 0))
                assigned.append(len(bins) - 1)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        return pdf

    # derive the shard field's type from the input: hardcoding string
    # broke on the INT shard this module's own shard_plan produces
    # (r11 review; the embedding_neardup_pairs schema-derivation pattern)
    shard_type = with_tokens.schema[shard_col].dataType.simpleString()
    schema = f"{id_col} long, {shard_col} {shard_type}, n_tokens int, bin_id long"
    return with_tokens.groupBy(shard_col).applyInPandas(pack, schema=schema)


def split_corpus(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    key_col: str = "doc_id",
    salt: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column from
    the same engine-portable multiplicative hash as ``hash_sample`` (Knuth
    2654435761 mod 2^32, key reduced mod 2^31 first so the product never
    overflows int64, ANSI-safe), so the assignment is (a)
    reproducible run-to-run and engine-to-engine, (b) auditable by
    re-evaluating the arithmetic anywhere, and (c) STABLE UNDER CORPUS
    GROWTH — a doc's split depends only on its key, so appending data never
    reshuffles existing examples across splits (the property random splits
    lose and leakage audits depend on). ``weights`` are integer percents
    summing to 100, assigned to contiguous hash-bucket ranges in dict
    order. A projection only: no shuffle, nothing to precompute."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100, got {weights}")
    bucket = _knuth_bucket(key_col, salt)
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, int] | None = None,
    key_col: str = "doc_id",
    salt: int = 1,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Group-aware train/val/test assignment: every near-dup component
    splits as a UNIT, so near-duplicate documents can never straddle a
    train/test boundary — the leakage mode a doc-level hash split
    (``split_corpus``) cannot prevent, and the reason dedup-aware
    corpora (Lee et al. 2022's ExactSubstr/NearDup analyses) split by
    duplicate cluster, not by document. ``pairs`` is any (id_a, id_b)
    near-dup pair set (MinHash, SimHash, embedding-cosine, fuzzy — all
    of this repo's generators qualify); transitive closure makes the
    decision cluster-complete.

    Assignment rule: a component's REPRESENTATIVE (minimum member id —
    ``connected_components``' canonical label) is hashed with the same
    engine-portable Knuth arithmetic as ``split_corpus``; every member
    inherits that split. Docs in no pair hash their own key, so on a
    pair-free corpus the output equals ``split_corpus`` exactly, and
    the assignment stays STABLE UNDER CORPUS GROWTH except where
    growth genuinely merges components (a new bridge doc re-labels its
    group — unavoidable under cluster-completeness; the alternative is
    leakage).

    Returns (key_col, rep_id, split) — an assignment table to join
    back, not a widened df (keeps the shuffle payload to ids).

    Scale shape: hash-min CC over the pair graph (O(E) per round,
    ops/components.py's large/small-star fallback for deep chains) +
    one id-keyed equi-join of the |docs-in-pairs| label table against
    the corpus keys + a codegen projection for the bucket arithmetic.
    No window, no driver materialization."""
    from .components import connected_components

    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100, got {weights}")
    comp = connected_components(pairs, id_a, id_b)
    rep = (
        df.select(F.col(key_col))
        .join(comp, df[key_col] == comp["id"], "left")
        .select(F.col(key_col), F.coalesce("comp", F.col(key_col)).alias("rep_id"))
    )
    bucket = _knuth_bucket("rep_id", salt)
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return rep.withColumn("split", expr)


def remove_duplicated_spans(
    df: DataFrame,
    k: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style duplicated-span removal: every word ``k``-gram occurring
    ``min_count``+ times in the corpus keeps its FIRST occurrence (smallest
    ``doc_id``, then smallest position) and is deleted everywhere else —
    tokens covered by any removed span are dropped and the document is
    re-joined with single spaces. Returns (id, clean_text, n_removed).

    This is the repetition-removal pass of C4 (Raffel et al. 2020, "three-
    sentence span" rule) re-expressed at word-gram granularity; CCNet/Dolma
    run the same shape per paragraph. It complements document-level dedup:
    near-dup DOCS are dropped whole by MinHash, while boilerplate SPANS
    (headers, license blocks, navigation) recur inside otherwise-unique
    docs and must be cut out, not used to kill the doc.

    Scale shape: gram occurrences are (id, pos, hash) longs — the chained
    ``xxhash64`` combine from ``hashed_shingles``, positions kept — so the
    global frequency pass is ONE shuffle of longs; first-occurrence
    arbitration rides the same aggregate as a lexicographic
    ``min(struct(id, pos))`` — no position/id packing, so documents of any
    length are safe (r11 fixed a packed-key overflow for 100k+-token
    docs), removed-span starts group
    back per doc (second shuffle), and the cut itself is a higher-order
    ``filter`` over the token array, no explode of surviving text. Never
    all-pairs, no driver materialization. Hash collisions can only MERGE
    gram groups (two distinct grams sharing a 64-bit hash), which errs
    toward removal; at corpus scale the expected collision count is
    ~n²/2⁶⁴ — negligible, and the value-verified oracle pins it on the
    fixture.
    """
    toks = F.col("__toks")
    base = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "__toks",
        F.when(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "",
            F.array().cast("array<string>"),
        ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+")),
    )

    # positional gram hashes: same chained-xxhash64 combine as
    # hashed_shingles, WITHOUT the distinct (positions matter here)
    h = F.transform(toks, lambda t: F.xxhash64(t))
    n_grams = F.size(h) - (k - 1)
    comb = F.slice(h, 1, F.greatest(n_grams, F.lit(0)))
    for i in range(1, k):
        comb = F.zip_with(
            comb,
            F.slice(h, i + 1, F.greatest(n_grams, F.lit(0))),
            lambda a, b: F.xxhash64(a, F.coalesce(b, F.lit(0).cast("long"))),
        )
    grams = (
        base.withColumn("__g", comb)
        .filter(F.size("__g") > 0)
        .select(F.col(id_col).alias("__id"), F.posexplode("__g").alias("pos", "gh"))
    )

    # first-occurrence arbitration via a struct MIN — the packed
    # id*100000 + pos key collided for docs with >= 100k tokens and
    # overflowed for huge ids (r11 review); struct ordering is
    # lexicographic (id, pos), the exact total order the packing meant.
    # r15 optimization round: count + first ride ONE gh-keyed WINDOW
    # over the gram frame instead of groupBy(gh) + join-back — the join
    # form referenced ``grams`` twice, so the whole zip-chain hash
    # derivation and the posexplode ran twice per pass (the self-join
    # re-derives its subtree; measured 5.7 s → 3.4 s at sf0.1 with
    # identical output). Same single shuffle of (id, pos, gh) longs;
    # the window's per-key state is two scalars.
    occ_key = F.struct(F.col("__id").alias("i"), F.col("pos").alias("p"))
    wgh = Window.partitionBy("gh")
    removed = (
        grams.withColumn("__c", F.count(F.lit(1)).over(wgh))
        .withColumn("__first", F.min(occ_key).over(wgh))
        .filter((F.col("__c") >= min_count) & (occ_key != F.col("__first")))
        .groupBy("__id")
        .agg(F.collect_set("pos").alias("__starts"))
    )

    out = base.join(removed, base[id_col] == removed["__id"], "left").drop("__id")
    starts = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(starts, lambda s: (i >= s) & (i < s + k)),
    )
    return out.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(toks) - F.size(kept)).alias("n_removed"),
    )


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    temperature: float = 2.0,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Temperature-based corpus re-balancing (the mT5/PaLM mixing rule,
    realized by deterministic down-sampling): target counts ∝ n_s^(1/T), so
    each source keeps rate ``(n_min / n_s)^(1 − 1/T)`` — the smallest
    source keeps everything, larger sources are thinned toward it. T=1 is
    the natural distribution (no-op); T→∞ flattens to equal counts per
    source. The keep decision reuses the engine-portable Knuth hash
    (stable under corpus growth, auditable anywhere): a doc is kept iff its
    raw 32-bit bucket, as a double, is below ``rate × 2^32``.

    Scale shape: per-source counts are one partial-aggregated groupBy on
    the (few) sources, broadcast back; the keep test is then a scan-level
    filter — no second shuffle, no driver collect. Rates are doubles;
    ``power`` is evaluated by each engine's libm, which can differ in the
    last ulp — a doc flips only if its bucket lands within that ulp of the
    threshold (≈2⁻⁵² relative), which the value-verified oracle query pins
    as not occurring on the fixture.
    """
    if temperature < 1.0:
        raise ValueError(f"temperature must be >= 1 (got {temperature})")
    # NULL-source rows previously counted into n_min (distorting every
    # source's keep rate) and then vanished in the equi-join (NULL never
    # equals NULL) — drop them up front with stated semantics: a doc
    # with no source has no mixture weight (r11 review)
    df = df.filter(F.col(source_col).isNotNull())
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        source_col,
        F.pow(
            F.col("__n_min").cast("double") / F.col("__n"),
            F.lit(1.0 - 1.0 / temperature),
        ).alias("__rate"),
    )
    bucket32 = knuth_hash(key_col, salt)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket32.cast("double") < F.col("__rate") * F.lit(4294967296.0))
        .drop("__rate")
    )


def corpus_mix_report(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Data-card mixture report: per group, document count, token count,
    and each group's share of corpus tokens — the table every training-mix
    decision (and the temperature_sample rate choice) starts from.

    One partial-aggregated groupBy over the corpus; the per-group totals
    frame is tiny, so the share denominator is a broadcast scalar, not a
    second corpus pass. Shares are rounded to 6 for engine portability."""
    from cdc_connector_spark.ops.textstats import tokenize

    per_group = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(text_col))).cast("bigint").alias("n_tokens"),
    )
    total = per_group.agg(F.sum("n_tokens").alias("__total"))
    return per_group.crossJoin(F.broadcast(total)).select(
        *group_cols,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("__total"), 6).alias("token_share"),
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES, 2006): each row gets sample_key = u^(1/w) with u a
    uniform in (0,1), and the n LARGEST keys are the sample — inclusion
    probability proportional to weight, exactly the reservoir scheme, but
    with u derived from the engine-portable multiplicative hash instead of
    RNG state, so the same rows are chosen on any engine, any run, any
    partitioning (the property hash_sample gives the unweighted case).

    Adds ``sample_key`` to the surviving rows, rounded to 12 decimals
    BEFORE ordering: u^(1/w) compresses toward 1.0 for large weights, so
    the rounding must be fine enough not to distort the weighting, yet
    coarse enough to absorb the ~1-ulp cross-engine differences of pow()
    (ties break by key, deterministically, on both engines). Rows with
    non-positive weight are excluded (their inclusion probability is 0).

    Scale shape: one scan computing the key expression + a distributed
    top-n (TakeOrderedAndProject — per-partition heaps, no full sort, no
    shuffle of non-winners). Ties break by key column for determinism."""
    h = knuth_hash(key_col, salt)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    skey = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        # Spark sorts NaN above every double, so a NaN weight would pass
        # `> 0` AND its NaN sample_key would sort FIRST, hijacking the
        # sample (r11 review) — exclude NaN explicitly alongside <= 0
        df.filter((F.col(weight_col) > 0) & ~F.isnan(F.col(weight_col).cast("double")))
        .withColumn("sample_key", F.round(skey, 12))
        .orderBy(F.col("sample_key").desc(), F.col(key_col).asc())
        .limit(n)
    )


def shard_plan(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic shuffled sharding for training export: adds
    ``shard`` (int, [0, n_shards)) and ``pos`` (long, 0-based position
    within the shard) to every row.

    A training run wants the corpus cut into fixed shards whose READ ORDER
    is decorrelated from ingest order (a data loader streaming shard files
    sequentially must not replay the crawl's temporal/source clustering).
    Both assignments come from engine-portable multiplicative hashes over
    ``key_col`` (same overflow-safe reduce-then-multiply scheme as
    ``hash_sample``): the shard from the Knuth constant, the WITHIN-shard
    order from an independent second multiplier (xxhash32's prime), ties
    broken by key — so the full plan (shard AND position) is reproducible
    on any engine, any partitioning, any run, and re-running after an
    append only appends (existing keys keep their shard; positions shift
    only where a new key lands between them).

    Scale shape: one projection + ONE shuffle keyed by ``shard`` for the
    per-shard ``row_number`` — the minimum for a global per-shard order;
    the sort is per-shard (corpus/n_shards rows), never global.
    ``write_training_shards`` reuses that same partitioning to emit one
    file per shard.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h_shard = knuth_hash(key_col, salt)
    # independent mix for the intra-shard order (see knuth_hash's
    # multiplier discipline)
    h_order = knuth_hash(key_col, salt, mult=ORDER_MULT)
    planned = df.withColumn("shard", (h_shard % n_shards).cast("int")).withColumn(
        "__order", h_order
    )
    w = Window.partitionBy("shard").orderBy(F.col("__order").asc(), F.col(key_col).asc())
    return planned.withColumn(
        "pos", (F.row_number().over(w) - F.lit(1)).cast("long")
    ).drop("__order")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: int = 0,
) -> None:
    """Materialize ``shard_plan`` as one parquet file per shard directory
    (``shard=N/part-*.parquet``), rows stored in ``pos`` order — the
    training-export layout: a data loader streams shard files sequentially
    and gets the deterministic shuffled order with zero read-side work.

    Exactly-one-file-per-shard: rows are repartitioned BY the shard id
    (hash of one int — each shard lands wholly in one task) and sorted
    within partitions on (shard, pos) before a partitionBy write, so every
    ``shard=N`` directory receives its rows from exactly one task → one
    file, already in order. Cost: the row_number exchange from the plan
    plus this placement exchange (both keyed on ``shard``; AQE handles the
    tiny-shard case). A 100 TB corpus at n_shards=100k keeps file sizes
    ~1 GB — tune n_shards to the target file size, it is the only knob."""
    planned = shard_plan(df, n_shards, key_col, salt)
    (
        planned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard context-window / RAG-passage splitter: chunk i covers tokens
    [i·step, i·step + chunk_tokens) with step = chunk_tokens − overlap;
    the last chunk may be shorter; a doc at or under one chunk yields
    exactly one chunk; empty docs yield none.

    Returns (id, chunk_id, n_chunk_tokens, chunk_text). Pure higher-order
    array expressions + one ``explode`` — projection-only, scan-bound, no
    shuffle at any corpus size (chunk placement is per-document by
    construction). Deterministic and engine-portable: the whole rule is
    integer arithmetic over the shared whitespace tokenizer, so the SQL
    oracle re-derives it verbatim."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap={overlap} must be < chunk_tokens={chunk_tokens}")
    step = chunk_tokens - overlap
    toks = tokenize(text_col)
    n = F.size(toks)
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk_tokens, F.lit(1))
        .otherwise(F.lit(1) + F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(step))).cast("int"))
    )
    # n_chunks = 0 (token-less doc) must NOT reach sequence(): Spark's
    # sequence(0, -1) yields a DESCENDING [0, -1], and i = -1 puts the
    # slice start at 1 - step — an ANSI runtime error when step = 1
    # (caught by the randomized reconstruction property test)
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.slice(toks, i * step + 1, chunk_tokens).alias("c"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_id:bigint,c:array<string>>>"))
    exploded = df.select(F.col(id_col), F.explode(chunks).alias("ch")).filter(
        F.size("ch.c") > 0
    )
    return exploded.select(
        id_col,
        F.col("ch.chunk_id").alias("chunk_id"),
        F.size("ch.c").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("ch.c")).alias("chunk_text"),
    )


def stratified_sample(
    df: DataFrame,
    frac: float,
    strata_col: str,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Exact proportional stratified sampling: from EVERY stratum keep
    ceil(frac · |stratum|) rows — the composition-preserving cut
    (``hash_sample``'s global percent filter preserves proportions only in
    expectation; quotas cap but don't proportion). Selection within a
    stratum is by the engine-portable multiplicative hash (ties by key),
    so the sample is deterministic on any engine/partitioning and
    auditable by re-evaluating the same arithmetic anywhere.

    One shuffle keyed by the stratum for the two windows (rank + size);
    rows carry only their own columns — the classic window shape, same
    cost class as ``quota_sample``. Small strata are never lost: ceil
    keeps at least one row of every non-empty stratum."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    # ceil(frac·n) in EXACT integer arithmetic: frac is taken at 6-decimal
    # precision (the contract) and the quota is (n·frac6 + 999_999) div 1e6
    # via `div` (long integer division — `/` would be double division,
    # exact only below 2^53; long·int stays exact up to ~9.2e12 rows per
    # stratum at frac6=1e6 before 64-bit overflow) — the naive
    # F.ceil(n * frac) overshoots whenever the binary double inflates an
    # exact product (100·0.07 → 7.000000000000001 → ceil 8)
    frac6 = int(round(frac * 1_000_000))
    h = knuth_hash(key_col, salt)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    wn = Window.partitionBy(strata_col)
    quota = F.expr(f"(__n * CAST({frac6} AS BIGINT) + 999999) div 1000000")
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter(F.col("__rk") <= quota)
        .drop("__rk", "__n")
    )


def length_buckets(
    df: DataFrame,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching plan: assign every document to one of
    ``n_buckets`` equal-population buckets by token count (``ntile``), so
    a training/inference batcher can draw same-bucket batches and cut
    padding waste (the dynamic-batching trick — padding cost is set by
    the LONGEST sequence in a batch, so batching like-with-like wins
    ~(max/mean − 1) of the compute back).

    Deterministic: ties inside ntile break on ``id_col``. Returns
    (id, n_tokens, bucket 1-based). ONE global-ordering window — this is
    the honest cost of exact equal-population buckets; at 100 TB switch
    the boundary discovery to approx percentiles and keep the same
    output contract."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    n_toks = token_count(text_col)
    w = Window.orderBy(F.col("n_tokens").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), n_toks.cast("long").alias("n_tokens"))
        .withColumn("bucket", F.ntile(n_buckets).over(w))
    )


def source_quality_filter(
    df: DataFrame,
    min_docs: int = 1,
    min_mean_quality: float = 0.0,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Domain/source-LEVEL filtering (the RefinedWeb / FineWeb recipe):
    aggregate per-document quality to the source (domain) and keep or
    drop WHOLE sources — a complement to per-doc filters, because spam
    farms produce individually-plausible pages whose domain-level
    statistics give them away. Returns one row per source:
    (source, n_docs, mean_quality, keep); compose downstream with a
    broadcast semi-join of kept sources against the corpus.

    mean_quality is DECIMAL-accumulated over the rounded per-doc
    heuristic score (sum order cannot perturb the double), then rounded —
    the value is engine-portable. One map-side-combined shuffle on the
    source key; the quality score itself is a codegen projection."""
    from cdc_connector_spark.ops.textstats import quality_score

    per = df.select(
        F.col(source_col),
        F.round(quality_score(text_col), 6).cast("decimal(18,6)").alias("q"),
    )
    return (
        per.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("q").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_quality"),
        )
        .select(
            source_col,
            "n_docs",
            "mean_quality",
            (
                (F.col("n_docs") >= F.lit(min_docs))
                & (F.col("mean_quality") >= F.lit(min_mean_quality))
            ).alias("keep"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset-version diff (the data-card / reproducibility op): compare
    two corpus versions by id and CONTENT fingerprint (md5 of the
    normalized text — formatting-only edits don't count as changes) and
    report one row per id with status ∈ {added, removed, changed,
    unchanged}. The audit artifact between two pipeline runs: what did
    the new filters/dedup actually do.

    Full-outer join on the id — one co-partitioned shuffle each side,
    fingerprints computed in the scan projection; no text leaves the
    exchange (32-hex fingerprints only)."""
    from cdc_connector_spark.ops.textstats import fingerprint

    o = old.select(F.col(id_col), fingerprint(text_col).alias("__fp_old"))
    n = new.select(F.col(id_col), fingerprint(text_col).alias("__fp_new"))
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("__fp_old").isNull(), F.lit("added"))
            .when(F.col("__fp_new").isNull(), F.lit("removed"))
            .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def budget_mixture(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Token-budget mixture selection (the Pile/Dolma "data recipe" step):
    given target source PROPORTIONS and a total token budget, select
    documents per source — deterministically — until each source reaches
    its share. Returns the selected (id, source, n_tokens).

    Exact arithmetic contract: weights are taken at 6-decimal precision
    and each source's target is ``total_tokens · w6 // Σw6`` (pure integer
    — engine-portable, no float proportions). Selection within a source
    is by the portable multiplicative hash (ties by id), and a document is
    kept while the PRE-document cumulative token count is below the
    target — so the budget is crossed at most once per source (standard
    recipe semantics: slightly over, never starved), a source with a
    positive target always contributes at least one document, and sources
    absent from ``weights`` are dropped.

    One stratum-keyed window shuffle (the same cost class as
    stratified/quota sampling); token counts are computed in the scan
    projection. Compose upstream of ``pack_sequences``/``shard_plan``."""
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    if not weights:
        raise ValueError("weights must be a non-empty {source: proportion} map")
    w6 = {s: int(round(w * 1_000_000)) for s, w in weights.items()}
    if any(w <= 0 for w in w6.values()):
        raise ValueError("every mixture weight must be positive at 1e-6 precision")
    sumw = sum(w6.values())
    target = None
    for s, w in sorted(w6.items()):
        t = total_tokens * w // sumw
        cond = F.col(source_col) == F.lit(s)
        target = F.when(cond, t) if target is None else target.when(cond, t)
    target = target.otherwise(F.lit(-1))  # unlisted source: never selected
    h = knuth_hash(id_col, salt)
    win = (
        Window.partitionBy(source_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn("__cum_before", F.coalesce(F.sum("n_tokens").over(win), F.lit(0)))
        .filter(F.col("__cum_before") < target)
        .drop("__cum_before")
    )


def curriculum_plan(
    df: DataFrame,
    score_col: str,
    cuts: list[float],
    n_shards: int = 8,
    key_col: str = "doc_id",
    higher_is_easier: bool = True,
) -> DataFrame:
    """Curriculum ordering for training export: assign every doc a
    ``stage`` (0 = easiest) from explicit difficulty-score ``cuts``, a
    deterministic hash ``shard`` within the stage, and a hash-shuffled
    ``pos`` within (stage, shard) — the reader consumes (stage, shard,
    pos) lexicographically and gets easy→hard progression with
    decorrelated order inside each stage (the ``shard_plan`` property,
    staged).

    ``cuts`` are stage boundaries on the score, best-first: with
    ``higher_is_easier`` (quality-like scores), stage 0 is score ≥
    cuts[0], stage 1 is ≥ cuts[1], …, last stage is the rest; pass
    ``higher_is_easier=False`` for loss-like scores (NLL: low = easy).
    Explicit cuts — not quantiles — so the plan is stable across corpus
    versions and engine-replayable (the PSI explicit-bins rule).

    Everything derives from the portable md5 fold of ``key_col``, so the
    WHOLE plan value-verifies; the ``pos`` window partitions by
    (stage, shard) — parallelism n_shards×stages, each partition
    1/n_shards of a stage (pick n_shards for the target file size, same
    sizing rule as shard_plan)."""
    if not cuts:
        raise ValueError("cuts must be non-empty (else use shard_plan)")
    if sorted(cuts, reverse=higher_is_easier) != list(cuts):
        raise ValueError("cuts must be ordered best-stage-first")
    from cdc_connector_spark.ops.sketch import portable_hash60

    sc = F.col(score_col)
    stage = None
    for i, c in enumerate(cuts):
        cond = sc >= F.lit(c) if higher_is_easier else sc <= F.lit(c)
        stage = F.when(cond, F.lit(i)) if stage is None else stage.when(cond, F.lit(i))
    stage = stage.otherwise(F.lit(len(cuts))).cast("int")
    shard = F.pmod(portable_hash60(F.col(key_col), salt="shard"), F.lit(n_shards)).cast(
        "int"
    )
    order_key = portable_hash60(F.col(key_col), salt="pos")
    out = df.withColumn("stage", stage).withColumn("shard", shard)
    w = Window.partitionBy("stage", "shard").orderBy(
        order_key.asc(), F.col(key_col).asc()
    )
    return out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))


def corpus_inventory(
    df: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Corpus governance inventory: one row per (source, language) with
    document/character counts, the cell's share of its source, and a
    dominant-language flag (most docs; ties to the lexicographically
    first language — a total order) — the what-is-actually-in-my-mix
    readout that licensing review, mixture design, and lang-filter
    sanity checks all start from.

    Exact integers + one fixed IEEE division; NULL source/lang surface
    as '<NULL>' cells (silent drops hide exactly the provenance holes an
    inventory exists to find). One (source, lang)-keyed collapse; the
    rank window runs over the collapsed ≤|sources|·|langs| table."""
    per = (
        df.groupBy(
            F.coalesce(F.col(source_col).cast("string"), F.lit("<NULL>")).alias(
                "source"
            ),
            F.coalesce(F.col(lang_col).cast("string"), F.lit("<NULL>")).alias("lang"),
        )
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.coalesce(F.col(chars_col).cast("long"), F.lit(0))).alias("chars"),
        )
    )
    w_tot = Window.partitionBy("source")
    w_rank = Window.partitionBy("source").orderBy(
        F.col("docs").desc(), F.col("lang").asc()
    )
    return per.select(
        "source",
        "lang",
        "docs",
        "chars",
        F.round(
            F.col("docs").cast("double") / F.sum("docs").over(w_tot).cast("double"), 6
        ).alias("share_of_source"),
        (F.row_number().over(w_rank) == 1).alias("dominant"),
    )


def duplicate_rate_by_source(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source exact-duplicate exposure: for each source, how many of
    its documents share a normalized fingerprint with ANY other document
    in the corpus (cross-source duplicates count for BOTH sources — this
    is the provenance view: "which feeds are sending me copies", the
    first question after ``corpus_inventory``). Returns (source, docs,
    dup_docs, dup_rate) with rate = one fixed IEEE division rounded 6.

    Shape: one fingerprint census keyed by the md5 fingerprint, one
    fingerprint-keyed join back, one source-keyed collapse. NULL sources
    surface as '<NULL>' (the inventory rule)."""
    from cdc_connector_spark.ops.textstats import fingerprint

    base = df.select(
        F.coalesce(F.col(source_col).cast("string"), F.lit("<NULL>")).alias("source"),
        fingerprint(text_col).alias("__fp"),
    )
    census = base.groupBy("__fp").agg(F.count(F.lit(1)).alias("__c"))
    return (
        base.join(census, "__fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("__c") >= 2, 1).otherwise(0)).alias("dup_docs"),
        )
        .select(
            "source",
            "docs",
            "dup_docs",
            F.round(
                F.col("dup_docs").cast("double") / F.col("docs").cast("double"), 6
            ).alias("dup_rate"),
        )
    )


def consistent_fk_sample(
    parent: DataFrame,
    children: list[tuple[str, DataFrame, str]],
    key_col: str,
    pct: int,
    salt: int = 0,
) -> DataFrame:
    """Referentially-CONSISTENT sampling across a foreign-key chain:
    hash-sample the PARENT keys (the ``hash_sample`` multiplicative
    hash — deterministic, engine-portable, a pushed-down filter), then
    keep exactly the child rows whose FK points at a sampled parent.
    The fixture/dev-dataset generator every pipeline team ends up
    writing: a row-wise sample of each table independently breaks every
    join (1% of customers ⋈ 1% of orders ≈ 0.01% joinable); sampling
    the ENTITY and closing over its children keeps referential
    integrity at the target rate.

    ``children`` is [(name, df, fk_col), ...]. Returns the audit
    summary — one row per table: (table, rows_kept, distinct_keys) —
    the sampled frames themselves come from ``consistent_fk_frames``
    when the caller wants the data, not the report.

    Shape: the parent filter is scan-pushed arithmetic; each child is
    ONE semi-join against the sampled key set (broadcast when the
    parent sample is small — the usual case at single-digit pct), never
    a row-wise child sample. At 100 TB the semi-join is the unavoidable
    cost of consistency; bucket both sides on the FK to make it
    exchange-free."""
    frames = consistent_fk_frames(parent, children, key_col, pct, salt)
    parts = []
    for name, df, fk in frames:
        parts.append(
            df.groupBy().agg(
                F.lit(name).alias("table"),
                F.count(F.lit(1)).alias("rows_kept"),
                F.count_distinct(F.col(fk)).alias("distinct_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("table", "rows_kept", "distinct_keys").orderBy("table")


def consistent_fk_frames(
    parent: DataFrame,
    children: list[tuple[str, DataFrame, str]],
    key_col: str,
    pct: int,
    salt: int = 0,
) -> list[tuple[str, DataFrame, str]]:
    """The sampled frames behind ``consistent_fk_sample``: [(name,
    sampled_df, fk_col), ...] with the parent first. See there for
    semantics."""
    sampled = hash_sample(parent, pct, key_col=key_col, salt=salt)
    keys = sampled.select(F.col(key_col).alias("__k")).distinct()
    out = [("parent", sampled, key_col)]
    for name, df, fk in children:
        # no broadcast hint: AQE converts the semi-join to broadcast
        # when the sampled key set is small (the usual case), and keeps
        # a shuffle join when a high pct makes it large
        kept = df.join(keys, df[fk] == keys["__k"], "left_semi")
        out.append((name, kept, fk))
    return out
