"""Approximate string matching / entity resolution: blocked fuzzy joins.

The record-linkage primitive (Fellegi–Sunter blocking + edit-distance
verify): find pairs of strings within a Levenshtein budget WITHOUT the
all-pairs cross join — the dedup story for entity NAMES (customers,
merchants, addresses, product titles), where token-level dedup
(MinHash/winnowing) is too coarse and exact dedup too strict.

Spark-first shape, same discipline as the shingle family:
- candidates come from an inverted-index self-join on shared TOKENS
  (any true pair within distance d shares at least one unedited token
  whenever d < number of tokens — stated, not assumed: a pair whose
  every token is edited is invisible to token blocking; shrink to
  character q-grams via ``block="qgram"`` when that matters),
- a LENGTH prefilter (|len_a − len_b| ≤ d, a Levenshtein lower bound)
  prunes candidates before the O(len²) verify,
- hot blocking keys above ``max_token_freq`` are dropped BEFORE the
  self-join (the stop-shingle rule; "inc" blocks every company name),
- the verify is the built-in JVM ``levenshtein`` — codegen, no UDF.

At 100 TB: cost is O(Σ posting-list²) bounded by the frequency cap +
O(candidates · len²) verify; both knobs are explicit. On corpora where
EVERY key is hot (uniform synthetic names — the r11 10× rehearsal,
SCALING §4o), the cap trades recall to zero when it binds; the
recall-PRESERVING alternative is ``selection="prefix"`` (Ed-Join
prefix filtering, Xiao/Wang/Lin VLDB'08): keep only each record's
q·max_dist + 1 globally-RAREST keys — any pair within the edit budget
must still share a kept key (an edit destroys at most q distinct
q-grams / 2 tokens, so the two prefix sets provably intersect), while
candidate volume tracks the rare-key posting lists instead of Σ f².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _char_qgrams(s, q: int):
    """Distinct character ``q``-grams of ``s`` as array<string>, built
    as a chain of shifted-slice ``zip_with``s over the char array —
    O(len) per row and codegen-friendly. The obvious
    ``transform(sequence(1, n-q+1), i -> substring(s, i, q))`` form
    yields the same grams but evaluates ``substring`` inside an
    interpreted lambda per position — O(len²) per document, harmless on
    18-char names and lethal on 300-char documents (the
    textstats.word_ngrams lesson, measured again here: the r13
    documents entry spent most of its wall re-evaluating this).
    Strings shorter than ``q`` key on their full text (parity with the
    clamped-substring behavior of the old form)."""
    chars = F.split(s, "")
    out = chars
    n = F.size(chars)
    for j in range(2, q + 1):
        m = F.greatest(n - F.lit(j - 1), F.lit(0))
        out = F.zip_with(
            F.slice(out, 1, m), F.slice(chars, j, m), lambda a, b: F.concat(a, b)
        )
    return F.when(F.length(s) < q, F.array(s)).otherwise(F.array_distinct(out))


def _delete_neighborhood(s, max_dist: int):
    """Column expression: array of every string obtainable from ``s``
    by deleting up to ``max_dist`` characters (the SymSpell key set) —
    includes ``s`` itself (0 deletions). Pure built-ins: one
    ``transform`` per deletion level, flattened."""
    def deletes(col):
        n = F.length(col)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            # drop the i-th char: prefix [1, i) ++ suffix (i, n]
            lambda i: F.concat(
                F.substring(col, F.lit(1), i - 1), F.substring(col, i + 1, n)
            ),
        )

    levels = [F.array(s)]
    for _ in range(max_dist):
        prev = levels[-1]
        levels.append(F.flatten(F.transform(prev, lambda v: deletes(v))))
    return F.array_distinct(F.concat(*levels))


def _normalized(
    df: DataFrame, text_col: str, id_col: str, extra_block_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(__id, __s [, __x_*]) normalized base — lower + trim + whitespace
    collapse, empty strings dropped. Factored out of ``_blocking_index``
    so ``fuzzy_pairs`` can re-attach strings to the collapsed pair set
    WITHOUT re-deriving the exploded key index (r13)."""
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    return df.select(
        F.col(id_col).alias("__id"),
        norm.alias("__s"),
        *[F.col(c).alias(f"__x_{c}") for c in extra_block_cols],
    ).filter(F.col("__s") != "")


def _blocking_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block: str,
    qgram: int,
    extra_block_cols: tuple[str, ...] = (),
    max_dist: int = 0,
) -> DataFrame:
    """(__id, __s, __k [, __x_*]) inverted index — the shared key
    derivation of ``fuzzy_pairs`` and ``fuzzy_dropped_keys`` (one
    definition so the audit can never drift from what the matcher
    actually blocks on). ``extra_block_cols`` are carried as __x_<col>
    columns for deterministic-attribute gating in the candidate join.
    ``block="delete"`` keys on the ≤``max_dist``-deletion neighborhood
    (SymSpell): two strings within Levenshtein ``max_dist`` ALWAYS share
    a key (delete each side's edit-touched characters from the common
    alignment — ≤ max_dist deletions per side reach a common string),
    so the index is complete with NO cap and no selection step."""
    if block not in ("token", "qgram", "delete"):
        raise ValueError(f"block must be token/qgram/delete, got {block!r}")
    base = _normalized(df, text_col, id_col, extra_block_cols)
    if block == "token":
        keys = F.array_distinct(F.split(F.col("__s"), " "))
    elif block == "qgram":
        keys = _char_qgrams(F.col("__s"), qgram)
    else:
        keys = _delete_neighborhood(F.col("__s"), max_dist)
    return base.select(
        "__id",
        "__s",
        *[f"__x_{c}" for c in extra_block_cols],
        F.explode(keys).alias("__k"),
    )


def fuzzy_dropped_keys(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_token_freq: int = 1000,
    block: str = "token",
    qgram: int = 3,
    extra_block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The blocking keys ``fuzzy_pairs`` will DROP at the same
    ``max_token_freq`` — (key, n_records) rows, largest first, plus the
    share of records whose EVERY key is dropped (those records cannot
    match anything: the silent recall hole). The winnow
    ``max_df``/simhash bucket-audit pattern applied to entity blocking;
    run it before trusting pair output on a new corpus — the r11 10×
    rehearsal measured cap=100 on a 10× TPC-H corpus dropping every
    discriminative gram and returning 0 pairs (SCALING §4o). Pass the
    SAME ``extra_block_cols`` as the fuzzy_pairs call being audited —
    since r15 the cap counts the full join key (gram + attrs)."""
    inv = _blocking_index(df, text_col, id_col, block, qgram, extra_block_cols)
    cap_keys = ["__k", *[f"__x_{c}" for c in extra_block_cols]]
    return (
        inv.groupBy(*cap_keys)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > max_token_freq)
        .select(F.col("__k").alias("key"), *[F.col(f"__x_{c}").alias(c) for c in extra_block_cols], "n_records")
        .orderBy(F.col("n_records").desc(), F.col("key").asc())
    )


def fuzzy_blocking_coverage(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_token_freq: int = 1000,
    block: str = "token",
    qgram: int = 3,
    extra_block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """ONE row: (records, blocked_records, orphaned_records,
    orphaned_share) at the given cap — ``orphaned_records`` have NO
    surviving blocking key, so ``fuzzy_pairs`` is structurally blind to
    them however close a match exists. ``records`` counts EVERY input
    row: a NULL/whitespace-only name has no keys at all (fuzzy_pairs
    drops it the same way) and counts as orphaned — excluding those
    would report "full coverage" on exactly the corpus the audit exists
    to flag. The go/no-go summary on top of ``fuzzy_dropped_keys``: an
    orphaned_share above ~0 on a corpus with expected duplicates means
    the cap over-binds (raise it or shrink qgram). Pass the SAME
    ``extra_block_cols`` as the audited fuzzy_pairs call (r15: the cap
    counts the full join key)."""
    inv = _blocking_index(df, text_col, id_col, block, qgram, extra_block_cols)
    cap_keys = ["__k", *[f"__x_{c}" for c in extra_block_cols]]
    freq = inv.groupBy(*cap_keys).agg(F.count(F.lit(1)).alias("__f"))
    # shuffle_hash-pinned: the key-frequency table is |distinct keys| and
    # can be corpus-scale — co-partition on __k, never let AQE
    # runtime-broadcast it (the 100x-measured hazard, see _prefix_select)
    per_rec = (
        inv.join(freq.hint("shuffle_hash"), cap_keys)
        .groupBy("__id")
        .agg(F.sum((F.col("__f") <= max_token_freq).cast("long")).alias("__kept"))
    )
    # LEFT join from the full record set: rows the blocking index never
    # saw (NULL/empty names) surface with __kept NULL -> orphaned
    everyone = df.select(F.col(id_col).alias("__id"))
    joined = everyone.join(per_rec, "__id", "left")
    orphan = F.coalesce(F.col("__kept"), F.lit(0)) == 0
    return joined.agg(
        F.count(F.lit(1)).alias("records"),
        F.sum((~orphan).cast("long")).alias("blocked_records"),
        F.sum(orphan.cast("long")).alias("orphaned_records"),
        F.round(
            F.sum(orphan.cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("orphaned_share"),
    )


def fuzzy_prefix_hotspots(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    block: str = "token",
    qgram: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """The COST audit for ``selection="prefix"``: (key, n_records) of
    the largest post-selection posting lists, largest first. Prefix
    selection never loses recall, so its failure axis is candidate
    VOLUME, not blindness — a kept key with an n-record posting list
    contributes ~n²/2 candidate pairs. Big rows here mean many records
    whose q·max_dist+1 RAREST keys coincide (near-identical records —
    where true matches are dense — or a corpus whose key-frequency
    histogram is flat); that cost is inherent to the match density, but
    this audit prices it before the join runs."""
    inv = _blocking_index(df, text_col, id_col, block, qgram)
    kept = _prefix_select(inv, block, qgram, max_dist, ())
    return (
        kept.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy(F.col("n_records").desc(), F.col("__k").asc())
        .select(F.col("__k").alias("key"), "n_records")
        .limit(top_k)
    )


def _prefix_select(
    inv: DataFrame,
    block: str,
    qgram: int,
    max_dist: int,
    extra_block_cols: tuple[str, ...],
    carry: bool = False,
) -> DataFrame:
    """Ed-Join prefix selection over the inverted index: keep each
    record's ``plen`` rarest keys under the global total order
    (doc-frequency ASC, key ASC — ties broken identically everywhere,
    the condition for the prefix-intersection theorem).

    Completeness (why plen is what it is): one edit destroys at most
    ``qgram`` distinct q-grams (only grams overlapping the edit window
    can lose their last occurrence) or at most 2 tokens (a space
    deletion merges two), so ed ≤ d ⇒ |keys(a) ∖ keys(b)| ≤ u·d with
    u = qgram or 2, i.e. overlap ≥ |keys(a)| − u·d; by the prefix
    filtering principle the (u·d + 1)-prefixes of both sides under any
    shared total order must then intersect. Frequencies are computed on
    the FULL index (before any attribute gate) — any consistent global
    order preserves the theorem, and sharing one keeps the audit and
    the matcher aligned."""
    plen = (qgram if block == "qgram" else 2) * max_dist + 1
    freq = inv.groupBy("__k").agg(F.count(F.lit(1)).alias("__f"))
    # shuffle_hash-PINNED census join (r16): |distinct keys| is
    # corpus-scale, and it is not enough to avoid a forced broadcast —
    # AQE's runtime re-planning judges the census by its COMPRESSED
    # shuffle bytes and happily broadcasts a relation whose deserialized
    # HashedRelation is GBs (measured at the 100x rehearsal: the r15
    # 776.8 s fuzzy_prefix cell was driver broadcast-build time, not
    # candidate volume — 116 s with the census joins pinned off
    # broadcast, and the 28 GB driver OOMed outright once the census
    # grew past it). shuffle_hash co-partitions on __k with no sort and
    # no driver collect at ANY census size.
    # The text column is collapsed to its LENGTH before the window
    # exchange — downstream only needs (id, len, key) for the candidate
    # join (r13: on 300-char documents, carrying __s shuffled 200 MB
    # per join side for a column the pair join never reads).
    w = Window.partitionBy("__id").orderBy(F.col("__f").asc(), F.col("__k").asc())
    # ``carry`` keeps __s alongside (short-string mode, see _CARRY_LEN):
    # only sane when the strings are trivially small
    scols = ["__s"] if carry else []
    return (
        inv.select(
            "__id",
            F.length("__s").alias("__len"),
            *scols,
            *[f"__x_{c}" for c in extra_block_cols],
            "__k",
        )
        .join(freq.hint("shuffle_hash"), "__k")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= plen)
        .select("__id", "__len", *scols, *[f"__x_{c}" for c in extra_block_cols], "__k")
    )


#: Posting-list size above which the straggler grid splits a hot key
#: (and, in cap mode, the bound at/below which fuzzy_pairs can skip
#: the grid's freq join entirely). ONE shared constant for both
#: decisions: drifting either literal would silently leave cap-mode
#: postings between the two values unprotected (advisor, r14).
_HOT_CHUNK = 4096

#: fuzzy_pairs' string-carry mode is an EXPLICIT opt-in only (r14).
#: History: the r14 verdict asked for a length-aware branch that carries
#: short strings through the candidate join instead of re-attaching by
#: id. Implemented, pinned (pair-set equality in all four mode combos),
#: measured — and then REJECTED as a default by the 10× rehearsal
#: (SCALING §4t, tools/scale_rehearsal_r14b.py): on 1.5M 18-char names
#: the carry branch is 1.4–1.6× SLOWER than id-only re-attach in both
#: token and gated-qgram modes (collision rows widen from 12 bytes to
#: 50+, and the pair DISTINCT dedupes strings instead of ids — CPU that
#: grows with candidate volume), while its fixture-scale "win" was two
#: saved join STAGES (~0.3 s of per-stage overhead that vanishes at
#: scale). The id-only candidate join is the right shape at every
#: corpus size; carry_strings=True remains for interactive use on tiny
#: frames where stage count dominates.


def _pair_candidates(
    idx: DataFrame,
    xcols: list[str],
    max_dist: int,
    hot_chunk: int | None = _HOT_CHUNK,
    max_fanout: int = 1024,
    carry: bool = False,
) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs from the (__id, __len,
    __k [, __x_*]) index self-join, STRAGGLER-SAFE on hot posting lists
    (r13, the r12 verdict's prefix-mode tail): a blocking key whose
    posting list holds f records emits f² collision rows inside ONE
    join task — skew AQE cannot split, because the expansion happens
    inside the task, invisible to input-size stats (observed directly
    as the single-task tail in the SCALING §4p rehearsal).

    Grid (triangle) split, Okcan/Riedewald theta-join style: keys with
    f > ``hot_chunk`` are cut into m = min(ceil(f/chunk), ``max_fanout``)
    hash-chunks per key; chunk-pair task (i ≤ j) receives chunk i as
    the A role (exploded over partners j ≥ i) and chunk j as the B role
    (exploded over partners i ≤ j), so each unordered row pair meets in
    EXACTLY one of the m(m+1)/2 tasks and no task holds more than
    (f/m)² collisions. Replication cost: hot rows shuffle ≤ 2m× (ids +
    lengths only — bytes are trivial); cold keys keep the plain a < b
    self-join. ``max_fanout`` is 1024 since r15: the old cap of 16 let
    per-GROUP work grow quadratically again past f = 16·chunk ≈ 65k
    (the r15 100× rehearsal hit a single join group grinding for 25+
    minutes on a 38k-row posting amplified by a fixture artifact) — a
    chunk pair is a shuffle GROUP, not a Spark task, so a large m costs
    only the ≤2m× replication of 12-byte rows while keeping every
    group's collision count ≤ chunk² regardless of f. Pair-set equality with the unsplit join is structural
    (hot pairs emit as (least, greatest) and the shared DISTINCT
    collapses both paths) and pinned in tests + the 10× rehearsal.

    With ``carry`` the index also holds ``__s`` and the pairs come out
    as (id_a, id_b, __sa, __sb) — the SHORT-string mode (see
    _CARRY_LEN): the strings ride the collision shuffle and the
    downstream re-attach joins disappear. __s is functionally dependent
    on __id, so the DISTINCT cardinality is unchanged."""
    jk = ["__k", *xcols]
    sa = [F.col("__s").alias("__sa")] if carry else []
    sb = [F.col("__s").alias("__sb")] if carry else []
    out_cols = ["id_a", "id_b", *(["__sa", "__sb"] if carry else [])]
    if hot_chunk is None:
        # caller has already BOUNDED postings (cap mode with
        # max_token_freq <= the hot threshold: no key can be hot, so the
        # grid's freq join would be pure overhead — it cost cap-mode
        # entries ~1.5x at fixture scale for zero protection, r13 bench
        # diff). Plain a < b self-join.
        l = idx.select(
            F.col("__id").alias("id_a"), F.col("__len").alias("__la"), *sa, *jk
        )
        r = idx.select(
            F.col("__id").alias("id_b"), F.col("__len").alias("__lb"), *sb, *jk
        )
        return (
            l.join(r, jk)
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
            )
            .select(*out_cols)
            .distinct()
        )
    freq = idx.groupBy(*jk).agg(F.count(F.lit(1)).alias("__f"))
    # shuffle_hash-pinned: the grid census is |distinct join keys| =
    # corpus-scale, the AQE-runtime-broadcast hazard measured at the
    # 100x rehearsal (see _prefix_select) — co-partition, never collect
    g = idx.join(freq.hint("shuffle_hash"), jk).withColumn(
        "__m",
        F.least(
            F.ceil(F.col("__f") / F.lit(hot_chunk)), F.lit(max_fanout)
        ).cast("int"),
    )
    cold = g.filter(F.col("__m") <= 1)
    l = cold.select(
        F.col("__id").alias("id_a"), F.col("__len").alias("__la"), *sa, *jk
    )
    r = cold.select(
        F.col("__id").alias("id_b"), F.col("__len").alias("__lb"), *sb, *jk
    )
    pairs_cold = (
        l.join(r, jk)
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length gap is a Levenshtein lower bound — prune pre-verify
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        )
        .select(*out_cols)
    )
    hot = g.filter(F.col("__m") > 1).withColumn(
        "__ci",
        F.pmod(F.xxhash64(F.col("__id").cast("string")), F.col("__m")).cast("int"),
    )
    a = hot.select(
        F.col("__id").alias("id_a"),
        F.col("__len").alias("__la"),
        *sa,
        *jk,
        F.col("__ci").alias("__i"),
        F.explode(
            F.sequence(F.col("__ci"), F.col("__m") - 1)
        ).alias("__j"),
    )
    b = hot.select(
        F.col("__id").alias("id_b"),
        F.col("__len").alias("__lb"),
        *sb,
        *jk,
        F.explode(F.sequence(F.lit(0), F.col("__ci"))).alias("__i"),
        F.col("__ci").alias("__j"),
    )
    ordered = F.col("id_a") < F.col("id_b")
    hot_out = [
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    ]
    if carry:
        # swap the carried strings with the ids so __sa stays the
        # smaller-id side's string (parity with the cold branch)
        hot_out += [
            F.when(ordered, F.col("__sa")).otherwise(F.col("__sb")).alias("__sa"),
            F.when(ordered, F.col("__sb")).otherwise(F.col("__sa")).alias("__sb"),
        ]
    pairs_hot = (
        a.join(b, jk + ["__i", "__j"])
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        )
        .select(*hot_out)
    )
    return pairs_cold.unionByName(pairs_hot).distinct()


def fuzzy_pairs(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    max_token_freq: int = 1000,
    block: str = "token",
    qgram: int = 3,
    extra_block_cols: tuple[str, ...] = (),
    selection: str = "cap",
    carry_strings: bool = False,
    cap_prune: bool | None = None,
) -> DataFrame:
    """(id_a < id_b, dist) pairs with Levenshtein(normalized names) ≤
    ``max_dist``. Normalization = lower + trim + whitespace collapse
    (edit distance over the display form, not a phonetic key).

    ``block="token"`` blocks on whole words (recall caveat in the module
    header); ``block="qgram"`` blocks on character ``qgram``-grams —
    complete for any pair with a shared unedited q-gram run, i.e. all
    pairs when max_dist·q < len (pigeonhole), at higher candidate cost.

    ``extra_block_cols`` ANDs deterministic attributes into the
    candidate join key (the Fellegi–Sunter deterministic+probabilistic
    compose): candidates only form between records with EQUAL values in
    every listed column (NULLs match nothing, the SQL gate convention),
    so a downstream exact-attribute gate moves INTO the blocking join
    and the candidate fan-out shrinks by the attribute cardinality.
    The frequency cap counts the FULL join key (key + attrs) since r15
    — REVERSING the r11 "global per gram on purpose" rule, which the
    100× rehearsal refuted decisively: on 1.5M gated customers every
    one of the 2,299 grams crossed the global cap (recall collapsed to
    ZERO pairs) while ZERO (gram, nation, segment) join keys were hot
    (tools/scale_rehearsal_r15.py). The join's Σf² cost and its
    straggler risk are both properties of the FULL key's posting list —
    the list the join actually expands — so that is the thing the cap
    must bound; a "revived stop-gram" whose per-block posting sits
    under the cap is by definition cheap in this join, and the
    hot-chunk grid still bounds any task regardless. Without
    ``extra_block_cols`` the rule is unchanged (the full key IS the
    gram). Output equals the UNGATED pair set ∩ attribute-equality
    only when neither run trips the cap; under pressure the gated run
    keeps strictly more true pairs (its postings are smaller).

    ``selection`` picks the candidate-pruning strategy:
    - ``"cap"`` (default): drop keys with doc-frequency >
      ``max_token_freq`` — cheap, but records whose EVERY key is hot
      become invisible (audit with ``fuzzy_blocking_coverage``). Since
      the r15 optimization round, GATED cap mode (``extra_block_cols``
      non-empty) additionally keeps only each record's
      (u·max_dist + 1) rarest SURVIVING keys before the candidate join
      — the Ed-Join prune composed on top of the cap, which provably
      returns the identical pair set (see the inline proof in the cap
      branch) while the join fans out on the prefix postings instead
      of every under-cap posting. The prune defaults ON exactly when a
      gate is present because the gate is what re-creates quadratic
      postings under the cap (it splits globally-hot keys into
      under-cap per-block lists: 16.5 s → 2.5 s on the gated sf0.1
      customers entry), while ungated corpora have those keys dropped
      by the cap itself and the prune's two extra index exchanges
      measured pure overhead (2.8 s → 4.6 s, zero candidate
      reduction). ``cap_prune`` overrides the auto rule in either
      direction (output identical either way).
    - ``"prefix"``: Ed-Join prefix filtering — keep each record's
      (q·max_dist + 1) globally-rarest keys; ZERO recall loss RELATIVE
      TO the underlying blocking by the prefix-intersection theorem
      (see ``_prefix_select``), output ⊇ the cap-mode output at any
      cap. The blocking itself is complete only for strings long
      enough to guarantee a shared unedited key — for ``qgram`` that is
      len(normalized) ≥ q·(max_dist+1) (shorter pairs can differ by
      one edit yet share no q-gram: 'abcd'/'abxd' at q=3); below that
      length use ``block="delete"``, which is lossless at any length.
      ``max_token_freq`` is IGNORED
      (a drop would void the guarantee); audit candidate cost with
      ``fuzzy_prefix_hotspots``. The right mode for SKEWED-frequency
      corpora where the cap over-binds (SCALING §4o/§4p) — but on
      UNIFORM keys its rare-gram posting lists grow ∝ corpus and the
      candidate join becomes hot-posting straggler-bound (measured 4×
      the delete mode's wall at 10×, §4p).

    ``block="delete"`` is the lossless mode that also stays ~LINEAR on
    uniform keys (SymSpell deletion-neighborhood blocking, max_dist ≤ 2
    only — key count per record is C(len, d)): keys are every
    ≤max_dist-deletion variant of the normalized string, so postings
    are bounded by the alphabet-sized family of strings one edit apart
    — independent of corpus size unless true duplicates are dense
    (where the candidates ARE the matches). No cap and no selection
    apply (both would void completeness; ``selection="prefix"`` is
    rejected, ``max_token_freq`` ignored). Built for short key-like
    strings (names, codes); prefer qgram+prefix for long text.

    ``carry_strings`` picks how the normalized strings reach the
    verify: ``False`` (default — the scale shape at EVERY corpus size,
    see the module-level history note and SCALING §4t) = id-only
    candidate join + two id-keyed re-attach joins; ``True`` = the
    strings ride the candidate join and the re-attach joins disappear —
    an interactive-only trade: it saves two join stages (~fixed stage
    overhead) but widens every collision row and makes the pair
    DISTINCT dedupe strings, measured 1.4–1.6× slower at 10× even on
    18-char names. Both settings produce the identical pair set
    (pinned)."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if selection not in ("cap", "prefix"):
        raise ValueError(f"selection must be cap/prefix, got {selection!r}")
    if cap_prune is not None and (selection != "cap" or block == "delete"):
        raise ValueError(
            "cap_prune applies only to selection='cap' with token/qgram "
            "blocking (prefix and delete modes have their own pruning rules)"
        )
    if block == "delete":
        if max_dist > 2:
            raise ValueError(
                "block='delete' supports max_dist <= 2 (key count per "
                f"record is C(len, d)); got {max_dist}"
            )
        if selection == "prefix":
            raise ValueError(
                "block='delete' is already complete without selection; "
                "selection='prefix' does not compose with it"
            )
    inv = _blocking_index(
        df, text_col, id_col, block, qgram, extra_block_cols, max_dist=max_dist
    )
    strs = _normalized(df, text_col, id_col)
    carry = carry_strings
    scols = ["__s"] if carry else []
    xcols = [f"__x_{c}" for c in extra_block_cols]
    if block == "delete":
        # complete, self-bounding index: no cap, no selection
        idx = inv.select(
            "__id", F.length("__s").alias("__len"), *scols, "__k", *xcols
        )
    elif selection == "prefix":
        idx = _prefix_select(
            inv, block, qgram, max_dist, extra_block_cols, carry=carry
        )
    elif cap_prune if cap_prune is not None else bool(extra_block_cols):
        # cap + Ed-Join prune composed (r15 optimization round). The cap
        # drops keys whose FULL-join-key posting (gram + extra attrs,
        # r15: the list the join actually expands) exceeds
        # ``max_token_freq``; then each record keeps only its
        # (u·max_dist + 1) RAREST surviving keys. Output is PROVABLY the
        # cap-mode pair set: for two records a, b that share ≥ 1
        # surviving key (the gate implies equal attrs, so both lose the
        # SAME hot keys) and sit within the edit budget,
        # |surv(a) ∖ surv(b)| ≤ |keys(a) ∖ keys(b)| ≤ u·d, so by the
        # prefix-intersection theorem their (u·d + 1)-rarest surviving
        # keys intersect — every cap-mode pair survives the prune; and
        # pruned candidates share a surviving key by construction, so
        # nothing new enters before the levenshtein verify. Candidate
        # volume drops from Σf² over ALL surviving postings to Σf² over
        # the plen-prefix postings. The kept-key frequencies arrive via
        # one co-partitioned equi-join against the full-key census
        # (never a forced broadcast of the kept vocabulary —
        # corpus-scale at 100 TB, the r12 review rule; since r16 the
        # join is shuffle_hash-PINNED so AQE cannot runtime-broadcast
        # the census either — the 100x-measured driver hazard, see
        # _prefix_select). Rare-first
        # ordering is LOAD-BEARING: a hash-random order keeps ~uniform
        # slices of every under-cap posting and saved almost nothing
        # (14.8 s → 13.1 s on the gated sf0.1 entry, vs 2.5 s
        # freq-ordered — measured in the r15 optimization round).
        cap_keys = ["__k", *xcols]
        plen = (qgram if block == "qgram" else 2) * max_dist + 1
        freq = inv.groupBy(*cap_keys).agg(F.count(F.lit(1)).alias("__f"))
        w = Window.partitionBy("__id").orderBy(F.col("__f").asc(), F.col("__k").asc())
        idx = (
            inv.select(
                "__id", F.length("__s").alias("__len"), *scols, "__k", *xcols
            )
            .join(freq.hint("shuffle_hash"), cap_keys)
            .filter(F.col("__f") <= max_token_freq)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= plen)
            .select("__id", "__len", *scols, "__k", *xcols)
        )
    else:
        # plain cap (anti-join the bounded HOT set — freq > cap,
        # ≤ postings/cap keys, the same set fuzzy_dropped_keys audits;
        # the old form broadcast the KEPT set, corpus-scale at 100 TB,
        # r12 review). The UNGATED default: without an attribute gate
        # the cap itself drops the quadratic postings, candidates track
        # true matches, and the prune's per-record window (two extra
        # exchanges of the exploded index — the self-join duplicates
        # the subtree) measured pure overhead at sf0.1: 2.8 s → 4.6 s
        # with ZERO candidate reduction on the customers corpus.
        cap_keys = ["__k", *xcols]
        hot = (
            inv.groupBy(*cap_keys)
            .agg(F.count(F.lit(1)).alias("__f"))
            .filter(F.col("__f") > max_token_freq)
            .select(*cap_keys)
        )
        # the hot set is bounded by Σpostings/cap — still corpus-scale
        # at 100 TB, so the anti-join is shuffle_hash-pinned too (the
        # AQE-runtime-broadcast hazard, see _prefix_select)
        idx = inv.join(hot.hint("shuffle_hash"), cap_keys, "left_anti").select(
            "__id", F.length("__s").alias("__len"), *scols, "__k", *xcols
        )
    # the candidate self-join carries ONLY (id, len, key): at 100 TB the
    # blocked join's shuffle must not haul document text through every
    # key collision (and at any scale the post-join distinct dedupes
    # 12-byte pair rows, not 2×text rows). Strings re-attach AFTER the
    # pair set collapses — two id-keyed joins against the normalized
    # base, whose side is |verified-candidate pairs|, not |collisions|
    # (r13: measured 7× on the documents corpus together with the
    # codegen q-gram derivation above).
    cand = _pair_candidates(
        idx,
        xcols,
        max_dist,
        # the cap mode's postings are bounded by max_token_freq: when the
        # bound sits at/below the hot threshold the grid cannot trigger —
        # skip its freq join entirely (delete/prefix modes keep it: their
        # postings are corpus-dependent)
        hot_chunk=None
        if (
            block != "delete"
            and selection != "prefix"
            and max_token_freq <= _HOT_CHUNK
        )
        else _HOT_CHUNK,
        carry=carry,
    )
    dist = F.levenshtein("__sa", "__sb", max_dist)
    if carry:
        # short-string branch: the strings arrived with the pairs
        return (
            cand.withColumn("dist", dist)
            .filter(F.col("dist") >= 0)
            .select("id_a", "id_b", "dist")
        )
    sa = strs.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"))
    sb = strs.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"))
    # THRESHOLD levenshtein (banded DP, O(len·d) per pair, -1 past the
    # budget) instead of the full O(len²) matrix: identical surviving
    # values, ~len/d× less CPU — on 300-char documents the full form
    # burned 90k DP cells/pair where the band needs ~2.7k, and because
    # AQE sizes post-join partitions by BYTES, the O(len²) verify also
    # ran on 1-2 coalesced partitions (90 MB of pairs) — the band makes
    # verify cost byte-proportional again, so AQE's coalescing stays
    # calibrated (r13: 166 s → sub-10 s on the documents corpus).
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )
