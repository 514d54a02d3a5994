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
O(candidates · len²) verify; both knobs are explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _blocking_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block: str,
    qgram: int,
    extra_block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(__id, __s, __k [, __x_*]) inverted index — the shared key
    derivation of ``fuzzy_pairs`` and ``fuzzy_dropped_keys`` (one
    definition so the audit can never drift from what the matcher
    actually blocks on). ``extra_block_cols`` are carried as __x_<col>
    columns for deterministic-attribute gating in the candidate join."""
    if block not in ("token", "qgram"):
        raise ValueError(f"block must be token/qgram, got {block!r}")
    norm = F.regexp_replace(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " ")
    base = df.select(
        F.col(id_col).alias("__id"),
        norm.alias("__s"),
        *[F.col(c).alias(f"__x_{c}") for c in extra_block_cols],
    ).filter(F.col("__s") != "")
    if block == "token":
        keys = F.split(F.col("__s"), " ")
    else:
        n = F.length("__s")
        m = F.greatest(n - (qgram - 1), F.lit(1))
        keys = F.transform(
            F.sequence(F.lit(1), m), lambda i: F.substring(F.col("__s"), i, qgram)
        )
    return base.select(
        "__id",
        "__s",
        *[f"__x_{c}" for c in extra_block_cols],
        F.explode(F.array_distinct(keys)).alias("__k"),
    )


def fuzzy_dropped_keys(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_token_freq: int = 1000,
    block: str = "token",
    qgram: int = 3,
) -> DataFrame:
    """The blocking keys ``fuzzy_pairs`` will DROP at the same
    ``max_token_freq`` — (key, n_records) rows, largest first, plus the
    share of records whose EVERY key is dropped (those records cannot
    match anything: the silent recall hole). The winnow
    ``max_df``/simhash bucket-audit pattern applied to entity blocking;
    run it before trusting pair output on a new corpus — the r11 10×
    rehearsal measured cap=100 on a 10× TPC-H corpus dropping every
    discriminative gram and returning 0 pairs (SCALING §4o)."""
    inv = _blocking_index(df, text_col, id_col, block, qgram)
    return (
        inv.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > max_token_freq)
        .select(F.col("__k").alias("key"), "n_records")
        .orderBy(F.col("n_records").desc(), F.col("key").asc())
    )


def fuzzy_blocking_coverage(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_token_freq: int = 1000,
    block: str = "token",
    qgram: int = 3,
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
    the cap over-binds (raise it or shrink qgram)."""
    inv = _blocking_index(df, text_col, id_col, block, qgram)
    freq = inv.groupBy("__k").agg(F.count(F.lit(1)).alias("__f"))
    # no broadcast hint: the key-frequency table is |distinct keys| and
    # can be corpus-scale — the equi-join co-partitions on __k instead
    per_rec = (
        inv.join(freq, "__k")
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


def fuzzy_pairs(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    max_token_freq: int = 1000,
    block: str = "token",
    qgram: int = 3,
    extra_block_cols: tuple[str, ...] = (),
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
    The frequency cap stays GLOBAL per key on purpose: a per-(key,
    attrs) cap would revive stop-grams whose per-block frequency dips
    under it (Σ f² per block explodes at scale) — measured in the r11
    rehearsal. Output equals
    ``fuzzy_pairs(...)`` ∩ attribute-equality exactly."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    inv = _blocking_index(df, text_col, id_col, block, qgram, extra_block_cols)
    ok = (
        inv.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__f"))
        .filter(F.col("__f") <= max_token_freq)
        .select("__k")
    )
    inv = inv.join(F.broadcast(ok), "__k")
    xcols = [f"__x_{c}" for c in extra_block_cols]
    l = inv.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"), "__k", *xcols)
    r = inv.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"), "__k", *xcols)
    cand = (
        l.join(r, ["__k", *xcols])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length gap is a Levenshtein lower bound — prune pre-verify
            & (F.abs(F.length("__sa") - F.length("__sb")) <= max_dist)
        )
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("__sa", "__sb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
