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


def fuzzy_pairs(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    max_token_freq: int = 1000,
    block: str = "token",
    qgram: int = 3,
) -> DataFrame:
    """(id_a < id_b, dist) pairs with Levenshtein(normalized names) ≤
    ``max_dist``. Normalization = lower + trim + whitespace collapse
    (edit distance over the display form, not a phonetic key).

    ``block="token"`` blocks on whole words (recall caveat in the module
    header); ``block="qgram"`` blocks on character ``qgram``-grams —
    complete for any pair with a shared unedited q-gram run, i.e. all
    pairs when max_dist·q < len (pigeonhole), at higher candidate cost."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if block not in ("token", "qgram"):
        raise ValueError(f"block must be token/qgram, got {block!r}")
    norm = F.regexp_replace(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " ")
    base = df.select(F.col(id_col).alias("__id"), norm.alias("__s")).filter(F.col("__s") != "")
    if block == "token":
        keys = F.split(F.col("__s"), " ")
    else:
        n = F.length("__s")
        m = F.greatest(n - (qgram - 1), F.lit(1))
        keys = F.transform(
            F.sequence(F.lit(1), m), lambda i: F.substring(F.col("__s"), i, qgram)
        )
    inv = base.select("__id", "__s", F.explode(F.array_distinct(keys)).alias("__k"))
    ok = (
        inv.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__f"))
        .filter(F.col("__f") <= max_token_freq)
        .select("__k")
    )
    inv = inv.join(F.broadcast(ok), "__k")
    l = inv.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"), "__k")
    r = inv.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"), "__k")
    cand = (
        l.join(r, "__k")
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
