"""Skew-handling join helper: explicit key salting.

AQE's skew-join splitting (on in session.py) covers sort-merge joins it can
observe; salting is the manual tool for the cases AQE can't fix — e.g. a
shuffled join where one key holds 30% of rows and the OTHER side is too big
to broadcast. ``salted_join`` replicates the small(er) side ``salt`` ways and
spreads the big side's hot keys across salt buckets, so no single task owns
a hot key.

Cost model: small side is materialized ``salt``× (explode) — choose
``salt`` ≈ (hot-key rows / target-rows-per-task); the big side gets one extra
narrow column. Use only on demonstrated skew; the default path is AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join ``big ⋈ small`` on equality keys with ``salt``-way key salting.

    Supports how ∈ {inner, left} (the shapes where salting is sound:
    every big-side row keeps exactly the matches it would have had).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)

    # salt must be DETERMINISTIC per row (r14 review): the pre-r14 form
    # hashed monotonically_increasing_id(), which changes when a task is
    # recomputed — and the salt decides the shuffle partition, so a
    # fetch-failure retry could route recomputed rows to different
    # buckets than the ones already fetched (the SPARK-23207 class of
    # row loss/duplication). Hashing the FULL row is deterministic and
    # still spreads a hot key's rows across buckets (only exact
    # duplicate rows co-locate — they would collide under any
    # content-derived salt).
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    small_s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    out = big_s.join(small_s, keys + ["__salt"], how)
    return out.drop("__salt")
