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

    Limitation (content-derived salt): EXACT duplicate rows of a hot key
    all hash to the same salt bucket, so skew protection degrades on
    duplicate-heavy hot keys — any deterministic content-derived salt has
    this property (a nondeterministic salt is unsound under task
    recompute, see the inline SPARK-23207 note). Dedup or pre-aggregate
    the big side first if its hot keys are mostly exact duplicates.
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
    # still spreads a hot key's rows across buckets. xxhash64 rejects
    # unhashable column types (MapType) at analysis time — r15 advisor —
    # so hash only the hashable columns; the keys are always hashable
    # (they are equality-join keys), so the salt still sees every row's
    # key plus whatever payload distinguishes rows within a hot key.
    def _hashable(dt):
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    salt_cols = [f.name for f in big.schema.fields if _hashable(f.dataType)]
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)).cast("int"),
    )
    small_s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    out = big_s.join(small_s, keys + ["__salt"], how)
    return out.drop("__salt")
