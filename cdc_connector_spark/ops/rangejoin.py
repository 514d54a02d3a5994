"""Bin-bucketed range (band) join — point-in-interval without the
BroadcastNestedLoopJoin trap.

Spark plans a pure inequality join (`p BETWEEN lo AND hi`) as a broadcast
nested loop (or cartesian) — O(|points|·|intervals|) comparisons, the
classic scale-killer. The standard fix is bin bucketing: pick a bin width
``w``, replicate each interval to every bin it overlaps
(`sequence(floor(lo/w), floor(hi/w))` + explode), map each point to its
single bin (`floor(p/w)`), EQUI-join on (bin [, extra keys]) and re-check
the exact range as a post-filter. A point lives in exactly ONE bin, so
every qualifying pair appears exactly once — no dedup pass.

Cost model: interval replication factor is `len/w + 1` per interval; work
is O(|points| + |intervals|·(len/w) + candidate pairs within bins) with a
plain hash-shuffle equi-join that AQE can size and skew-split like any
other. Pick ``bin_width`` near the TYPICAL interval length: much smaller
multiplies interval copies, much larger multiplies false candidates per
bin. Everything is JVM-side expression work (sequence/explode/filter) —
no Python, no nested loop.

The as-of join (ops/asof.py) is the temporal cousin (latest-before
semantics via a union-window); this operator is the contains/overlap
case: risk bands, IP ranges, time-interval containment, geo tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    extra_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (and equal ``extra_keys``, if given) via bin
    bucketing. Returns all columns of both inputs (caller projects).

    ``how='inner'`` only: outer variants of a range join need a
    presence-marker design the callers here don't require (and silently
    NULL-extending a replicated side invites miscounts)."""
    if how != "inner":
        raise ValueError("band_join supports how='inner' only")
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    keys = list(extra_keys or [])
    dup = [c for c in points.columns if c in intervals.columns and c not in keys]
    if dup:
        raise ValueError(
            f"ambiguous columns {dup}: rename or project before band_join "
            "(extra_keys are the only columns allowed on both sides)"
        )
    w = float(bin_width)
    p = points.withColumn("__bin", F.floor(F.col(point_col) / w))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    cond = [p["__bin"] == i["__bin"]] + [p[k] == i[k] for k in keys]
    out = (
        p.join(i, cond, "inner")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop(i["__bin"])
        .drop(p["__bin"])
    )
    # drop the duplicated key columns from the interval side
    for k in keys:
        out = out.drop(i[k])
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Interval×interval overlap join: pairs where
    ``left_lo <= right_hi AND right_lo <= left_hi`` (closed intervals),
    via the same bin replication as ``band_join``.

    Both sides replicate to covering bins, so an overlapping pair can meet
    in SEVERAL bins; instead of a dedup shuffle, the pair is emitted ONLY
    from its first shared bin — ``max(floor(l_lo/w), floor(r_lo/w))`` —
    which both sides provably cover (it is where the later-starting
    interval begins, inside the overlap). One equi-join, exactly-once
    emission, no post-dedup."""
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    keys = list(extra_keys or [])
    dup = [c for c in left.columns if c in right.columns and c not in keys]
    if dup:
        raise ValueError(
            f"ambiguous columns {dup}: rename or project before the join"
        )
    w = float(bin_width)
    l = left.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(left_lo) / w), F.floor(F.col(left_hi) / w))),
    )
    r = right.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(right_lo) / w), F.floor(F.col(right_hi) / w))),
    )
    cond = [l["__bin"] == r["__bin"]] + [l[k] == r[k] for k in keys]
    first_bin = F.greatest(
        F.floor(F.col(left_lo) / w), F.floor(F.col(right_lo) / w)
    )
    out = (
        l.join(r, cond, "inner")
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (l["__bin"] == first_bin)
        )
        .drop(l["__bin"])
        .drop(r["__bin"])
    )
    for k in keys:
        out = out.drop(r[k])
    return out
