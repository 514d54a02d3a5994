#!/usr/bin/env python
"""10x scale rehearsal, round 11 (SCALING.md 4o protocol + 4n addendum).

Two jobs:

1. (4o) The three most expensive COMPOUND pipelines — golden_record,
   fuzzy_match, canonical_docs — had argued-but-unmeasured quadratic
   risks (blocking fan-out, CC rounds). Axis: 10x CORPUS as 10 disjoint
   shifted copies (keys shifted; each copy's names/texts carry a
   copy-distinct token so duplicate DENSITY stays constant — the
   realistic growth shape: more customers/docs, same dup rate). The
   binding caps (hot-gram drop at freq 1000, minhash band-bucketing)
   are what should keep growth ~linear.

2. (4n addendum) The executable scale knobs added this round:
   column_profile_diff(distinct_mode="hll") vs the measured-4.9x exact
   mode, and ks_drift/equidepth with quantize_to neutralizing the
   distinct-value axis that made them 2.7x/4.6x at 10x.

Usage: python tools/scale_rehearsal_r11.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cdc_connector_spark.session import get_spark  # noqa: E402
from cdc_connector_spark.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPL = 10


def timed(label, fn):
    fn()
    t0 = time.time()
    n = fn()
    print(f"| {label} | {time.time() - t0:.2f}s | {n} rows |")


def main() -> None:
    from cdc_connector_spark.ops.components import neardup_groups
    from cdc_connector_spark.ops.dedup import minhash_verified_pairs
    from cdc_connector_spark.ops.fuzzy import fuzzy_pairs
    from cdc_connector_spark.ops.mdm import golden_records
    from cdc_connector_spark.ops.textstats import quality_score
    from cdc_connector_spark.ops.timeseries import equidepth_histogram, ks_drift
    from cdc_connector_spark.validation.checks import column_profile_diff

    spark = get_spark("scale-rehearsal-r11")
    copies = spark.range(REPL).select(F.col("id").alias("__copy"))

    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment"
    )
    cust10 = cust.crossJoin(copies).select(
        (F.col("c_custkey") + F.col("__copy") * 10_000_000).alias("c_custkey"),
        # copy-distinct suffix keeps near-dup families inside one copy:
        # duplicate density constant, corpus 10x
        F.concat(F.col("c_name"), F.lit("#"), F.col("__copy")).alias("c_name"),
        "c_acctbal",
        "c_nationkey",
        "c_mktsegment",
    ).localCheckpoint(eager=True)

    def fuzzy_run(c):
        return fuzzy_pairs(
            c, text_col="c_name", id_col="c_custkey", max_dist=1, block="qgram"
        ).count()

    print("| op | steady-state | output |")
    print("|---|---|---|")
    timed("fuzzy_match 1x", lambda: fuzzy_run(cust))
    timed("fuzzy_match 10x corpus", lambda: fuzzy_run(cust10))

    def golden_run(c):
        pairs = fuzzy_pairs(
            c, text_col="c_name", id_col="c_custkey", max_dist=1, block="qgram"
        )
        a = c.select(
            F.col("c_custkey").alias("id_a"),
            F.col("c_nationkey").alias("__na"),
            F.col("c_mktsegment").alias("__sa"),
        )
        b = c.select(
            F.col("c_custkey").alias("id_b"),
            F.col("c_nationkey").alias("__nb"),
            F.col("c_mktsegment").alias("__sb"),
        )
        gated = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .filter((F.col("__na") == F.col("__nb")) & (F.col("__sa") == F.col("__sb")))
            .select("id_a", "id_b")
        )
        return (
            golden_records(
                c.select("c_custkey", "c_name", "c_acctbal"),
                gated,
                "c_custkey",
                ["c_name", "c_acctbal"],
            )
            .filter(F.col("n_members") >= 2)
            .count()
        )

    timed("golden_record 1x", lambda: golden_run(cust))
    timed("golden_record 10x corpus", lambda: golden_run(cust10))

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs10 = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copytoken"), F.col("__copy")).alias("text"),
    ).localCheckpoint(eager=True)

    def canonical_run(d):
        from pyspark.sql import Window

        q = d.select("doc_id", F.round(quality_score("text"), 6).alias("quality"))
        pairs = minhash_verified_pairs(d, num_hashes=64, bands=32, jaccard_threshold=0.5)
        groups = neardup_groups(pairs)
        mem = groups.join(q, groups["id"] == q["doc_id"]).select(
            "doc_id", "rep_id", "group_size", "quality"
        )
        w = Window.partitionBy("rep_id").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        winners = (
            mem.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("doc_id", "group_size", "quality")
        )
        singles = q.join(
            groups.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
        ).select("doc_id", F.lit(1).cast("long").alias("group_size"), "quality")
        return winners.unionByName(singles).count()

    timed("canonical_docs 1x", lambda: canonical_run(docs))
    timed("canonical_docs 10x corpus", lambda: canonical_run(docs10))

    # ---- 4n addendum: the executable scale knobs --------------------
    orders = load_table(spark, SF_DIR, "orders")
    o10 = orders.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("__copy") * 100_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("__copy") * 10_000_000).alias("o_custkey"),
        "o_orderstatus",
        # shift values so DISTINCT VALUES grow 10x too — the axis that
        # made the exact modes super-linear
        (F.col("o_totalprice") + F.col("__copy").cast("double") * 1e7).alias("o_totalprice"),
        "o_orderdate",
    ).localCheckpoint(eager=True)
    cols = ["o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"]

    def prof(df, mode):
        return column_profile_diff(
            df, df.filter(F.col("o_orderkey") % 97 != 0), cols, distinct_mode=mode
        ).count()

    timed("profile_diff exact 1x", lambda: prof(orders, "exact"))
    timed("profile_diff exact 10x", lambda: prof(o10, "exact"))
    timed("profile_diff hll 1x", lambda: prof(orders, "hll"))
    timed("profile_diff hll 10x", lambda: prof(o10, "hll"))

    def ks_run(src, q):
        return ks_drift(
            src.filter(F.col("o_orderkey") % 2 == 0),
            src.filter(F.col("o_orderkey") % 2 == 1),
            "o_totalprice",
            quantize_to=q,
        ).count()

    timed("ks_drift exact 1x", lambda: ks_run(orders, None))
    timed("ks_drift exact 10x", lambda: ks_run(o10, None))
    timed("ks_drift quantize=100 1x", lambda: ks_run(orders, 100.0))
    timed("ks_drift quantize=100 10x", lambda: ks_run(o10, 100.0))

    def eq_run(src, q):
        return equidepth_histogram(src, "o_totalprice", 8, quantize_to=q).count()

    timed("equidepth exact 1x", lambda: eq_run(orders, None))
    timed("equidepth exact 10x", lambda: eq_run(o10, None))
    timed("equidepth quantize=100 1x", lambda: eq_run(orders, 100.0))
    timed("equidepth quantize=100 10x", lambda: eq_run(o10, 100.0))


if __name__ == "__main__":
    main()
