"""10x scale rehearsal for the round-8 fourth-session ops (SCALING.md 4k
protocol): sf0.1 inputs replicated 10x — documents with unique ids over
duplicated content (worst-case dup density), events/orders/embeddings
with shifted keys (disjoint copies, per-key density unchanged) — on
local[32], warm-up + steady-state timing per op.

Usage: python tools/scale_rehearsal_r8s4.py [sf_dir]
Prints one markdown table row per (op, scale).
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


def replicate_docs(docs):
    copies = docs.sparkSession.range(REPL).select(F.col("id").alias("__copy"))
    return docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("__copy") * 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )


def shift_keyed(df, keys, repl=REPL, offset=10_000_000):
    copies = df.sparkSession.range(repl).select(F.col("id").alias("__copy"))
    out = df.crossJoin(copies)
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("__copy") * offset)
    return out.drop("__copy")


def timed(name, build):
    build().count()  # warm-up (JIT, IO cache)
    # ops that localCheckpoint internally do their work EAGERLY at build
    # time — the timer must wrap build() too, not just the final count
    t0 = time.time()
    n = build().count()
    print(f"| {name} | {time.time() - t0:.2f}s | {n} rows |", flush=True)


def main():
    spark = get_spark(app_name="scale-rehearsal-r8s4")
    docs1 = load_table(spark, SF_DIR, "documents").localCheckpoint(eager=True)
    docs10 = replicate_docs(docs1).localCheckpoint(eager=True)
    ev1 = load_table(spark, SF_DIR, "events").localCheckpoint(eager=True)
    ev10 = shift_keyed(ev1, ["event_id", "user_id"]).localCheckpoint(eager=True)
    orders1 = load_table(spark, SF_DIR, "orders").localCheckpoint(eager=True)
    orders10 = shift_keyed(orders1, ["o_orderkey", "o_custkey"]).localCheckpoint(
        eager=True
    )
    emb1 = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    emb10 = shift_keyed(emb1, ["vec_id"]).localCheckpoint(eager=True)
    li1 = load_table(spark, SF_DIR, "lineitem").localCheckpoint(eager=True)
    li10 = shift_keyed(li1, ["l_orderkey", "l_suppkey"]).localCheckpoint(eager=True)

    from cdc_connector_spark.ops.ann import hard_negatives
    from cdc_connector_spark.ops.dedup import prefix_jaccard_pairs
    from cdc_connector_spark.ops.graph import bfs_hops
    from cdc_connector_spark.ops.rfm import rfm_segments
    from cdc_connector_spark.ops.sketch import bloom_decontaminate, cms_heavy_hitters
    from cdc_connector_spark.ops.textstats import token_entropy, zipf_slope
    from cdc_connector_spark.ops.timeseries import interevent_stats, weekday_profile
    from cdc_connector_spark.validation.checks import label_balance
    from cdc_connector_spark.validation.drift import population_stability

    for tag, docs, ev, orders, emb, li in [
        ("1x", docs1, ev1, orders1, emb1, li1),
        ("10x", docs10, ev10, orders10, emb10, li10),
    ]:
        print(f"-- scale {tag}", flush=True)
        eval_set = docs.filter(F.col("doc_id") % 50 == 0)
        train = docs.filter(F.col("doc_id") % 50 != 0)
        timed(f"bloom_decontaminate {tag}", lambda: bloom_decontaminate(
            train, eval_set, n=3, m_bits=2048, k=3))
        timed(f"cms_heavy_hitters {tag}", lambda: cms_heavy_hitters(
            ev, "user_id", depth=4, width=64, topn=40))
        timed(f"prefix_jaccard {tag}", lambda: prefix_jaccard_pairs(
            docs, shingle_n=3, threshold_num=7, threshold_den=10))
        timed(f"token_entropy {tag}", lambda: token_entropy(docs))
        timed(f"zipf_slope {tag}", lambda: zipf_slope(docs, top_k=300))
        timed(f"rfm_segments {tag}", lambda: rfm_segments(orders))
        timed(f"weekday_profile {tag}", lambda: weekday_profile(ev))
        timed(f"interevent_stats {tag}", lambda: interevent_stats(ev))
        timed(f"hard_negatives {tag}", lambda: hard_negatives(emb, [0, 1, 2], k=3))
        timed(f"label_balance {tag}", lambda: label_balance(emb, "label"))
        timed(f"psi {tag}", lambda: population_stability(
            orders.filter(F.col("o_orderkey") % 2 == 0),
            orders.filter(F.col("o_orderkey") % 2 == 1),
            "o_totalprice", lo=0.0, hi=600000.0, bins=10))

        def bfs_build(li=li, orders=orders):
            edges = (
                li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
                .select(F.col("o_custkey").alias("src"),
                        (F.col("l_suppkey") + F.lit(90_000_000)).alias("dst"))
                .distinct().localCheckpoint(eager=True)
            )
            srcs = orders.select(F.col("o_custkey").alias("node")).distinct().limit(500)
            return bfs_hops(edges, srcs, max_hops=3)
        timed(f"bfs_hops {tag}", bfs_build)


if __name__ == "__main__":
    main()
