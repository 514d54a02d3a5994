#!/usr/bin/env python
"""r16 probe: fuzzy_prefix_documents candidate-volume decomposition and the
positional (Ed-Join location filter) headroom, at a given SF.

Counts, for the CURRENT set-based prefix pipeline:
  - kept postings Σf and Σf² (collision rows into the candidate join)
  - distinct candidate pairs after the |len| prefilter
  - verified pairs (the declared output)
and for the proposed OCCURRENCE-based positional pipeline:
  - kept occurrence postings Σf and Σf²
  - collision rows surviving |Δpos| ≤ d (the positional filter)
  - distinct candidate pairs, and their verified subset (must equal the
    declared output — recall check)

Usage: python tools/probe_fuzzy_prefix_r16.py [--sf DIR]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_connector_spark.ops.fuzzy import (
    _blocking_index,
    _normalized,
    _pair_candidates,
    _prefix_select,
)
from cdc_connector_spark.session import get_spark
from cdc_connector_spark.tables import load_table

sf_dir = "/root/testdata/sf0.1"
if "--sf" in sys.argv:
    sf_dir = sys.argv[sys.argv.index("--sf") + 1]

Q, D = 3, 4
PLEN = Q * D + 1  # 13

spark = get_spark("probe-fuzzy-prefix-r16")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, sf_dir, "documents")

t0 = time.time()
inv = _blocking_index(docs, "text", "doc_id", "qgram", Q, (), max_dist=D)
# the PRE-r16 set-based selection, reconstructed inline (the shipped
# _prefix_select is positional since r16): plen rarest DISTINCT grams
# under the (doc-freq ASC, gram ASC) order
_sfreq = inv.groupBy("__k").agg(F.count(F.lit(1)).alias("__f"))
_sw = Window.partitionBy("__id").orderBy(F.col("__f").asc(), F.col("__k").asc())
sel = (
    inv.select("__id", F.length("__s").alias("__len"), "__k")
    .join(_sfreq, "__k")
    .withColumn("__rn", F.row_number().over(_sw))
    .filter(F.col("__rn") <= PLEN)
    .select("__id", "__len", "__k")
    .localCheckpoint()
)
print(f"[set] prefix select materialized: {time.time()-t0:.2f}s, rows={sel.count()}")

pf = sel.groupBy("__k").agg(F.count(F.lit(1)).alias("f"))
row = pf.agg(
    F.sum("f").alias("sum_f"),
    F.sum(F.col("f") * F.col("f")).alias("sum_f2"),
    F.max("f").alias("max_f"),
    F.count(F.lit(1)).alias("n_keys"),
).collect()[0]
print(f"[set] postings: n_keys={row['n_keys']} sum_f={row['sum_f']} "
      f"sum_f2={row['sum_f2']} max_f={row['max_f']}")

t0 = time.time()
cand = _pair_candidates(sel, [], D)
n_cand = cand.count()
print(f"[set] distinct candidate pairs: {n_cand} ({time.time()-t0:.2f}s)")

strs = _normalized(docs, "text", "doc_id")
sa = strs.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"))
sb = strs.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"))
ver = (
    cand.join(sa, "id_a").join(sb, "id_b")
    .withColumn("dist", F.levenshtein("__sa", "__sb", D))
    .filter(F.col("dist") >= 0)
)
n_ver = ver.count()
print(f"[set] verified pairs: {n_ver}")

# ---- occurrence-based positional pipeline ----
base = _normalized(docs, "text", "doc_id")
chars = F.split(F.col("__s"), "")
out = chars
n = F.size(chars)
for j in range(2, Q + 1):
    m = F.greatest(n - F.lit(j - 1), F.lit(0))
    out = F.zip_with(F.slice(out, 1, m), F.slice(chars, j, m), lambda a, b: F.concat(a, b))
grams = F.when(F.length("__s") < Q, F.array(F.col("__s"))).otherwise(
    F.slice(out, 1, F.greatest(n - F.lit(Q - 1), F.lit(1)))
)
occ = base.select(
    "__id", F.length("__s").alias("__len"), F.posexplode(grams).alias("__p", "__k")
)
freq = occ.groupBy("__k").agg(F.count(F.lit(1)).alias("__f"))
w = Window.partitionBy("__id").orderBy(
    F.col("__f").asc(), F.col("__k").asc(), F.col("__p").asc()
)
osel = (
    occ.join(freq, "__k")
    .withColumn("__rn", F.row_number().over(w))
    .filter(F.col("__rn") <= PLEN)
    .select("__id", "__len", "__k", "__p")
    .localCheckpoint()
)
print(f"[occ] prefix occurrences: rows={osel.count()}")
opf = osel.groupBy("__k").agg(F.count(F.lit(1)).alias("f"))
row = opf.agg(
    F.sum("f").alias("sum_f"),
    F.sum(F.col("f") * F.col("f")).alias("sum_f2"),
    F.max("f").alias("max_f"),
    F.count(F.lit(1)).alias("n_keys"),
).collect()[0]
print(f"[occ] postings: n_keys={row['n_keys']} sum_f={row['sum_f']} "
      f"sum_f2={row['sum_f2']} max_f={row['max_f']}")

l = osel.select(F.col("__id").alias("id_a"), F.col("__len").alias("__la"),
                F.col("__p").alias("__pa"), "__k")
r = osel.select(F.col("__id").alias("id_b"), F.col("__len").alias("__lb"),
                F.col("__p").alias("__pb"), "__k")
joined = l.join(r, "__k").filter(F.col("id_a") < F.col("id_b"))
n_coll = joined.count()
surv = joined.filter(
    (F.abs(F.col("__la") - F.col("__lb")) <= D)
    & (F.abs(F.col("__pa") - F.col("__pb")) <= D)
)
n_surv = surv.count()
ocand = surv.select("id_a", "id_b").distinct()
n_ocand = ocand.count()
print(f"[occ] collision rows (id_a<id_b): {n_coll}; after len+pos filter: "
      f"{n_surv}; distinct pairs: {n_ocand}")
over = (
    ocand.join(sa, "id_a").join(sb, "id_b")
    .withColumn("dist", F.levenshtein("__sa", "__sb", D))
    .filter(F.col("dist") >= 0)
)
n_over = over.count()
print(f"[occ] verified pairs: {n_over}  (recall check: must equal {n_ver})")
missing = ver.select("id_a", "id_b").exceptAll(over.select("id_a", "id_b")).count()
print(f"[occ] verified pairs missing vs set-based: {missing} (must be 0)")

# ---- banded (shipped r16) pipeline: collision volume + end-to-end ----
D1 = D + 1
bsel = osel.withColumn(
    "__band", F.floor(F.col("__p") / F.lit(D1)).cast("int")
)
bidx = bsel.select(
    "__id", "__len", "__p", "__k",
    F.explode(F.array(F.col("__band"), F.col("__band") - 1)).alias("__bp"),
).filter(F.col("__bp") >= 0)
bl = bidx.select(F.col("__id").alias("id_a"), F.col("__len").alias("__la"),
                 F.col("__p").alias("__pa"), "__k", "__bp")
br = bidx.select(F.col("__id").alias("id_b"), F.col("__len").alias("__lb"),
                 F.col("__p").alias("__pb"), "__k", "__bp")
bjoined = bl.join(br, ["__k", "__bp"]).filter(F.col("id_a") < F.col("id_b"))
n_bcoll = bjoined.count()
bsurv = bjoined.filter(
    (F.abs(F.col("__la") - F.col("__lb")) <= D)
    & (F.abs(F.col("__pa") - F.col("__pb")) <= D)
)
n_bsurv = bsurv.count()
n_bcand = bsurv.select("id_a", "id_b").distinct().count()
print(f"[band] collision rows (id_a<id_b, banded join): {n_bcoll}; after "
      f"len+pos filter: {n_bsurv}; distinct pairs: {n_bcand}")

# ---- end-to-end: the SHIPPED entry through the noop sink ----
from cdc_connector_spark.ops.fuzzy import fuzzy_pairs

for run in range(3):
    t0 = time.time()
    out = fuzzy_pairs(docs, text_col="text", id_col="doc_id", max_dist=D,
                      block="qgram", selection="prefix")
    out.write.format("noop").mode("overwrite").save()
    print(f"[e2e] shipped fuzzy_pairs prefix run {run}: {time.time()-t0:.2f}s")
