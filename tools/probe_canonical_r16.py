#!/usr/bin/env python
"""r16 probe: canonical_docs_documents / neardup_groups_documents stage
decomposition (verdict r15 #5/#8).

Times, via the noop sink, each stage of the shared minhash->CC->survivor
pipeline at a given SF:
  sig      minhash_signatures_arrow (Arrow kernel over all docs)
  band     signatures -> banded (band, bucket) rows
  cand     bucket-collect pair candidates (pre-verify, deduped)
  verify   exact-Jaccard verified pairs (the shared pair set)
  cc       connected components over the verified pairs (+ round count)
  canon    full canonical_docs_documents entry
  groups   full neardup_groups_documents entry

Usage: python tools/probe_canonical_r16.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from cdc_connector_spark.ops.components import connected_components
from cdc_connector_spark.ops.dedup import (
    _band_bucket_exprs,
    _bucket_pairs,
    hashed_shingles,
    minhash_signatures_arrow,
    minhash_verified_pairs,
)
from cdc_connector_spark.session import get_spark
from cdc_connector_spark.tables import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("probe-canonical-r16")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, sf_dir, "documents")


def t(label, df, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"[{label}] {best:.2f}s", flush=True)
    return best


sig = minhash_signatures_arrow(docs, "text", "doc_id", 64, 3)
t("sig", sig)

banded = sig.select(
    F.col("id").alias("__id"),
    F.explode(F.array(*_band_bucket_exprs(32, 2))).alias("bb"),
).select("__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
t("band", banded)

cand = _bucket_pairs(banded, ["band", "bucket"], "__id").dropDuplicates(["id_a", "id_b"])
t("cand", cand)
print(f"  n_cand={cand.count()}", flush=True)

pairs = minhash_verified_pairs(docs, num_hashes=64, bands=32, jaccard_threshold=0.5)
t("verify", pairs)
print(f"  n_pairs={pairs.count()}", flush=True)

# CC round count: patch the count() loop by running it and watching stderr is
# awkward; instead time it and report rounds via a manual replay
t0 = time.time()
comp = connected_components(pairs)
comp.write.format("noop").mode("overwrite").save()
print(f"[cc e2e incl. pair recompute] {time.time()-t0:.2f}s", flush=True)

# manual hash-min replay on a materialized pair list to count rounds
mat = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
import collections
adj = collections.defaultdict(set)
for a, b in mat:
    adj[a].add(b)
    adj[b].add(a)
label = {v: v for v in adj}
rounds = 0
while True:
    changed = 0
    new = dict(label)
    for v in adj:
        m = min([label[v]] + [label[u] for u in adj[v]])
        if m < new[v]:
            new[v] = m
            changed += 1
    rounds += 1
    label = new
    if changed == 0:
        break
print(f"  hash-min rounds to fixpoint (sync replay): {rounds}; "
      f"nodes={len(adj)} edges={len(mat)}", flush=True)

qs = entry_mod.queries()
for name in ("neardup_groups_documents", "canonical_docs_documents",
             "leakage_safe_split_documents"):
    t(name, qs[name](spark, sf_dir))
