#!/usr/bin/env python
"""10x scale rehearsal, round 12 (SCALING.md 4p): recall-preserving
fuzzy blocking vs the frequency cap.

The r11 rehearsal (4o) measured the cap as the only control on the one
super-linear pipeline — and measured it trading recall to ZERO when it
binds (cap=100 at 10x -> 0 pairs). This round adds two lossless modes;
this script measures both against cap mode on the same corpus axis
(10 key-shifted copies, copy-distinct name suffix: duplicate density
constant, corpus 10x):

- selection="prefix" (Ed-Join): lossless everywhere, but on UNIFORM
  keys its rare-gram posting lists grow with the corpus and the
  candidate join becomes straggler-bound (hot postings explode inside
  the join where AQE's input-size stats can't see them) — measured
  honestly below + the 10x follow-up in SCALING 4p.
- block="delete" (SymSpell deletion neighborhoods): lossless AND
  posting lists bounded by the one-edit family (corpus-independent on
  key-like names) — the mode that must show <= ~5x wall at 10x (the
  r11 verdict's done-criterion).

Recall parity is ASSERTED in-run: pair count of each lossless mode >=
cap mode's at the same scale (supersets pytest-pinned elsewhere; counts
here keep the rehearsal cheap).

Usage: python tools/scale_rehearsal_r12.py [sf_dir] [--skip-prefix-10x]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cdc_connector_spark.session import get_spark  # noqa: E402
from cdc_connector_spark.tables import load_table  # noqa: E402

SF_DIR = next((a for a in sys.argv[1:] if not a.startswith("--")), "/root/testdata/sf0.1")
SKIP_PREFIX_10X = "--skip-prefix-10x" in sys.argv
REPL = 10


def timed(label, fn):
    fn()  # warm-up
    t0 = time.time()
    n = fn()
    print(f"| {label} | {time.time() - t0:.2f}s | {n} rows |", flush=True)
    return n


def main() -> None:
    from cdc_connector_spark.ops.fuzzy import fuzzy_pairs

    spark = get_spark("scale-rehearsal-r12")

    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")

    def replicate(n, letters):
        """n key-shifted copies. letters=True appends a 2-LETTER copy
        token (any cross-copy pair differs in >= 2 chars -> true pairs
        grow exactly n-fold: constant duplicate density, the r11 4o
        protocol). letters=False appends the 1-DIGIT token the r11 run
        used — cross-copy names then sit at distance 1 of their twins,
        a ~1.3x-DENSER-than-linear worst case kept as the adversarial
        variant."""
        copies = spark.range(n).select(F.col("id").alias("__copy"))
        tok = (
            F.substring(F.lit("abcdefghij"), F.col("__copy").cast("int") + 1, 1)
            if letters
            else F.col("__copy").cast("string")
        )
        tok = F.concat(tok, tok) if letters else tok
        return (
            cust.crossJoin(copies)
            .select(
                (F.col("c_custkey") + F.col("__copy") * 10_000_000).alias("c_custkey"),
                F.concat(F.col("c_name"), F.lit("#"), tok).alias("c_name"),
            )
            .localCheckpoint(eager=True)
        )

    def run(c, **kw):
        return fuzzy_pairs(
            c, text_col="c_name", id_col="c_custkey", max_dist=1, block="qgram", **kw
        ).count()

    def run_delete(c):
        return fuzzy_pairs(
            c, text_col="c_name", id_col="c_custkey", max_dist=1, block="delete"
        ).count()

    print("| mode | steady-state | output |")
    print("|---|---|---|")
    cap1 = timed("cap (freq<=1000) 1x", lambda: run(cust))
    del1 = timed("delete-neighborhood 1x", lambda: run_delete(cust))
    pre1 = timed("prefix (Ed-Join) 1x", lambda: run(cust, selection="prefix"))
    assert del1 >= cap1 and pre1 >= cap1 and del1 == pre1, (cap1, del1, pre1)

    # constant-density axis (the 4o protocol): true pairs grow exactly 10x
    c10 = replicate(10, letters=True)
    cap10 = timed("cap (freq<=1000) 10x const-density", lambda: run(c10))
    del10 = timed("delete-neighborhood 10x const-density", lambda: run_delete(c10))
    assert del10 >= cap10 and del10 == 10 * del1, (cap10, del10, del1)
    # prefix's growth curve, measured at 3x here; the 10x point
    # (274.7s, straggler-bound — SCALING 4p) runs as a dedicated
    # idle-box follow-up because it monopolizes one core for minutes
    c3 = replicate(3, letters=True)
    pre3 = timed("prefix (Ed-Join) 3x const-density", lambda: run(c3, selection="prefix"))
    del3 = timed("delete-neighborhood 3x const-density", lambda: run_delete(c3))
    assert pre3 == del3 == 3 * del1, (pre3, del3, del1)
    if not SKIP_PREFIX_10X:
        pre10 = timed("prefix (Ed-Join) 10x const-density", lambda: run(c10, selection="prefix"))
        assert pre10 == del10, (pre10, del10)

    # adversarial DENSER axis (1-digit copy token: every name gains 9
    # cross-copy twins at distance 1 — output grows ~12.6x, super-linear)
    d10 = replicate(10, letters=False)
    timed("cap (freq<=1000) 10x denser", lambda: run(d10))
    timed("delete-neighborhood 10x denser", lambda: run_delete(d10))
    spark.stop()


if __name__ == "__main__":
    main()
