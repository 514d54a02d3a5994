"""Property tests for the export/selection operators: randomized (seeded)
inputs checked against straight-line Python re-implementations of the same
deterministic rules — the engine-independence property the DuckDB oracle
checks on the fixtures, exercised across random sizes and layouts."""

from __future__ import annotations

import math
import random

from cdc_connector_spark.ops.corpus import (
    chunk_documents,
    shard_plan,
    stratified_sample,
)

KNUTH = 2654435761
MOD31 = 2147483648
MOD32 = 4294967296


def _h(key: int, mult: int = KNUTH, salt: int = 0) -> int:
    return ((key + salt) % MOD31) * mult % MOD32


def test_chunking_reconstructs_documents_on_random_inputs(spark):
    rng = random.Random(31)
    for trial in range(3):
        chunk, overlap = rng.choice([(6, 2), (8, 0), (5, 4)])
        step = chunk - overlap
        rows = []
        for i in range(40):
            n = rng.randrange(0, 25)
            rows.append((i, " ".join(f"t{i}_{j}" for j in range(n))))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
        got = {}
        for r in out.collect():
            got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split()
        for i, text in rows:
            toks = text.split()
            if not toks:
                assert i not in got
                continue
            chunks = got[i]
            # chunk ids are dense 0..k-1 and follow the documented rule
            want_k = 1 if len(toks) <= chunk else 1 + math.ceil((len(toks) - chunk) / step)
            assert sorted(chunks) == list(range(want_k)), (trial, i)
            # each chunk is exactly the documented token window
            for cid, ctoks in chunks.items():
                start = cid * step
                assert ctoks == toks[start : start + chunk], (trial, i, cid)
            # stitching chunks (dropping the overlap) reconstructs the doc
            stitched = list(chunks[0])
            for cid in range(1, want_k):
                stitched.extend(chunks[cid][overlap:])
            assert stitched == toks, (trial, i)


def test_shard_plan_matches_python_reference_on_random_inputs(spark):
    rng = random.Random(47)
    for trial in range(3):
        n_shards = rng.choice([3, 7, 16])
        keys = rng.sample(range(0, 10_000_000), 300) + [MOD31 - 1, MOD31, 2**40]
        df = spark.createDataFrame([(int(k),) for k in keys], "doc_id bigint")
        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shard_plan(df, n_shards=n_shards).collect()
        }
        # straight-line reference of the documented rule
        by_shard: dict[int, list] = {}
        for k in keys:
            by_shard.setdefault(_h(k) % n_shards, []).append(k)
        for s, members in by_shard.items():
            members.sort(key=lambda k: (_h(k, 2246822519), k))
            for pos, k in enumerate(members):
                assert got[k] == (s, pos), (trial, k)


def test_stratified_sample_matches_python_reference_on_random_inputs(spark):
    rng = random.Random(53)
    for trial in range(3):
        frac = rng.choice([0.1, 0.33, 0.8])
        rows = [
            (i, f"g{rng.randrange(4)}")
            for i in rng.sample(range(0, 1_000_000), 200)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, grp string")
        got = sorted(
            r["doc_id"]
            for r in stratified_sample(df, frac=frac, strata_col="grp").collect()
        )
        by_grp: dict[str, list] = {}
        for k, g in rows:
            by_grp.setdefault(g, []).append(k)
        frac6 = int(round(frac * 1_000_000))
        want = []
        for g, members in by_grp.items():
            members.sort(key=lambda k: (_h(k), k))
            # the op's EXACT integer quota (float ceil can overshoot:
            # 55*0.8 -> 44.000000000000007 -> ceil 45)
            quota = (len(members) * frac6 + 999_999) // 1_000_000
            want.extend(members[:quota])
        assert got == sorted(want), trial
