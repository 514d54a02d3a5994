"""Similarity search over embedding columns (array<float>).

- cosine_similarity : pure-expression dot/norm (zip_with + aggregate), stays
  JVM-side; no UDF.
- brute_force_topk  : exact top-k vs one query vector — a single scan +
  TakeOrderedAndProject; the correctness baseline.
- lsh_bucket_topk   : sign-random-projection LSH buckets (deterministic
  hyperplanes derived from xxhash64 — no RNG state to ship), probe only the
  query's bucket(s), exact re-rank inside. The 100-TB path: bucketing makes
  the scan partition-prunable when the table is written bucketed/partitioned
  by ``bucket``.
- embedding_neardup_pairs : all-pairs near-duplicates within LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = dot / (|a| |b|); NULL/zero-norm-safe (returns NULL)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    One scan; Spark plans orderBy+limit as TakeOrderedAndProject (no full
    sort). Ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def brute_force_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors in ONE corpus pass —
    the production retrieval shape (a training-data pipeline scores many
    probes per trigger; one scan per query would read the corpus Q times).

    The query frame is broadcast (a probe batch is small by definition — if
    it were corpus-sized this would be a similarity JOIN, see
    embedding_neardup_pairs); the corpus streams through a single
    BroadcastNestedLoopJoin scoring every (vector, query) pair, and
    per-query top-k is one window over (query, score). Cost: one corpus
    scan + one shuffle on query_id — independent of |queries| up to memory.
    Returns (query_id, vec_id, cos_sim), k rows per query, id tie-break.

    Query ids must identify a probe: duplicates are collapsed (first vector
    per id wins) rather than silently interleaving two queries' results
    under one id.
    """
    q = queries.dropDuplicates([query_id_col]).select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).cast("array<double>").alias("__qv"),
    )
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        cosine_similarity(F.col(vec_col).cast("array<double>"), F.col("__qv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _srp_bucket(vec: Column, planes: int = 16, table: int = 0) -> Column:
    """Sign-random-projection bucket id (int) from deterministic hyperplanes.

    Plane p, dim d has weight ±1 chosen by parity of xxhash64(p*8192+d):
    reproducible on any cluster with no broadcast state. bit_p = 1 iff
    Σ_d vec[d]·w[p,d] > 0. ``table`` offsets the plane index so L
    independent hash tables share one formula.
    """
    def plane_dot(p: int):
        # closure (not default-arg) capture: pyspark checks lambda arity
        return F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda d: F.pmod(F.xxhash64(F.lit(p) * 8192 + d), F.lit(2)) * 2 - 1,
                ),
                lambda v, w: v.cast("double") * w,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    bucket = F.lit(0)
    for p in range(planes):
        bucket = bucket.bitwiseOR(
            F.when(plane_dot(table * planes + p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    return bucket


def add_lsh_bucket(embeddings: DataFrame, vec_col: str = "embedding", planes: int = 16) -> DataFrame:
    return embeddings.withColumn("bucket", _srp_bucket(F.col(vec_col).cast("array<double>"), planes))


# ---- Arrow fast path: dense linear algebra belongs in numpy ---------------
#
# SRP bucketing is a (rows × dim) · (dim × planes·L) matrix multiply — the
# canonical case where an Arrow-batched pandas_udf beats interpreted
# higher-order expressions by an order of magnitude. Hyperplane weights are
# ±1 from a fixed-seed RNG: deterministic across runs/executors with no
# broadcast state. The expression path (_srp_bucket) remains for pure-SQL
# contexts; the two use different (both deterministic) hyperplane families —
# LSH needs only internal consistency between row and query bucketing.

_SRP_SEED = 0x5EED


def _srp_weight_matrix(dim: int, planes: int, num_tables: int):
    rng = np.random.default_rng(_SRP_SEED)
    return rng.choice((-1.0, 1.0), size=(dim, planes * num_tables))


def _bucket_ids_np(M, planes: int, num_tables: int):
    """(rows × planes·L) sign matrix → (rows × L) int bucket ids."""
    bits = (M > 0).astype(np.int64)
    out = np.zeros((M.shape[0], num_tables), dtype=np.int64)
    for t in range(num_tables):
        for p in range(planes):
            out[:, t] |= bits[:, t * planes + p] << p
    return out


def add_lsh_buckets_arrow(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    planes: int = 16,
    num_tables: int = 1,
    out_col: str = "buckets",
) -> DataFrame:
    """Append ``out_col``: array<long> of per-table SRP bucket ids, computed
    as one numpy matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def buckets(vs: pd.Series) -> pd.Series:
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in vs]) if len(vs) else np.zeros((0, 1))
        W = _srp_weight_matrix(M.shape[1], planes, num_tables)
        ids = _bucket_ids_np(M @ W, planes, num_tables)
        return pd.Series(list(ids))

    return embeddings.withColumn(out_col, buckets(F.col(vec_col)))


def query_buckets_arrow(query_vec: list[float], planes: int, num_tables: int) -> list[int]:
    """Bucket ids of the query vector under the same weight family."""
    q = np.asarray(query_vec, dtype=np.float64)[None, :]
    W = _srp_weight_matrix(q.shape[1], planes, num_tables)
    return [int(b) for b in _bucket_ids_np(q @ W, planes, num_tables)[0]]


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    num_tables: int = 8,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: standard multi-table LSH — L independent hash
    tables of ``planes`` hyperplanes each; a vector is a candidate if ANY
    table buckets it with the query (plus buckets within
    ``multiprobe_hamming`` bit-flips). Exact cosine re-rank on candidates.

    Scale path: with the table written partitioned by (table 0's) bucket the
    probe prunes to ~L·(1+planes)/2^planes of the data; candidate scoring is
    a single scan with an OR-of-IN filter, no join, no shuffle. Bucketing
    runs on the Arrow fast path (one matmul per batch).
    """
    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    qb = query_buckets_arrow(query_vec, planes, num_tables)

    def probes(b: int) -> list[int]:
        out = [b]
        if multiprobe_hamming >= 1:
            out += [b ^ (1 << p) for p in range(planes)]
        if multiprobe_hamming >= 2:
            out += [b ^ (1 << p) ^ (1 << r) for p in range(planes) for r in range(p + 1, planes)]
        return out

    vec = F.col(vec_col).cast("array<double>")
    bucketed = add_lsh_buckets_arrow(embeddings, vec_col, planes, num_tables)
    cond = None
    for t in range(num_tables):
        c = F.element_at("buckets", t + 1).isin(probes(qb[t]))
        cond = c if cond is None else (cond | c)
    return (
        bucketed.filter(cond)
        .select(
            F.col(id_col),
            cosine_similarity(vec, qarr).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---- IVF (inverted-file) ANN: the partition-pruned scale path -------------
#
# Coarse quantization: spherical k-means centroids trained on a BOUNDED
# seeded sample (driver-side numpy — O(sample × dim), independent of table
# size), then every vector is assigned to its nearest centroid with the
# Arrow matmul path. A query probes only the n_probe nearest centroid
# partitions and re-ranks exactly. With the table written partitioned by
# ``centroid_id``, the probe is partition pruning: it reads n_probe/k of
# the data — the standard IVF trade (recall vs fraction scanned).


def ivf_train_centroids(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 12,
    seed: int = 7,
):
    """Spherical k-means on a seeded bounded sample → (n_centroids × dim)
    numpy array (unit-norm rows). Deterministic for a fixed input layout and
    seed. The sample is a seeded random draw across ALL partitions — a plain
    ``limit()`` would take the first files in layout order, which on data
    clustered by anything vector-correlated trains every centroid on one
    region and collapses recall."""
    # the shared bounded/lexsorted sampling contract — ONE definition
    # (r11 review: an inline copy here could drift from the helper the
    # PQ/SQ trainers use and silently break layout-independence)
    M = _bounded_sample_matrix(embeddings, vec_col, sample_size, seed)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = M[rng.choice(len(M), size=min(n_centroids, len(M)), replace=False)]
    for _ in range(iters):
        assign = (M @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = M[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / np.maximum(np.linalg.norm(c), 1e-12)
    return C


def ivf_assign(embeddings: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """Append ``centroid_id``: nearest (cosine) centroid, one Arrow matmul
    per batch. Write the result partitioned by centroid_id for pruning."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def nearest(vs: pd.Series) -> pd.Series:
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in vs]) if len(vs) else np.zeros((0, C.shape[1]))
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series((M @ C.T).argmax(axis=1).astype(np.int32))

    return embeddings.withColumn("centroid_id", nearest(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    centroids,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: score only vectors in the n_probe centroid cells nearest
    the query, exact cosine re-rank inside."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q), 1e-12)
    probe = [int(i) for i in (C @ qn).argsort()[::-1][:n_probe]]

    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    assigned = ivf_assign(embeddings, C, vec_col)
    return (
        assigned.filter(F.col("centroid_id").isin(probe))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), qarr).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_write(
    embeddings: DataFrame,
    path: str,
    centroids,
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist the IVF layout: rows partitioned by ``centroid_id`` (one
    directory per cell) with the centroid matrix stored alongside. Probes
    then read only n_probe/k of the files — real partition pruning, the
    production shape of the IVF trade."""
    import json
    import os

    ivf_assign(embeddings, centroids, vec_col).write.mode(mode).partitionBy("centroid_id").parquet(path)
    with open(os.path.join(path, "_CENTROIDS"), "w") as f:
        json.dump(np.asarray(centroids, dtype=np.float64).tolist(), f)
    _ivf_save_cell_counts(embeddings.sparkSession, path)


def _ivf_save_cell_counts(spark, path: str) -> dict[int, int]:
    """Refresh the per-cell row counts stored in ``_CELLS`` (metadata-only
    count over the partitioned layout — parquet footers, no data read)."""
    import json
    import os

    counts = {
        int(r["centroid_id"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tmp = os.path.join(path, "_CELLS.tmp")
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in counts.items()}, f)
    os.replace(tmp, os.path.join(path, "_CELLS"))
    return counts


def ivf_cell_imbalance(counts: dict[int, int]) -> float:
    """Cell-size imbalance factor: max/mean. 1.0 = perfectly balanced; a
    probe of the largest cell costs ``imbalance ×`` the average probe."""
    if not counts:
        return 1.0
    vals = list(counts.values())
    return max(vals) / (sum(vals) / len(vals))


def ivf_append(
    spark,
    path: str,
    new_embeddings: DataFrame,
    vec_col: str = "embedding",
    imbalance_threshold: float = 3.0,
) -> dict:
    """Incremental IVF maintenance: assign a NEW batch of vectors against the
    layout's EXISTING centroids and append files into only the affected cell
    directories — no retrain, no rewrite of any existing file. Probes see the
    new vectors immediately (partition append is visible to the next read).

    Returns stats including ``imbalance`` (max cell / mean cell, from the
    refreshed ``_CELLS`` metadata) and ``recluster_recommended`` — True once
    drift pushes imbalance past ``imbalance_threshold``, at which point the
    biggest probe costs ``imbalance×`` the average and ``ivf_recluster``
    should run. The threshold is the standard freshness/cost dial: appends
    are O(batch), recluster is O(table) — run it off the hot path.

    At 100 TB: the append is one Spark job over the batch (Arrow matmul
    assignment + partitioned write); drift detection reads parquet FOOTERS
    only. Nothing scales with table size except the deliberate recluster.
    """
    import json
    import os

    with open(os.path.join(path, "_CENTROIDS")) as f:
        C = np.asarray(json.load(f), dtype=np.float64)
    assigned = ivf_assign(new_embeddings, C, vec_col)
    assigned.write.mode("append").partitionBy("centroid_id").parquet(path)
    counts = _ivf_save_cell_counts(spark, path)
    imb = ivf_cell_imbalance(counts)
    return {
        "cells": len(counts),
        "total_rows": sum(counts.values()),
        "imbalance": imb,
        "recluster_recommended": imb > imbalance_threshold,
    }


def ivf_recluster(
    spark,
    path: str,
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    sample_size: int = 4096,
    seed: int = 7,
    centroids=None,
) -> dict:
    """Full re-cluster of a drifted IVF layout: retrain centroids on the
    CURRENT table (bounded sample), rewrite the layout into a temp dir,
    then swap it in. The expensive O(table) rewrite runs off to the
    side; readers keep probing the old layout until the swap.

    Swap semantics (stated, not over-promised — r11 review): POSIX
    cannot rename a directory over a non-empty directory, so the swap
    is two renames (path→.old, .tmp→path) with a window where ``path``
    is briefly absent; a reader landing inside it should retry. A crash
    inside the window is RECOVERABLE, not destructive: the rewrite is
    complete on disk at ``.recluster.old``/``.tmp``, and this function
    restores the old layout before re-raising so ``path`` is never left
    dangling. Single-writer discipline (one recluster at a time) is the
    caller's job, same as ivf_write."""
    import json
    import os
    import shutil

    with open(os.path.join(path, "_CENTROIDS")) as f:
        k = n_centroids or len(json.load(f))
    current = spark.read.parquet(path).drop("centroid_id")
    if centroids is not None:
        # caller already trained (ivf_refresh drew and scored the
        # candidate set) — don't repeat the sample + Lloyd pass
        C = np.asarray(centroids, dtype=np.float64)
    else:
        C = ivf_train_centroids(current, vec_col, n_centroids=k, sample_size=sample_size, seed=seed)
    tmp = path.rstrip("/") + ".recluster.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ivf_write(current, tmp, C, vec_col=vec_col, mode="overwrite")
    old = path.rstrip("/") + ".recluster.old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path, old)
    try:
        os.replace(tmp, path)
    except BaseException:
        # restore the previous layout so path never dangles
        os.replace(old, path)
        raise
    shutil.rmtree(old, ignore_errors=True)
    with open(os.path.join(path, "_CELLS")) as f:
        counts = {int(a): b for a, b in json.load(f).items()}
    return {"cells": len(counts), "imbalance": ivf_cell_imbalance(counts)}


def ivf_refresh(
    spark,
    path: str,
    vec_col: str = "embedding",
    deadband: float = 0.02,
    imbalance_threshold: float = 3.0,
    sample_size: int = 4096,
    seed: int = 7,
) -> dict:
    """Drift-triggered IVF maintenance with a DEADBAND: re-cluster the
    layout only when the stored centroids measurably no longer fit the
    current table — the closed loop on top of ``ivf_append``'s
    recommendation flag (a drifting corpus silently degrades pruned-
    probe recall; an unconditional scheduled recluster wastes an
    O(table) rewrite when nothing moved).

    Decision inputs, both cheap relative to the rewrite they gate:
    - **fit churn**: quantization fit = mean over the bounded seeded
      sample (``_bounded_sample_matrix`` — the same contract the
      trainers use) of max-cosine(vector, centroid). A CANDIDATE
      centroid set is retrained on the current table
      (``ivf_train_centroids``, one bounded sample + in-memory Lloyd
      pass) and ``churn = fit_candidate − fit_current``. Undrifted
      layout ⇒ retraining reproduces ≈ the same fit ⇒ churn ≈ 0 stays
      inside the deadband and NO rewrite happens; after drift the old
      centroids underfit the new mass and churn crosses it. Scoring
      uses the sample matrix, never the table.
    - **imbalance** (max cell / mean cell, parquet-footer counts via
      ``_CELLS``): the same dial ``ivf_append`` exposes — a funnel of
      new vectors into few cells triggers even if overall fit moved
      less than the deadband.

    Triggered ⇒ ``ivf_recluster`` runs with the ALREADY-trained
    candidate centroids (no second training pass) and the usual swap
    semantics. Returns fit_current/fit_candidate/churn/imbalance,
    ``reclustered``, and post-recluster cells/imbalance when it ran.

    At 100 TB: the decision costs one bounded sample collect + one
    footer-metadata count; the O(table) rewrite runs only when the
    measured churn or imbalance says the recall budget is actually at
    risk."""
    import json
    import os

    with open(os.path.join(path, "_CENTROIDS")) as f:
        C_old = np.asarray(json.load(f), dtype=np.float64)
    with open(os.path.join(path, "_CELLS")) as f:
        counts = {int(a): b for a, b in json.load(f).items()}
    imb = ivf_cell_imbalance(counts)
    current = spark.read.parquet(path).drop("centroid_id")
    C_new = ivf_train_centroids(
        current, vec_col, n_centroids=len(C_old), sample_size=sample_size, seed=seed
    )
    M = _bounded_sample_matrix(current, vec_col, sample_size, seed)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    fit_current = float((M @ C_old.T).max(axis=1).mean())
    fit_candidate = float((M @ C_new.T).max(axis=1).mean())
    churn = fit_candidate - fit_current
    out = {
        "fit_current": fit_current,
        "fit_candidate": fit_candidate,
        "churn": churn,
        "imbalance": imb,
        "reclustered": churn > deadband or imb > imbalance_threshold,
    }
    if out["reclustered"]:
        r = ivf_recluster(
            spark, path, vec_col=vec_col, n_centroids=len(C_old),
            sample_size=sample_size, seed=seed, centroids=C_new,
        )
        out["cells"] = r["cells"]
        out["imbalance_after"] = r["imbalance"]
    return out


def ivf_read_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF layout: rank stored centroids against the
    query, read ONLY the n_probe nearest cell directories (partition
    pruning on ``centroid_id``), exact cosine re-rank inside."""
    import json
    import os

    with open(os.path.join(path, "_CENTROIDS")) as f:
        C = np.asarray(json.load(f), dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q), 1e-12)
    probe = [int(i) for i in (C @ qn).argsort()[::-1][:n_probe]]

    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    cells = spark.read.parquet(path).filter(F.col("centroid_id").isin(probe))
    return (
        cells.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), qarr).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_read_topk_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_queries: int = 8192,
) -> DataFrame:
    """Probe a persisted IVF layout with a BATCH of query vectors in one
    pruned scan — the serving shape of index retrieval (per-query
    ``ivf_read_topk`` would re-open the layout per probe).

    The probe batch is collected to the driver to rank centroids (bounded
    by ``max_queries`` — probes are small by definition; a corpus-sized
    probe set is a similarity JOIN, not an index lookup). The layout is
    read ONCE, pruned to the UNION of all queries' probe cells (partition
    pruning on ``centroid_id``), and each cell's vectors are scored only
    against the queries probing that cell via a broadcast (query, cell)
    join. One pruned scan + one window shuffle regardless of probe count.
    Pruned-probe recall < 1 by design — pin it with the recall twin (see
    ``ivf_recall_topk``'s pattern).

    Query ids must be unique (a duplicated id would silently interleave two
    queries' top-k under one label — rejected here, free since the probe
    batch is already collected) and keep their input type: the probe frame
    schema is inferred from the query frame, not hardcoded."""
    import json
    import os

    from pyspark.sql import types as T

    rows = queries.select(query_id_col, query_vec_col).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"{len(rows)} probe vectors exceed max_queries={max_queries}; "
            "a probe set this large should be a similarity join, not an index lookup"
        )
    ids = [r[query_id_col] for r in rows]
    if len(set(ids)) != len(ids):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate query ids {dupes[:5]}: each probe needs a unique id")
    with open(os.path.join(path, "_CENTROIDS")) as f:
        C = np.asarray(json.load(f), dtype=np.float64)
    probe_rows = []
    for r in rows:
        q = np.asarray(r[query_vec_col], dtype=np.float64)
        qn = q / np.maximum(np.linalg.norm(q), 1e-12)
        for c in (C @ qn).argsort()[::-1][:n_probe]:
            probe_rows.append((r[query_id_col], int(c), [float(v) for v in r[query_vec_col]]))
    probes = spark.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField(query_id_col, queries.schema[query_id_col].dataType),
                T.StructField("centroid_id", T.IntegerType()),
                T.StructField("__qv", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    cells = sorted({c for _, c, _ in probe_rows})
    data = spark.read.parquet(path).filter(F.col("centroid_id").isin(cells))
    scored = data.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_similarity(F.col(vec_col).cast("array<double>"), F.col("__qv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    num_tables: int = 8,
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vector pairs: self-join within LSH buckets across
    ``num_tables`` independent hash tables (OR-amplification), verify exact
    cosine ≥ threshold. Returns (id_a, id_b, cos_sim), id_a < id_b.

    Recall math: a cos≥0.95 pair agrees on one hyperplane with
    p = 1 − θ/π ≈ 0.90, so a single 8-plane table catches it with
    p⁸ ≈ 0.43 — a coin flip. OR across L=8 tables lifts that to
    1 − (1 − p⁸)⁸ ≈ 0.99. All L bucketings come out of ONE Arrow matmul
    (the weight matrix is (dim × planes·L)).

    Execution shape: pair generation AND exact-cosine verify are FUSED into
    one ``applyInPandas`` kernel per (table, bucket) — each vector ships
    into Python once per bucket membership (O(n·L) rows), the bucket's
    pairwise cosine matrix is one numpy matmul, and only threshold
    SURVIVORS leave the kernel. The earlier join-then-verify formulation
    shipped both vectors per candidate PAIR (O(candidates·dim) Arrow
    traffic — measured 100× more bytes at sf0.1). Only the tiny survivor
    set is shuffled for cross-table dedup. Buckets larger than
    ``max_bucket`` are excluded (recall/cost dial, same semantics as the
    dedup family caps)."""
    max_bucket = 4000
    id_field = embeddings.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_field.dataType),
            T.StructField("id_b", id_field.dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    b = (
        add_lsh_buckets_arrow(embeddings, vec_col, planes, num_tables)
        .select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.posexplode("buckets").alias("table", "bucket"),
        )
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        if n < 2 or n > max_bucket:
            return empty
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = np.nan
        Mn = M / norms[:, None]
        sims = Mn @ Mn.T
        ia, ib = np.triu_indices(n, k=1)
        keep = sims[ia, ib] >= threshold
        if not keep.any():
            return empty
        ids = pdf["__id"].to_numpy()
        a, b_ = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b_), np.maximum(a, b_)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": sims[ia, ib][keep]})

    return (
        b.groupBy("table", "bucket")
        .applyInPandas(bucket_pairs, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def _bounded_sample_matrix(
    embeddings: DataFrame, vec_col: str, sample_size: int, seed: int
):
    """Seeded, layout-independent bounded sample of vectors as a float64
    matrix — the shared training input for PQ/SQ/IVF: never a full collect,
    and sorted so the result does not depend on partitioning."""
    n_total = embeddings.count()
    if n_total <= sample_size:
        rows = embeddings.select(vec_col).collect()
    else:
        frac = min(1.0, (sample_size * 1.3) / n_total)
        rows = (
            embeddings.select(vec_col)
            .sample(withReplacement=False, fraction=frac, seed=seed)
            .limit(sample_size)
            .collect()
        )
    M = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    return M[np.lexsort(M.T)]


# -- scalar quantization (SQ, int8) -------------------------------------------

def sq_train(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    sample_size: int = 4096,
    seed: int = 7,
):
    """Train per-dimension int8 quantization ranges ``(lo, hi)`` from the
    seeded bounded sample. Scalar quantization is the lighter sibling of PQ
    (same family as FAISS's ``SQ8`` index — public method): 4× smaller than
    float32 with near-exact ranking, no codebook training loop, and the
    dequantized scan stays a dense matmul. Use SQ when memory is the
    constraint but PQ's lossy ranking is not acceptable; PQ when you need
    the full 32×.

    Degenerate dimensions (hi == lo on the sample) get a widened epsilon
    range so encode/decode stay well-defined.
    """
    M = _bounded_sample_matrix(embeddings, vec_col, sample_size, seed)
    lo, hi = M.min(axis=0), M.max(axis=0)
    flat = hi - lo <= 0
    lo[flat] -= 0.5
    hi[flat] += 0.5
    return lo, hi


def sq_encode(
    embeddings: DataFrame,
    ranges,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors → ``codes`` (array of ``dim`` tinyints in [-128,127]):
    one Arrow batch per partition, uniform per-dimension quantization
    ``round((x - lo) / (hi - lo) * 255) - 128``, clipped — values outside
    the trained range (sample didn't see the extreme) saturate instead of
    wrapping. The codes table is what the approximate scan reads: 1 byte
    per dimension vs 8 for the float64 arrays Spark materializes."""
    from pyspark.sql.functions import pandas_udf

    lo, hi = (np.asarray(r, dtype=np.float64) for r in ranges)
    scale = hi - lo

    @pandas_udf("array<tinyint>")
    def encode(vs: pd.Series) -> pd.Series:
        if not len(vs):  # empty Arrow batch: vstack would raise
            return pd.Series([], dtype=object)
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vs])
        q = np.rint((V - lo) / scale * 255.0) - 128.0
        return pd.Series(list(np.clip(q, -128, 127).astype(np.int8)))

    return embeddings.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def sq_topk(
    codes: DataFrame,
    ranges,
    query_vec: list[float],
    k: int = 10,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8 codes: each batch dequantizes to
    ``v̂ = lo + (code + 128) / 255 · (hi − lo)`` and scores ``cos(v̂, q)`` as
    one dense matvec — the scan reads 1 byte/dim. With ``rerank`` (the
    full-vector table) the top ``k × rerank_factor`` candidates are
    re-scored exactly, touching only O(k) float vectors — same two-stage
    shape as ``pq_topk``."""
    from pyspark.sql.functions import pandas_udf

    lo, hi = (np.asarray(r, dtype=np.float64) for r in ranges)
    scale = (hi - lo) / 255.0
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.maximum(np.linalg.norm(q), 1e-12)

    @pandas_udf("double")
    def sq_score(cs: pd.Series) -> pd.Series:
        if not len(cs):  # empty Arrow batch: vstack would raise
            return pd.Series([], dtype="float64")
        C = np.vstack([np.asarray(c, dtype=np.float64) for c in cs])
        V = lo + (C + 128.0) * scale
        vnorm = np.maximum(np.linalg.norm(V, axis=1), 1e-12)
        return pd.Series((V @ q) / (qn * vnorm))

    approx = (
        codes.select(F.col(id_col), sq_score(F.col("codes")).alias("approx_cos"))
        .orderBy(F.col("approx_cos").desc(), F.col(id_col).asc())
        .limit(k * rerank_factor if rerank is not None else k)
    )
    if rerank is None:
        return approx
    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        approx.join(rerank.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), qarr).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


# -- product quantization (PQ) ------------------------------------------------

def pq_train(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_size: int = 4096,
    iters: int = 15,
    seed: int = 7,
):
    """Train product-quantization codebooks: split the vector into ``m``
    subspaces and run k-means (``k`` codes) independently in each, on the
    same seeded layout-independent bounded sample ``ivf_train_centroids``
    uses. Returns ``(m, k, dim/m)`` float64 codebooks.

    Memory story at scale: a 64-dim float32 vector is 256 bytes; its PQ code
    is ``m`` bytes (8 here, 32×; production uses k=256 → one byte per
    subspace exactly). 100 TB of raw embeddings become ~3 TB of codes —
    the difference between an ANN scan that streams from disk and one whose
    working set fits in cluster memory. Jégou et al., "Product Quantization
    for Nearest Neighbor Search" (TPAMI 2011) — public method.
    """
    M = _bounded_sample_matrix(embeddings, vec_col, sample_size, seed)
    dim = M.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, d_sub), dtype=np.float64)
    for s in range(m):
        X = M[:, s * d_sub : (s + 1) * d_sub]
        C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(C)):
                members = X[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
                # empty cell: keep the old centroid (deterministic)
        books[s, : len(C)] = C
        if len(C) < k:  # degenerate tiny sample: pad by repeating
            books[s, len(C) :] = C[-1]
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors → ``codes`` (array of ``m`` smallints), one Arrow
    batch matmul per subspace. The codes table is the only thing the ADC
    scan reads — at 256 codes it is literally m bytes per vector."""
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)
    m, k, d_sub = books.shape

    @pandas_udf("array<smallint>")
    def encode(vs: pd.Series) -> pd.Series:
        if not len(vs):  # empty Arrow batch: vstack would raise
            return pd.Series([], dtype=object)
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vs])
        out = np.empty((len(V), m), dtype=np.int16)
        for s in range(m):
            X = V[:, s * d_sub : (s + 1) * d_sub]
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
            d2 = -2.0 * (X @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return embeddings.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def pq_topk(
    codes: DataFrame,
    codebooks,
    query_vec: list[float],
    k: int = 10,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: per-subspace lookup tables against the
    query turn scoring into ``m`` table lookups per vector — no float
    vectors are read at scan time. With ``rerank`` (the full-vector table),
    the top ``k × rerank_factor`` approximate candidates are re-scored with
    exact cosine — the standard two-stage PQ search, where the exact pass
    touches only O(k) full vectors."""
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, d_sub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.maximum(np.linalg.norm(q), 1e-12)
    # LUTs: dot(q_sub, code) and ||code||² — approx v̂ = concat(codes)
    lut_dot = np.stack(
        [books[s] @ q[s * d_sub : (s + 1) * d_sub] for s in range(m)]
    )  # (m, k)
    lut_n2 = (books**2).sum(axis=2)  # (m, k)

    @pandas_udf("double")
    def adc_score(cs: pd.Series) -> pd.Series:
        if not len(cs):  # empty Arrow batch: vstack would raise
            return pd.Series([], dtype="float64")
        C = np.vstack([np.asarray(c, dtype=np.int64) for c in cs])  # (n, m)
        rows = np.arange(m)
        dots = lut_dot[rows[None, :], C].sum(axis=1)
        vnorm = np.sqrt(np.maximum(lut_n2[rows[None, :], C].sum(axis=1), 1e-24))
        return pd.Series(dots / (qn * vnorm))

    approx = (
        codes.select(F.col(id_col), adc_score(F.col("codes")).alias("approx_cos"))
        .orderBy(F.col("approx_cos").desc(), F.col(id_col).asc())
        .limit(k * rerank_factor if rerank is not None else k)
    )
    if rerank is None:
        return approx
    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        approx.join(rerank.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), qarr).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_eval: int = 100_000,
) -> DataFrame:
    """Semantic benchmark decontamination: every (corpus, eval) embedding
    pair with cosine ≥ threshold — the paraphrase-contamination check that
    n-gram overlap (``corpus.decontaminate``) misses (a reworded eval
    question shares no 13-gram but sits at cosine ~0.95).

    Returns (corpus_id, eval_id, cos_sim) rounded to 6; drop
    ``corpus_id``s downstream (same composition as the n-gram variant).

    Scale shape: an eval suite is SMALL by definition, so the eval matrix
    collects to the driver (guarded by ``max_eval`` — refuse loudly past
    it) and rides the closure into ONE ``mapInPandas`` pass over the
    corpus: each Arrow batch is a single batch×eval matmul and only
    threshold survivors leave the kernel. Zero shuffles, zero joins, scan
    bound — the corpus is read once whatever the eval size."""
    import numpy as np
    import pandas as pd

    rows = (
        eval_set.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .limit(max_eval + 1)
        .collect()
    )
    if len(rows) > max_eval:
        raise ValueError(
            f"eval set exceeds max_eval={max_eval}; an eval suite this large "
            "should go through the LSH/IVF pair path instead"
        )
    if not rows:
        raise ValueError("empty eval set")
    E = np.vstack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    e_ids = np.array([r[id_col] for r in rows])
    ne = np.linalg.norm(E, axis=1)
    ne[ne == 0] = np.nan
    En = E / ne[:, None]

    if id_col not in corpus.columns:
        raise ValueError(f"corpus is missing id column {id_col!r}")
    if id_col not in eval_set.columns:
        raise ValueError(f"eval set is missing id column {id_col!r}")
    # eval_id carries the EVAL set's id type — it may differ from the corpus
    # id type, and typing it off the corpus would mis-cast the Arrow output.
    out_schema = T.StructType(
        [
            T.StructField("corpus_id", corpus.schema[id_col].dataType),
            T.StructField("eval_id", eval_set.schema[id_col].dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            nm = np.linalg.norm(M, axis=1)
            nm[nm == 0] = np.nan
            sims = np.round((M / nm[:, None]) @ En.T, 6)
            ic, ie = np.nonzero(sims >= threshold)
            if not len(ic):
                continue
            yield pd.DataFrame(
                {
                    "corpus_id": pdf[id_col].to_numpy()[ic],
                    "eval_id": e_ids[ie],
                    "cos_sim": sims[ic, ie],
                }
            )

    return corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).mapInPandas(gen, out_schema)


def hard_negatives(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining: for each probe vector, the top-``k`` most
    cosine-similar corpus vectors with a DIFFERENT label — the
    contrastive-training data step (triplet/InfoNCE negatives that are
    hard because they're near the anchor yet labeled differently).

    Brute-force exact by design (this is the verification-grade
    baseline, same contract as ``brute_force_topk``); at corpus scale
    swap the candidate generator for the IVF/LSH paths and keep the
    label-inequality filter + re-rank — the scoring and ordering here
    are the semantics, the scan strategy is not.

    Returns (probe_id, vec_id, label, cos_sim) — ``k`` rows per probe,
    ordered within probe by (cos_sim desc, vec_id asc); a probe's own
    row and same-label rows never appear. Probes missing from the corpus
    yield no rows (stated, not NULL-padded).

    Shape: probes (a handful) broadcast against one corpus pass; the
    per-probe top-k is a probe-keyed rank window over the scored rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    probes = (
        embeddings.filter(F.col(id_col).isin(probe_ids))
        .select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).cast("array<double>").alias("__pvec"),
            F.col(label_col).alias("__plabel"),
        )
    )
    scored = (
        embeddings.crossJoin(F.broadcast(probes))
        .filter(
            (F.col(label_col) != F.col("__plabel"))
            & (F.col(id_col) != F.col("probe_id"))
        )
        .select(
            "probe_id",
            id_col,
            label_col,
            F.round(
                cosine_similarity(
                    F.col(vec_col).cast("array<double>"), F.col("__pvec")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.7,
    fetch: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick the candidate maximizing
    λ·sim(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s) — the retrieval
    finisher that stops the top-k being five near-copies of the same
    document, which for RAG/context-window packing matters as much as
    raw similarity.

    Two stages, both distributed: (1) ONE corpus scan takes the top
    ``fetch`` by plain cosine (TakeOrderedAndProject — the bounded
    candidate pool; diversity can only demote, never promote past rank
    ``fetch``, so the pool bound is the documented approximation knob);
    (2) k unrolled greedy picks over the pool — per pick, one
    pool⋈selected max-similarity aggregation and one top-1, all on
    ≤ ``fetch`` rows (the pool is eagerly localCheckpointed; no
    driver-side selection loop over corpus data).

    Deterministic & engine-portable: every similarity is rounded to 6
    BEFORE comparison (the established cross-engine cosine contract)
    and every argmax tie-breaks by id ASC, so an unrolled SQL oracle
    replays the greedy chain exactly. Returns (pick, id, cos_sim,
    mmr_score) in pick order 1..k."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k > fetch:
        raise ValueError(f"k={k} must be <= fetch={fetch}")
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    pool = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.round(
                cosine_similarity(F.col(vec_col).cast("array<double>"), q), 6
            ).alias("sim_q"),
        )
        .orderBy(F.col("sim_q").desc(), F.col("id").asc())
        .limit(fetch)
        .localCheckpoint(eager=True)
    )
    picks = None
    for step in range(1, k + 1):
        if picks is None:
            # first pick is the plain argmax of sim_q
            best = (
                pool.orderBy(F.col("sim_q").desc(), F.col("id").asc())
                .limit(1)
                .select(
                    F.lit(1).alias("pick"),
                    "id",
                    F.col("sim_q").alias("cos_sim"),
                    F.col("sim_q").alias("mmr_score"),
                )
            )
        else:
            sel = picks.select(F.col("id").alias("sid"))
            sel_vecs = pool.join(sel, pool["id"] == sel["sid"]).select(
                F.col("v").alias("sv")
            )
            remaining = pool.join(sel, pool["id"] == sel["sid"], "left_anti")
            max_sel = (
                remaining.crossJoin(F.broadcast(sel_vecs))
                .select(
                    "id",
                    "sim_q",
                    F.round(cosine_similarity(F.col("v"), F.col("sv")), 6).alias(
                        "sim_s"
                    ),
                )
                .groupBy("id", "sim_q")
                .agg(F.max("sim_s").alias("max_sim_sel"))
            )
            best = (
                max_sel.select(
                    F.lit(step).alias("pick"),
                    "id",
                    F.col("sim_q").alias("cos_sim"),
                    F.round(
                        F.lit(lam) * F.col("sim_q")
                        - F.lit(1.0 - lam) * F.col("max_sim_sel"),
                        6,
                    ).alias("mmr_score"),
                )
                .orderBy(F.col("mmr_score").desc(), F.col("id").asc())
                .limit(1)
            )
        best = best.localCheckpoint(eager=True)
        picks = best if picks is None else picks.unionByName(best).localCheckpoint(eager=True)
    return picks.orderBy("pick")
