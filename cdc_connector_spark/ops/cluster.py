"""Distributed k-means document clustering + SemDedup semantic dedup.

The LLM-pipeline use case (SemDedup, Abbas et al. 2023, arXiv:2303.09540):
cluster the corpus embeddings with k-means, then look for semantic
near-duplicates ONLY within a cluster — the cluster structure bounds the
pair space, turning an O(n²) similarity join into Σ O(n_c²) with n_c ≪ n.

Unlike ``ann.ivf_train_centroids`` (a seeded *sample*-trained spherical
k-means used purely as an index layout), this module implements exact
full-corpus Lloyd's iterations with a DETERMINISTIC, engine-portable
recipe, so the entire fit is re-derivable in ANSI SQL and value-verified
by the driver's DuckDB oracle:

- init: the embeddings of the ``k`` smallest ids, cluster ids assigned in
  id order (no RNG, no sampling);
- assignment: argmin of squared L2 distance, ties broken by smallest
  cluster id (matches SQL ``row_number() OVER (ORDER BY d2, cid)``);
- update: exact per-cluster coordinate mean over the FULL corpus; an
  emptied cluster keeps its previous centroid;
- a FIXED number of iterations (no data-dependent convergence test, which
  would be fragile under float reordering across engines).

Execution shape per iteration (scale posture):
- centroids are a k×dim float64 matrix — broadcast by closure capture into
  ONE ``mapInPandas`` pass over the corpus that FUSES assignment and the
  partial-sum update: each Arrow batch does a single numpy matmul and
  accumulates per-cluster (count, Σvec) locally. The corpus is never
  shuffled; only k×(dim+1) doubles per PARTITION leave the kernel
  (count packed as the last slot of the sums array so one posexplode →
  groupBy(cluster,pos) → collect of k×(dim+1) scalar rows finishes the
  reduce — no second job over the partials).
- total work: (iters + 1) corpus scans, zero corpus shuffles, driver state
  O(k·dim) — the MLlib shape, with deterministic arithmetic.

Float caveat: Spark's partition-partial sums and DuckDB's aggregate order
differ at ~1e-15 relative error, so squared-distance gaps below ~1e-13
could in principle flip an assignment between engines. Gaps are
continuous-valued; the oracle comparison is stable in practice (verified
at sf0.001/0.01/0.1) and distances are rounded before they are emitted.

Reference anchor: the reference has no clustering operator — this is part
of the LLM training-data extension (BASELINE.json north star), alongside
ops/dedup.py and ops/ann.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kmeans_init(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic seeds: embeddings of the k smallest ids, in id order.

    One TakeOrderedAndProject (no full sort); k·dim doubles to the driver.
    """
    rows = (
        embeddings.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} but corpus has only {len(rows)} vectors")
    return np.vstack([np.asarray(r["v"], dtype=np.float64) for r in rows])


def kmeans_init_plusplus(
    embeddings: DataFrame,
    k: int,
    seed: int = 0,
    sample_size: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded k-means++ (Arthur & Vassilvitskii 2007) over a BOUNDED,
    hash-ranked corpus sample — the clustering-QUALITY init (verdict r6
    #6). The deterministic smallest-k-ids init (``kmeans_init``) is
    oracle-perfect but quality-poor on real corpora: adjacent ids often
    share a domain/shard, so the k seeds can all land in one region and
    fixed-iteration Lloyd's never escapes. D² seeding spreads seeds
    proportionally to squared distance from the chosen set.

    Determinism: the sample is the ``sample_size`` smallest PORTABLE HASH
    values of the id (ties by id — reproducible on any engine/partitioning,
    same recipe as ``corpus.hash_sample``), and the D² draws come from a
    seeded generator. Same inputs → same seeds, but NOT SQL-re-derivable —
    anything needing cross-engine value parity uses ``kmeans_init``.

    Scale shape: one TakeOrdered over the corpus (no full sort) collects
    ≤ sample_size × dim doubles; the D² loop is k passes over the sample
    matrix on the driver — O(k · sample_size · dim) flops, no Spark jobs."""
    from cdc_connector_spark.ops.corpus import knuth_hash

    rows = (
        embeddings.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy(knuth_hash("__id", seed).asc(), F.col("__id").asc())
        .limit(sample_size)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} but corpus has only {len(rows)} vectors")
    X = np.vstack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    chosen = [int(rng.integers(len(X)))]
    d2 = ((X - X[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        total = d2.sum()
        if total <= 0.0:  # all mass on chosen points (duplicate-heavy sample)
            probs = np.full(len(X), 1.0 / len(X))
        else:
            probs = d2 / total
        nxt = int(rng.choice(len(X), p=probs))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    return X[chosen].copy()


def _iterate_kernel(C: np.ndarray, vec_col: str):
    """mapInPandas kernel: fused assign + per-partition partial sums.

    Emits k rows per partition: (cluster_id, sums[dim+1]) where
    sums[dim] is the member count — packing the count into the array lets
    the global reduce be a single posexplode/groupBy job.
    """
    k, dim = C.shape
    c_sq = (C * C).sum(axis=1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # d2 = |x|^2 - 2 x·c + |c|^2 ; |x|^2 is constant per row, so
            # argmin needs only the matmul term (+|c|^2). argmin returns the
            # FIRST minimal index = smallest cluster id on ties.
            d2 = c_sq[None, :] - 2.0 * (M @ C.T)
            assign = d2.argmin(axis=1)
            np.add.at(counts, assign, 1)
            np.add.at(sums, assign, M)
        out = np.concatenate([sums, counts[:, None].astype(np.float64)], axis=1)
        yield pd.DataFrame(
            {"cluster_id": np.arange(k, dtype=np.int32), "sums": list(out)}
        )

    return gen


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float | None = None,
    max_iters: int = 20,
    init: str = "ids",
    seed: int = 0,
    init_sample: int = 100_000,
) -> np.ndarray:
    """Exact Lloyd's; returns the final k×dim centroids.

    Two stopping modes:
    - ``tol=None`` (default): exactly ``iters`` iterations — the
      deterministic, engine-portable recipe the DuckDB oracle re-derives
      (a data-dependent stop would be fragile under float reordering
      across engines).
    - ``tol=<float>``: iterate until the max centroid L2 shift drops below
      ``tol`` or ``max_iters`` is hit — the convergence variant for when
      clustering QUALITY matters beyond SemDedup bucketing. Still
      deterministic given the same engine (fixed seeds, exact means); just
      not oracle-mirrored, so use the fixed-``iters`` mode for anything
      that needs cross-engine value parity.

    Each iteration is ONE corpus scan (fused assign+update kernel) plus a
    k×(dim+1)-row reduce; see module docstring for the scale argument.

    ``iters`` and ``tol`` are mutually exclusive: passing a non-default
    ``iters`` together with ``tol`` raises (the tol mode's round cap is
    ``max_iters``, and silently ignoring ``iters`` surprised callers).

    ``init``: ``"ids"`` (default) is the deterministic smallest-k-ids
    recipe — the oracle-mirrored mode; ``"kmeans++"`` is seeded D²
    sampling over a bounded hash-ranked sample (``seed``/``init_sample``)
    for clustering QUALITY — reproducible but not SQL-re-derivable.
    """
    # None sentinel (not a value default): an EXPLICIT iters=3 with tol
    # must also raise — the review caught the `iters != 3` form silently
    # accepting exactly the default value
    if tol is not None and iters is not None:
        raise ValueError(
            "iters and tol are mutually exclusive: tol-mode rounds are "
            "capped by max_iters; drop iters or use max_iters instead"
        )
    if iters is None and tol is None:
        iters = 3  # the deterministic oracle-mirrored default
    if init == "ids":
        C = kmeans_init(embeddings, k, id_col, vec_col)
    elif init == "kmeans++":
        C = kmeans_init_plusplus(embeddings, k, seed, init_sample, id_col, vec_col)
    else:
        raise ValueError(f"init must be 'ids' or 'kmeans++', got {init!r}")
    dim = C.shape[1]
    partial_schema = T.StructType(
        [
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
        ]
    )
    src = embeddings.select(F.col(vec_col).cast("array<double>").alias(vec_col))
    n_rounds = max_iters if tol is not None else iters
    for _ in range(n_rounds):
        partials = src.mapInPandas(_iterate_kernel(C, vec_col), partial_schema)
        reduced = (
            partials.select("cluster_id", F.posexplode("sums").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for r in reduced:
            if r["pos"] == dim:
                counts[r["cluster_id"]] = r["s"]
            else:
                sums[r["cluster_id"], r["pos"]] = r["s"]
        nonempty = counts > 0
        # emptied cluster keeps its previous centroid (same rule in the SQL
        # oracle via coalesce(new, prev))
        C_next = np.where(nonempty[:, None], sums / np.maximum(counts, 1)[:, None], C)
        if tol is not None:
            shift = float(np.sqrt(((C_next - C) ** 2).sum(axis=1)).max())
            C = C_next
            if shift < tol:
                break
        else:
            C = C_next
    return C


def kmeans_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared L2, ties →
    smallest cluster id). One scan, no shuffle; returns
    (id, cluster_id, sq_dist) with sq_dist rounded to 6 decimals so the
    result is engine-portable under float reordering. ``keep_vec`` carries
    the (float64) vector through the kernel output — downstream per-cluster
    work then needs NO join back against the corpus (the kernel has the
    vector in hand anyway; re-joining it would cost two corpus-sized
    exchanges)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    id_field = embeddings.schema[id_col]
    fields = [
        T.StructField(id_col, id_field.dataType),
        T.StructField("cluster_id", T.IntegerType()),
        T.StructField("sq_dist", T.DoubleType()),
    ]
    if keep_vec:
        fields.append(T.StructField(vec_col, T.ArrayType(T.DoubleType())))
    out_schema = T.StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) + c_sq[None, :]
            assign = d2.argmin(axis=1)
            out = {
                id_col: pdf[id_col].to_numpy(),
                "cluster_id": assign.astype(np.int32),
                "sq_dist": np.round(d2[np.arange(len(M)), assign], 6),
            }
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return embeddings.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(gen, out_schema)


def kmeans_clusters(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """fit + final assignment: (id, cluster_id, sq_dist)."""
    C = kmeans_fit(embeddings, k, iters, id_col, vec_col)
    return kmeans_assign(embeddings, C, id_col, vec_col)


def semdedup_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
    oversize_policy: str = "raise",
) -> DataFrame:
    """SemDedup: semantic near-duplicate pairs WITHIN k-means clusters.

    Returns (cluster_id, id_a, id_b, cos_sim) with id_a < id_b and
    cos_sim ≥ threshold (rounded to 6). The cluster partition bounds the
    candidate space — cross-cluster pairs are never generated, which is the
    paper's accepted recall trade (a near-dup pair straddling a cluster
    boundary is missed; at SemDedup's operating point duplicates
    overwhelmingly co-locate).

    Execution: the assignment kernel carries the vector straight through
    (``keep_vec`` — NO join back against the corpus), so the only shuffle
    is the per-cluster groupBy; each cluster's pairwise-cosine matrix is
    ONE numpy matmul inside an ``applyInPandas`` kernel — the same fused
    shape as ``ann.embedding_neardup_pairs``, with the k-means cluster
    playing the LSH bucket's role. Only threshold survivors leave the
    kernel. Clusters larger than ``max_cluster`` are refused loudly by
    default (raise, not silent drop): at that size the caller should raise
    k — or opt into ``oversize_policy="subsample"`` (see
    ``pairs_within_clusters``)."""
    C = kmeans_fit(embeddings, k, iters, id_col, vec_col)
    return pairs_within_clusters(
        kmeans_assign(embeddings, C, id_col, vec_col, keep_vec=True),
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        max_cluster=max_cluster,
        oversize_policy=oversize_policy,
    )


def pairs_within_clusters(
    assigned: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
    oversize_policy: str = "raise",
) -> DataFrame:
    """All cosine≥threshold pairs WITHIN each ``cluster_id`` group of an
    assignment frame that carries its vectors (``kmeans_assign`` with
    ``keep_vec=True``). One groupBy shuffle; one matmul per cluster;
    survivors only. The shared kernel behind ``semdedup_pairs`` (full-fit
    path) and the streaming in-batch dedup (pinned-centroid path).

    ``oversize_policy`` governs clusters larger than ``max_cluster``:

    - ``"raise"`` (default): refuse loudly — the caller should raise k.
      This is the only mode with full within-cluster recall, so it is the
      mode every value-verified query uses.
    - ``"subsample"``: deduplicate only the ``max_cluster`` members
      CLOSEST to the centroid (smallest ``sq_dist``, ties by id — a
      deterministic ε-fraction cut in the spirit of SemDedup's per-cluster
      budget). Near-duplicates concentrate in the dense core around the
      centroid; the far tail a mega-cluster accumulates is its most
      diverse region, so the dropped members are the least likely to pair.
      This is an explicit recall trade for corpora whose k is pinned by an
      index (``semdedup_index_write``) and cannot be raised; audit the
      affected clusters first with ``oversized_clusters``. Requires the
      ``sq_dist`` column (present on every ``kmeans_assign`` output).
    """
    if oversize_policy not in ("raise", "subsample"):
        raise ValueError(f"unknown oversize_policy {oversize_policy!r}")
    cols = [id_col, "cluster_id", F.col(vec_col).alias("__v")]
    if oversize_policy == "subsample":
        if "sq_dist" not in assigned.columns:
            raise ValueError(
                "oversize_policy='subsample' needs the sq_dist column "
                "(use kmeans_assign(..., keep_vec=True) output directly)"
            )
        cols.append("sq_dist")
    joined = assigned.select(*cols)
    id_field = assigned.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("id_a", id_field.dataType),
            T.StructField("id_b", id_field.dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def cluster_pairs(key, pdf):
        empty = pd.DataFrame(
            {"cluster_id": [], "id_a": [], "id_b": [], "cos_sim": []}
        )
        n = len(pdf)
        if n < 2:
            return empty
        if n > max_cluster:
            if oversize_policy == "raise":
                raise ValueError(
                    f"cluster {key[0]} has {n} members > max_cluster={max_cluster}; "
                    "raise k (more, smaller clusters) or max_cluster, or opt "
                    "into oversize_policy='subsample'"
                )
            pdf = pdf.sort_values(["sq_dist", id_col], kind="mergesort").head(
                max_cluster
            )
            n = len(pdf)
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = np.nan
        Mn = M / norms[:, None]
        sims = Mn @ Mn.T
        ia, ib = np.triu_indices(n, k=1)
        vals = np.round(sims[ia, ib], 6)
        keep = vals >= threshold
        if not keep.any():
            return empty
        ids = pdf[id_col].to_numpy()
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {
                "cluster_id": np.full(keep.sum(), key[0], dtype=np.int32),
                "id_a": lo,
                "id_b": hi,
                "cos_sim": vals[keep],
            }
        )

    return joined.groupBy("cluster_id").applyInPandas(cluster_pairs, out_schema)


def oversized_clusters(assigned: DataFrame, max_cluster: int = 100_000) -> DataFrame:
    """Audit: (cluster_id, n_members) for every cluster past ``max_cluster``
    — the clusters ``oversize_policy="subsample"`` would cut (and by how
    much: ``n_members - max_cluster`` members dropped). One groupBy over
    (int, 1) rows; run it before opting into the subsample trade."""
    return (
        assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_cluster)
        .orderBy(F.col("n_members").desc())
    )


def semdedup_prune(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus minus semantic near-duplicates: for every near-dup PAIR the
    higher id is dropped (keep-first rule, matching the dedup family).
    Returns the surviving rows of ``embeddings`` unchanged."""
    drops = (
        semdedup_pairs(embeddings, k, iters, threshold, id_col, vec_col)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return embeddings.join(drops, id_col, "left_anti")


def semdedup_index_write(
    embeddings: DataFrame,
    path: str,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    centroids=None,
) -> None:
    """Persist a SemDedup index: the embedding-side mirror of the MinHash
    incremental index (``dedup.minhash_index_write``). The corpus is
    written PARTITIONED BY its k-means cluster, so probing a batch reads
    only the batch's clusters — partition pruning, the IVF layout story.

    ``<path>/data`` = (id, vec float64) partitioned by ``cluster_id``;
    ``<path>/_META`` pins (k, iters, dim) AND the trained centroids, so
    every probe and append assigns with EXACTLY the fit the index was
    built with (retraining on append would silently shift cluster
    boundaries and orphan existing partitions).

    ``mode="append"`` adds a batch under the pinned centroids (the ingest
    loop: lookup → keep novel → append). Durability: on initial build
    ``_META`` is written LAST via atomic rename — a crash mid-build leaves
    no ``_META`` and probes fail fast; appends are single-directory writes
    (one step, no inconsistent window beyond parquet's own task commit).
    """
    import json
    import os

    meta_file = os.path.join(path, "_META")
    if mode == "append":
        if not os.path.exists(meta_file):
            raise ValueError(
                f"no _META at {path}: refusing to append to a missing or "
                "partially-built index (build with mode='overwrite' first)"
            )
        with open(meta_file) as fh:
            meta = json.load(fh)
        if meta["k"] != k or meta["iters"] != iters:
            raise ValueError(
                f"index at {path} was built with k={meta['k']}/iters={meta['iters']}, "
                f"got k={k}/iters={iters}"
            )
        C = np.asarray(meta["centroids"], dtype=np.float64)
    elif centroids is not None:
        # caller already fit (e.g. the streaming bootstrap dedups the batch
        # under these centroids before writing) — pin exactly those
        C = np.asarray(centroids, dtype=np.float64)
    else:
        C = kmeans_fit(embeddings, k, iters, id_col, vec_col)
    if mode != "append" and os.path.exists(meta_file):
        # rebuild-in-place: drop _META BEFORE touching data, so a crash (or
        # a concurrent probe) mid-rewrite fails fast instead of pairing the
        # OLD pinned centroids with the NEW partition layout — the initial
        # build's fail-fast guarantee, extended to rebuilds
        os.remove(meta_file)
    assigned = kmeans_assign(embeddings, C, id_col, vec_col, keep_vec=True).select(
        id_col, "cluster_id", vec_col
    )
    assigned.write.mode(mode).partitionBy("cluster_id").parquet(
        os.path.join(path, "data")
    )
    if mode != "append":
        tmp = meta_file + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(
                {"k": k, "iters": iters, "dim": int(C.shape[1]),
                 "centroids": [[float(x) for x in row] for row in C]},
                fh,
            )
        os.replace(tmp, meta_file)


def semdedup_index_lookup(
    batch: DataFrame,
    path: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Probe a NEW batch against the persisted SemDedup index: returns
    (cluster_id, batch_id, corpus_id, cos_sim) for every batch×corpus pair
    in the same cluster with cosine ≥ threshold — O(batch + probed
    clusters), never O(corpus).

    Self-pairs (batch_id == corpus_id) are EXCLUDED, mirroring
    minhash_index_lookup: a batch doc already present in the index under
    the same id is a REPLAY of itself, not a duplicate — without the
    filter a crash-window replay would match itself at cos 1.0 and the
    streaming dedup would drop the whole batch (r11 review; the
    crash-replay data-loss test pins this).

    Shape: the batch assigns against the PINNED centroids (one kernel
    pass, no shuffle), its distinct cluster ids (≤ k, driver-bounded)
    prune the corpus read to matching partitions, and each probed
    cluster's batch×corpus cosine block is one numpy matmul in an
    ``applyInPandas`` kernel — survivors only leave."""
    import json
    import os

    spark = batch.sparkSession
    with open(os.path.join(path, "_META")) as fh:
        meta = json.load(fh)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    if assigned is None:
        # the cluster-id collect below and the returned plan would both
        # execute the assignment kernel; persist so it runs ONCE (a probe
        # batch is bounded by the ingest trigger — caching it is cheap).
        # Callers that already hold a persisted assignment (the streaming
        # loop) pass it via ``assigned`` and skip this entirely.
        assigned = kmeans_assign(batch, C, id_col, vec_col, keep_vec=True).persist()
    probe = assigned.select(
        F.col(id_col).alias("__id"),
        "cluster_id",
        F.col(vec_col).alias("__v"),
        F.lit(True).alias("__is_batch"),
    )
    clusters = [r["cluster_id"] for r in probe.select("cluster_id").distinct().collect()]
    corpus = (
        spark.read.parquet(os.path.join(path, "data"))
        .filter(F.col("cluster_id").isin(clusters))
        .select(
            F.col(id_col).alias("__id"),
            "cluster_id",
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.lit(False).alias("__is_batch"),
        )
    )
    both = probe.unionByName(corpus)
    id_field = batch.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("batch_id", id_field.dataType),
            T.StructField("corpus_id", id_field.dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def cluster_probe(key, pdf):
        empty = pd.DataFrame(
            {"cluster_id": [], "batch_id": [], "corpus_id": [], "cos_sim": []}
        )
        b = pdf[pdf["__is_batch"]]
        c = pdf[~pdf["__is_batch"]]
        if not len(b) or not len(c):
            return empty
        if len(pdf) > max_cluster:
            raise ValueError(
                f"cluster {key[0]} has {len(pdf)} members > max_cluster={max_cluster}"
            )
        Mb = np.vstack([np.asarray(v, dtype=np.float64) for v in b["__v"]])
        Mc = np.vstack([np.asarray(v, dtype=np.float64) for v in c["__v"]])
        nb = np.linalg.norm(Mb, axis=1); nb[nb == 0] = np.nan
        nc = np.linalg.norm(Mc, axis=1); nc[nc == 0] = np.nan
        sims = np.round((Mb / nb[:, None]) @ (Mc / nc[:, None]).T, 6)
        ib, ic = np.nonzero(sims >= threshold)
        if not len(ib):
            return empty
        return pd.DataFrame(
            {
                "cluster_id": np.full(len(ib), key[0], dtype=np.int32),
                "batch_id": b["__id"].to_numpy()[ib],
                "corpus_id": c["__id"].to_numpy()[ic],
                "cos_sim": sims[ib, ic],
            }
        )

    return (
        both.groupBy("cluster_id")
        .applyInPandas(cluster_probe, out_schema)
        .filter(F.col("batch_id") != F.col("corpus_id"))
    )
