"""streaming/export.py — continuous training-data export with a pinned
vocabulary, deterministic shards, and marker-committed exactly-once."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cdc_connector_spark.ops.textstats import build_vocab
from cdc_connector_spark.streaming.export import StreamingTrainingExport

DOCS = [
    (1, "alpha beta gamma alpha"),
    (2, "beta beta delta"),
    (3, "gamma alpha alpha beta"),
    (4, "delta delta delta alpha"),
    (5, "epsilon zeta"),
    (6, ""),  # token-less: excluded by min_tokens
]


def _write_source(spark, src):
    # two files -> two micro-batches under maxFilesPerTrigger=1
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    df.filter("doc_id <= 3").repartition(1).write.mode("overwrite").parquet(src + "/a")
    df.filter("doc_id > 3").repartition(1).write.mode("overwrite").parquet(src + "/b")


def test_streaming_export_end_to_end_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "export")
    _write_source(spark, src)
    corpus = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    vocab = build_vocab(corpus, min_count=1)

    exp = StreamingTrainingExport(spark, out, vocab=vocab, n_shards=4)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = exp.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert len(exp.committed_batch_ids()) >= 2  # genuinely incremental
    got = exp.exported()
    rows = {r["doc_id"]: r for r in got.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # empty doc excluded, nothing lost
    # encodings round-trip through the pinned vocab (ids decode to tokens)
    inv = {r["token_id"]: r["token"] for r in vocab.collect()}
    for i, text in DOCS:
        if not text:
            continue
        decoded = [inv[int(t)] for t in rows[i]["token_ids"].split(",")]
        assert decoded == text.split(), i
    # per-(batch, shard) positions are dense from 0
    pdf = got.toPandas()
    for (b, s), grp in pdf.groupby(["batch_id", "shard"]):
        assert sorted(grp.pos) == list(range(len(grp))), (b, s)

    # replay from scratch (fresh checkpoint): markers short-circuit, no dupes
    exp2 = StreamingTrainingExport(spark, out, n_shards=4)  # vocab reloads from pin
    stream2 = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q2 = exp2.start(stream2, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert exp2.exported().count() == 5
    assert exp2.stats == []  # every batch skipped on its marker

    # a crashed, uncommitted batch directory is invisible to readers
    fake = os.path.join(out, "data", "batch=999", "shard=0")
    os.makedirs(fake, exist_ok=True)
    spark.createDataFrame(
        [(99, 1, "0", 0, 0)], "doc_id bigint, n_tokens bigint, token_ids string, shard int, pos long"
    ).write.mode("overwrite").parquet(fake)
    assert exp2.exported().filter(F.col("doc_id") == 99).count() == 0


def test_export_requires_vocab_on_first_start(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="pinned vocabulary"):
        StreamingTrainingExport(spark, str(tmp_path / "nope"))


def test_full_continuous_pipeline_dedup_then_export(spark, tmp_path):
    """The whole continuous story in one test: raw stream → near-dup ingest
    (StreamingCorpusDedup) → its accepted output streams into the training
    export (StreamingTrainingExport) — duplicates never reach a shard."""
    from cdc_connector_spark.streaming.dedup import StreamingCorpusDedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " exactly"),            # near-dup of 1 -> dropped
        (3, "completely different text about databases and shuffles here"),
        (4, base),                          # exact dup of 1 -> dropped
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(rows, "doc_id bigint, text string").repartition(
        1
    ).write.mode("overwrite").parquet(src)

    dedup = StreamingCorpusDedup(
        index_path=str(tmp_path / "idx"),
        out_dir=str(tmp_path / "clean"),
        jaccard_threshold=0.5,
    )
    q1 = dedup.start(
        spark.readStream.schema("doc_id bigint, text string").parquet(src),
        str(tmp_path / "ck1"),
    )
    q1.awaitTermination(120)
    clean = dedup.accepted(spark)
    kept_ids = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert kept_ids == [1, 3]

    # stage 2: the cleaned corpus dir IS the export loop's source
    clean_dir = str(tmp_path / "clean")
    vocab = build_vocab(clean, min_count=1)
    exp = StreamingTrainingExport(spark, str(tmp_path / "shards"), vocab=vocab)
    stream = spark.readStream.schema(clean.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(clean_dir)
    q2 = exp.start(stream, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    out = {r["doc_id"] for r in exp.exported().collect()}
    assert out == {1, 3}  # only deduped survivors reach the shards
