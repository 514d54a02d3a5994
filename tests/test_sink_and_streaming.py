"""ParquetMergeSink versioning + end-to-end streaming changelog apply."""

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_connector_spark.changelog.envelope import envelope_schema, flatten_envelope
from cdc_connector_spark.changelog.sink import ParquetMergeSink
from cdc_connector_spark.streaming.pipeline import ChangelogStream

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("val", T.StringType())]
)


def _env_df(spark, rows):
    data = [(b, a, op, ts, "db", "t", seq) for (b, a, op, ts, seq) in rows]
    return spark.createDataFrame(data, envelope_schema(ROW_SCHEMA))


def test_sink_bootstrap_apply_versions(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=2)
    assert sink.read() is None
    sink.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], ROW_SCHEMA))
    assert sink.current_version() == 0 and sink.count() == 2

    batch = flatten_envelope(
        _env_df(
            spark,
            [
                ({"id": 1, "val": "a"}, {"id": 1, "val": "a2"}, "u", 10, 1),
                ({"id": 2, "val": "b"}, None, "d", 11, 2),
                (None, {"id": 3, "val": "c"}, "c", 12, 3),
            ],
        ),
        key_cols=["id"],
    )
    sink.apply(batch)
    assert sink.current_version() == 1
    rows = {r["id"]: r["val"] for r in sink.read().collect()}
    assert rows == {1: "a2", 3: "c"}


def test_sink_vacuum_keeps_recent(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], keep_versions=2)
    for i in range(4):
        sink.overwrite(spark.createDataFrame([(i, "x")], ROW_SCHEMA))
    versions = sorted(d for d in os.listdir(sink.path) if d.startswith("v="))
    assert versions == ["v=2", "v=3"]


def test_streaming_changelog_end_to_end(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    sink = ParquetMergeSink(spark, str(tmp_path / "sink"), ["id"])
    # two files of envelope events, incl. replay duplicate + delete + tie
    _env_df(
        spark,
        [
            (None, {"id": 1, "val": "a"}, "c", 100, 1),
            (None, {"id": 2, "val": "b"}, "c", 100, 2),
        ],
    ).coalesce(1).write.mode("append").parquet(str(src))
    _env_df(
        spark,
        [
            ({"id": 1, "val": "a"}, {"id": 1, "val": "a2"}, "u", 200, 3),
            ({"id": 1, "val": "a"}, {"id": 1, "val": "a2"}, "u", 200, 3),  # replay dup
            ({"id": 2, "val": "b"}, None, "d", 300, 4),
            (None, {"id": 3, "val": "c"}, "c", 300, 5),
            (None, {"id": 3, "val": "c2"}, "u", 300, 6),  # same-ts tie → seq wins
        ],
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = ChangelogStream(
        spark,
        source_dir=str(src),
        sink=sink,
        row_schema=ROW_SCHEMA,
        key_cols=["id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    stream.run_until_caught_up(timeout_s=120)

    rows = {r["id"]: r["val"] for r in sink.read().collect()}
    assert rows == {1: "a2", 3: "c2"}

    # restart with no new files: checkpoint prevents reprocessing; state stable
    stream.run_until_caught_up(timeout_s=60)
    rows2 = {r["id"]: r["val"] for r in sink.read().collect()}
    assert rows2 == rows


def test_quarantine_dlq_on_bad_batch(spark, tmp_path, monkeypatch):
    """ST7/S12: a failing batch parks under _quarantine/batch=<id> and does
    NOT kill the stream or corrupt the sink."""
    src = tmp_path / "stream_in"
    src.mkdir()
    sink = ParquetMergeSink(spark, str(tmp_path / "sink"), ["id"])
    sink.overwrite(spark.createDataFrame([(1, "a")], ROW_SCHEMA))

    _env_df(spark, [(None, {"id": 2, "val": "b"}, "c", 10, 1)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = ChangelogStream(
        spark,
        source_dir=str(src),
        sink=sink,
        row_schema=ROW_SCHEMA,
        key_cols=["id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # sabotage the sink apply for this stream instance only
    def boom(df):
        raise RuntimeError("sink unavailable")

    monkeypatch.setattr(stream.sink, "apply", boom)
    stream.run_until_caught_up(timeout_s=120)

    qdirs = os.listdir(stream.quarantine_dir)
    assert any(d.startswith("batch=") for d in qdirs)
    parked = spark.read.parquet(os.path.join(stream.quarantine_dir, qdirs[0]))
    assert parked.count() == 1  # the bad batch is preserved for replay
    assert sink.count() == 1  # sink state untouched


def test_apply_prunes_untouched_buckets(spark, tmp_path):
    """File-pruning MERGE: a 1-key batch rewrites only that key's bucket;
    every other bucket hard-links forward (same inode)."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=8)
    sink.overwrite(spark.createDataFrame([(i, f"v{i}") for i in range(100)], ROW_SCHEMA))

    batch = flatten_envelope(
        _env_df(spark, [({"id": 7, "val": "v7"}, {"id": 7, "val": "V7!"}, "u", 10, 1)]),
        key_cols=["id"],
    )
    sink.apply(batch)

    v0, v1 = sink.path + "/v=0", sink.path + "/v=1"
    rewritten, linked = [], []
    for name in sorted(os.listdir(v1)):
        if not name.startswith("__bucket="):
            continue
        old = os.path.join(v0, name)
        new = os.path.join(v1, name)
        old_inodes = {os.stat(os.path.join(old, f)).st_ino for f in os.listdir(old) if f.endswith(".parquet")}
        new_inodes = {os.stat(os.path.join(new, f)).st_ino for f in os.listdir(new) if f.endswith(".parquet")}
        (linked if old_inodes == new_inodes else rewritten).append(name)
    assert len(rewritten) == 1 and len(linked) == 7  # only key 7's bucket rewrote

    rows = {r["id"]: r["val"] for r in sink.read().collect()}
    assert rows[7] == "V7!" and rows[0] == "v0" and len(rows) == 100


def test_sink_schema_evolution_merge_schema(spark, tmp_path):
    """ST8 at the sink level: a batch carrying a NEW column widens the table;
    merge_schema=True reconciles mixed bucket schemas on read."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=4, merge_schema=True)
    sink.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], ROW_SCHEMA))

    widened = spark.createDataFrame(
        [(1, "a2", "extra", "u", 10, 1)],
        "id bigint, val string, new_col string, __op string, __ts_ms bigint, __seq bigint",
    )
    sink.apply(widened)
    rows = {r["id"]: (r["val"], r["new_col"]) for r in sink.read().collect()}
    assert rows[1] == ("a2", "extra")
    assert rows[2] == ("b", None)  # untouched row: new col backfills NULL


def test_sink_composite_key(spark, tmp_path):
    """Composite-PK MERGE (the lineitem-style (orderkey, linenumber) shape)."""
    schema = T.StructType(
        [
            T.StructField("ok", T.LongType()),
            T.StructField("ln", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["ok", "ln"], num_buckets=4)
    sink.overwrite(spark.createDataFrame([(1, 1, "a"), (1, 2, "b"), (2, 1, "c")], schema))
    batch = flatten_envelope(
        spark.createDataFrame(
            [
                ({"ok": 1, "ln": 2, "val": "b"}, {"ok": 1, "ln": 2, "val": "B2"}, "u", 10, "db", "t", 1),
                ({"ok": 2, "ln": 1, "val": "c"}, None, "d", 11, "db", "t", 2),
            ],
            envelope_schema(schema),
        ),
        key_cols=["ok", "ln"],
    )
    sink.apply(batch)
    rows = {(r["ok"], r["ln"]): r["val"] for r in sink.read().collect()}
    assert rows == {(1, 1): "a", (1, 2): "B2"}


def test_sink_num_buckets_persisted(spark, tmp_path):
    """Reopening with a different num_buckets must fail, and a reopen with
    no num_buckets must adopt the stored layout (regression: silent
    modulus mismatch corrupted the merge)."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=8)
    sink.overwrite(spark.createDataFrame([(1, "a")], ROW_SCHEMA))
    reopened = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"])
    assert reopened.num_buckets == 8
    with pytest.raises(ValueError, match="num_buckets"):
        ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=32)


def test_sink_retry_after_partial_write_is_clean(spark, tmp_path):
    """A stale never-flipped version dir from a crashed attempt must be
    clobbered, not appended into (regression: duplicate rows on retry)."""
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=2)
    df = spark.createDataFrame([(1, "a"), (2, "b")], ROW_SCHEMA)
    sink.overwrite(df)
    # simulate a crashed apply: partial v=1 exists, _VERSION still 0
    df.withColumn("__bucket", F.lit(0)).write.partitionBy("__bucket").parquet(
        str(tmp_path / "t" / "v=1")
    )
    assert sink.current_version() == 0
    batch = flatten_envelope(
        _env_df(spark, [({"id": 1, "val": "a"}, {"id": 1, "val": "a2"}, "u", 10, 1)]),
        key_cols=["id"],
    )
    sink.apply(batch)  # retried apply writes v=1 again
    rows = {r["id"]: r["val"] for r in sink.read().collect()}
    assert rows == {1: "a2", 2: "b"}
    assert sink.count() == 2  # no duplicates from the stale partial


def test_sink_schema_widening_requires_merge_schema(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=2)
    sink.overwrite(spark.createDataFrame([(1, "a")], ROW_SCHEMA))
    widened = spark.createDataFrame(
        [(1, "a2", "x", "u", 10, 1)],
        "id bigint, val string, new_col string, __op string, __ts_ms bigint, __seq bigint",
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        sink.apply(widened)


def test_writer_lock_blocks_and_reclaims(spark, tmp_path):
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=2)
    df = spark.createDataFrame([(1, "a")], ROW_SCHEMA)
    sink.overwrite(df)
    lock = os.path.join(sink.path, "_LOCK")
    assert not os.path.exists(lock)  # released after write

    # a held (fresh) lock makes the next writer time out
    with open(lock, "w") as f:
        f.write("held")
    import pytest as _pytest

    batch = flatten_envelope(
        _env_df(spark, [(None, {"id": 2, "val": "b"}, "c", 10, 1)]), key_cols=["id"]
    )
    with _pytest.raises(TimeoutError):
        with sink._writer_lock(timeout_s=0.5):
            pass

    # a STALE lock is reclaimed and the write proceeds
    old = time.time() - 7200
    os.utime(lock, (old, old))
    sink.apply(batch)
    assert sink.count() == 2
    assert not os.path.exists(lock)
