"""Change data feed over the txlog sink: row-level insert/update/delete
records derived from the commit log, diffing only the buckets each commit
touched — the Delta CDF consumer contract."""

import pytest
from pyspark.sql import types as T

from cdc_connector_spark.changelog.envelope import envelope_schema, flatten_envelope
from cdc_connector_spark.changelog.txlog import TxLogMergeSink

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("val", T.StringType())]
)


def _batch(spark, rows):
    data = [(b, a, op, ts, "db", "t", seq) for (b, a, op, ts, seq) in rows]
    return flatten_envelope(
        spark.createDataFrame(data, envelope_schema(ROW_SCHEMA)), key_cols=["id"]
    )


@pytest.fixture
def sink(spark, tmp_path):
    s = TxLogMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=4)
    s.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], ROW_SCHEMA))  # v0
    s.apply(
        _batch(
            spark,
            [
                ({"id": 1, "val": "a"}, {"id": 1, "val": "a2"}, "u", 10, 1),
                ({"id": 2, "val": "b"}, None, "d", 11, 2),
                (None, {"id": 3, "val": "c"}, "c", 12, 3),
            ],
        )
    )  # v1: update 1, delete 2, insert 3
    return s


def _rows(df):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["val"])
        for r in df.collect()
    )


def test_cdf_classifies_insert_update_delete(sink):
    got = _rows(sink.table_changes(1, 1))
    assert got == [
        (1, "delete", 2, "b"),
        (1, "insert", 3, "c"),
        (1, "update_postimage", 1, "a2"),
        (1, "update_preimage", 1, "a"),
    ]


def test_cdf_bootstrap_commit_is_all_inserts(sink):
    got = _rows(sink.table_changes(0, 0))
    assert got == [(0, "insert", 1, "a"), (0, "insert", 2, "b")]


def test_cdf_range_spans_commits_and_matches_replay(spark, sink):
    """Applying the CDF over v0's snapshot reproduces v-latest exactly —
    the consumer-side contract that makes the feed chainable."""
    sink.apply(_batch(spark, [(None, {"id": 4, "val": "d"}, "c", 20, 4)]))  # v2
    feed = sink.table_changes(1, 2)
    assert {r["_commit_version"] for r in feed.collect()} == {1, 2}

    state = {r["id"]: r["val"] for r in sink.read(version=0).collect()}
    for r in sorted(feed.collect(), key=lambda r: r["_commit_version"]):
        if r["_change_type"] == "delete":
            state.pop(r["id"])
        elif r["_change_type"] in ("insert", "update_postimage"):
            state[r["id"]] = r["val"]
    assert state == {r["id"]: r["val"] for r in sink.read().collect()}


def test_cdf_skips_compact_and_unchanged_rows(spark, sink):
    """COMPACT commits emit nothing; a MERGE re-asserting the same value is
    not row churn."""
    for i in range(3):
        sink.apply_delta(
            _batch(spark, [(None, {"id": 10 + i, "val": "x"}, "c", 30 + i, 10 + i)])
        )
    v_before = sink.current_version()
    sink.compact(min_files=1)
    v_compact = sink.current_version()
    assert v_compact > v_before
    assert sink.table_changes(v_compact, v_compact) is None

    # no-op upsert: same value for id 10 → no CDF rows for that key
    sink.apply(
        _batch(spark, [({"id": 10, "val": "x"}, {"id": 10, "val": "x"}, "u", 99, 99)])
    )
    v = sink.current_version()
    out = sink.table_changes(v, v)
    assert out is None or out.count() == 0


def test_cdf_mor_deltas_resolve_before_diff(spark, sink):
    """apply_delta commits diff as logical state (base ⊕ deltas), so the
    feed reports the EFFECTIVE change, not raw delta rows."""
    sink.apply_delta(
        _batch(
            spark,
            [
                ({"id": 1, "val": "a2"}, {"id": 1, "val": "a3"}, "u", 40, 5),
                ({"id": 1, "val": "a3"}, {"id": 1, "val": "a4"}, "u", 41, 6),
            ],
        )
    )
    v = sink.current_version()
    got = _rows(sink.table_changes(v, v))
    assert got == [
        (v, "update_postimage", 1, "a4"),
        (v, "update_preimage", 1, "a2"),
    ]


def test_cdf_range_validation(sink):
    with pytest.raises(ValueError):
        sink.table_changes(0, 99)
    with pytest.raises(ValueError):
        sink.table_changes(2, 1)


def test_cdf_schema_evolution_mid_range(spark, tmp_path):
    """A commit that widens the schema yields CDF rows on the union schema
    with NULLs for the column's pre-history."""
    wide = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("val", T.StringType()),
            T.StructField("extra", T.LongType()),
        ]
    )
    s = TxLogMergeSink(
        spark, str(tmp_path / "t"), ["id"], num_buckets=4, merge_schema=True
    )
    s.overwrite(spark.createDataFrame([(1, "a")], ROW_SCHEMA))
    data = [(None, {"id": 2, "val": "b", "extra": 7}, "c", 10, "db", "t", 1)]
    s.apply(
        flatten_envelope(
            spark.createDataFrame(data, envelope_schema(wide)), key_cols=["id"]
        )
    )
    feed = s.table_changes(0)
    assert set(feed.columns) == {"id", "val", "extra", "_change_type", "_commit_version"}
    rows = {(r["_commit_version"], r["id"]): r for r in feed.collect()}
    assert rows[(0, 1)]["extra"] is None
    assert rows[(1, 2)]["extra"] == 7


def test_cdf_consumer_poll_commit_resume(spark, sink, tmp_path):
    from cdc_connector_spark.changelog.cdf import CdfConsumer

    c = CdfConsumer(sink, str(tmp_path / "cursors"), name="indexer")
    assert c.position() == -1
    changes, upto = c.poll()
    assert upto == 1 and {r["_commit_version"] for r in changes.collect()} == {0, 1}
    c.commit(upto)
    assert c.poll() is None  # caught up

    sink.apply(_batch(spark, [(None, {"id": 4, "val": "d"}, "c", 20, 4)]))  # v2
    changes2, upto2 = c.poll()
    assert upto2 == 2
    assert {r["_commit_version"] for r in changes2.collect()} == {2}

    # crash before commit: a NEW consumer instance (restart) redelivers
    c2 = CdfConsumer(sink, str(tmp_path / "cursors"), name="indexer")
    changes3, upto3 = c2.poll()
    assert upto3 == 2 and changes3.count() == changes2.count()
    c2.commit(upto3)
    assert c2.poll() is None

    with pytest.raises(ValueError):
        c2.commit(0)  # monotonicity guard


def test_cdf_consumer_auto_acks_noop_ranges(spark, sink, tmp_path):
    from cdc_connector_spark.changelog.cdf import CdfConsumer

    c = CdfConsumer(sink, str(tmp_path / "cursors"))
    _, upto = c.poll()
    c.commit(upto)
    sink.compact(min_files=1)  # logical no-op commit
    assert c.poll() is None
    assert c.position() == sink.current_version()  # cursor advanced past it


def test_cdf_independent_consumers(spark, sink, tmp_path):
    from cdc_connector_spark.changelog.cdf import CdfConsumer

    a = CdfConsumer(sink, str(tmp_path / "cursors"), name="a")
    b = CdfConsumer(sink, str(tmp_path / "cursors"), name="b")
    _, upto = a.poll()
    a.commit(upto)
    assert a.poll() is None
    assert b.position() == -1 and b.poll() is not None  # b unaffected


def test_cdf_consumer_process_helper(spark, sink, tmp_path):
    from cdc_connector_spark.changelog.cdf import CdfConsumer

    seen = []
    c = CdfConsumer(sink, str(tmp_path / "cursors"))
    assert c.process(lambda df, v: seen.append((df.count(), v))) == 1
    assert seen == [(6, 1)]  # v0: 2 inserts; v1: ins+del+pre+post
    assert c.process(lambda df, v: seen.append((df.count(), v))) == 0
