"""Changelog-apply semantics: W5 latest-per-key + ST2 merge, incl. the
FIXTURES.md F3 event mix (dupes, deletes, snapshot-read overlap)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_connector_spark.changelog.apply import apply_changes, latest_per_key
from cdc_connector_spark.changelog.envelope import (
    apply_casts,
    apply_renames,
    envelope_schema,
    flatten_envelope,
    parse_json_envelope,
)
from pyspark.sql import types as T

ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
    ]
)


def _env_rows():
    # (before, after, op, ts_ms, seq)
    return [
        (None, {"id": 1, "val": "a"}, "c", 1000, 1),
        (None, {"id": 2, "val": "b"}, "c", 1000, 2),
        ({"id": 1, "val": "a"}, {"id": 1, "val": "a2"}, "u", 2000, 3),
        ({"id": 2, "val": "b"}, None, "d", 3000, 4),           # delete
        (None, {"id": 3, "val": "c"}, "c", 3000, 5),
        # exact duplicate of seq 3 (at-least-once replay)
        ({"id": 1, "val": "a"}, {"id": 1, "val": "a2"}, "u", 2000, 3),
        # snapshot-read overlapping an applied key
        (None, {"id": 3, "val": "c"}, "r", 2500, 6),
        # same-ts_ms tie: seq must break the tie
        (None, {"id": 4, "val": "x"}, "c", 5000, 7),
        ({"id": 4, "val": "x"}, {"id": 4, "val": "y"}, "u", 5000, 8),
    ]


def _envelope_df(spark, rows=None):
    schema = envelope_schema(ROW_SCHEMA)
    data = []
    for before, after, op, ts, seq in rows or _env_rows():
        data.append((before, after, op, ts, "testdb", "t", seq))
    return spark.createDataFrame(data, schema)


def test_flatten_envelope_keeps_delete_keys(spark):
    flat = flatten_envelope(_envelope_df(spark), key_cols=["id"])
    assert set(flat.columns) == {"id", "val", "__op", "__ts_ms", "__source_db", "__source_table", "__seq"}
    deletes = flat.filter(F.col("__op") == "d").collect()
    assert len(deletes) == 1 and deletes[0]["id"] == 2  # key from `before`


def test_latest_per_key_ts_then_seq(spark):
    flat = flatten_envelope(_envelope_df(spark), key_cols=["id"])
    latest = latest_per_key(flat, ["id"]).orderBy("id").collect()
    by_id = {r["id"]: r for r in latest}
    assert by_id[1]["val"] == "a2"
    assert by_id[2]["__op"] == "d"
    assert by_id[3]["val"] == "c" and by_id[3]["__ts_ms"] == 3000
    assert by_id[4]["val"] == "y"  # same ts, higher seq wins


def test_latest_per_key_matches_window_form(spark):
    """r15 pin (skew rehearsal): latest_per_key's max_by aggregate returns
    exactly what the historical row_number window returned — randomized,
    including NULL ts values, NULL payloads, and keys whose EVERY row has
    NULL (ts); ties on (ts, seq) are excluded (both forms pick arbitrary
    winners there — documented)."""
    import random

    from pyspark.sql import Window

    rng = random.Random(15)
    rows = []
    for i in range(600):
        k = rng.randrange(40)
        ts = None if rng.random() < 0.1 else rng.randrange(50)
        # keys 37-39: every row NULL ts (the all-NULL group edge)
        if k >= 37:
            ts = None
        val = None if rng.random() < 0.2 else f"v{i}"
        rows.append((k, val, ts, i))  # seq=i unique -> no exact ties
    df = spark.createDataFrame(rows, "id int, val string, __ts_ms long, __seq long")
    got = latest_per_key(df, ["id"])
    w = Window.partitionBy("id").orderBy(F.col("__ts_ms").desc(), F.col("__seq").desc())
    want = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    key = lambda r: (r["id"], r["val"], r["__ts_ms"], r["__seq"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert got.columns == df.columns
    # plan pin: partial max_by (map-side combine) — the hot key collapses
    # BEFORE the exchange, which is the skew-safety property
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, plan[:1500]


def test_apply_changes_bootstrap_and_merge(spark):
    flat = flatten_envelope(_envelope_df(spark), key_cols=["id"])
    state = apply_changes(None, flat, ["id"])
    rows = {r["id"]: r["val"] for r in state.collect()}
    assert rows == {1: "a2", 3: "c", 4: "y"}  # id=2 deleted


def test_apply_changes_idempotent_replay(spark):
    flat = flatten_envelope(_envelope_df(spark), key_cols=["id"])
    state1 = apply_changes(None, flat, ["id"])
    # replay the ENTIRE log on top of the applied state: must be a no-op
    state2 = apply_changes(state1, flat, ["id"])
    assert sorted(map(tuple, state1.collect())) == sorted(map(tuple, state2.collect()))


def test_apply_changes_incremental_batch(spark):
    flat = flatten_envelope(_envelope_df(spark), key_cols=["id"])
    state = apply_changes(None, flat, ["id"])
    batch2 = flatten_envelope(
        _envelope_df(
            spark,
            rows=[
                ({"id": 3, "val": "c"}, None, "d", 6000, 9),
                (None, {"id": 5, "val": "new"}, "c", 6000, 10),
                ({"id": 1, "val": "a2"}, {"id": 1, "val": "a3"}, "u", 7000, 11),
            ],
        ),
        key_cols=["id"],
    )
    state2 = apply_changes(state, batch2, ["id"])
    rows = {r["id"]: r["val"] for r in state2.collect()}
    assert rows == {1: "a3", 4: "y", 5: "new"}


def test_parse_json_envelope(spark):
    raw = spark.createDataFrame(
        [
            ('{"before": null, "after": {"id": 9, "val": "z"}, "op": "c", '
             '"ts_ms": 123, "source_db": "d", "source_table": "t", "seq": 1}',)
        ],
        "value string",
    )
    env = parse_json_envelope(raw, ROW_SCHEMA)
    r = env.collect()[0]
    assert r["after"]["id"] == 9 and r["op"] == "c"


def test_predicate_gated_rename(spark):
    df = spark.createDataFrame([(1, "u1")], "id int, user string")
    hit = apply_renames(df, {"user": "owner_user_id"}, table="T_CARRIER", table_pattern=".*T_CARRIER")
    miss = apply_renames(df, {"user": "owner_user_id"}, table="T_OTHER", table_pattern=".*T_CARRIER")
    assert "owner_user_id" in hit.columns and "user" not in hit.columns
    assert "user" in miss.columns


def test_apply_casts(spark):
    df = spark.createDataFrame([(1, 1, 7)], "id int, damaged int, vents int")
    out = apply_casts(df, {"damaged": "boolean", "vents": "short", "missing": "int"})
    kinds = dict(out.dtypes)
    assert kinds["damaged"] == "boolean" and kinds["vents"] == "smallint"


def test_schema_evolution_additive_column(spark):
    """ST8: a batch with a NEW column widens the sink; old rows get NULL."""
    current = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")
    batch = spark.createDataFrame(
        [(2, "b2", "extra", "u", 100, 1), (3, "c", "x", "c", 100, 2)],
        "id long, val string, note string, __op string, __ts_ms long, __seq long",
    )
    state = apply_changes(current, batch, ["id"])
    rows = {r["id"]: (r["val"], r["note"]) for r in state.collect()}
    assert rows == {1: ("a", None), 2: ("b2", "extra"), 3: ("c", "x")}
