"""ops/ivm.py — incremental join-view maintenance vs full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_connector_spark.ops.ivm import changed_keys, join_view_update


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_join_view_parity_over_batches(spark):
    """Three batches of inserts/updates/deletes on both sides (incl. a
    JOIN-KEY change) — the incrementally maintained view must equal the
    full recompute after every batch."""
    orders = {1: (1, 100, "A"), 2: (2, 100, "B"), 3: (3, 200, "C")}
    custs = {100: (100, "alice"), 200: (200, "bob")}

    def df_orders():
        return spark.createDataFrame(
            list(orders.values()), "o_id bigint, cust_id bigint, status string"
        )

    def df_custs():
        return spark.createDataFrame(
            list(custs.values()), "cust_id bigint, name string"
        )

    view = join_view_update(
        None, df_orders(), df_custs(), spark.createDataFrame([], "o_id bigint"),
        spark.createDataFrame([], "cust_id bigint"), ["cust_id"], ["o_id"], ["cust_id"],
    )
    assert _rows(view) == _rows(df_orders().join(df_custs(), "cust_id"))

    batches = [
        # batch 1: new order for bob, update order 1's status
        {"a_up": {4: (4, 200, "D"), 1: (1, 100, "A2")}, "a_del": [], "b_up": {}, "b_del": []},
        # batch 2: order 2 MOVES to cust 200 (join-key change), delete order 3,
        # rename alice
        {"a_up": {2: (2, 200, "B")}, "a_del": [3], "b_up": {100: (100, "alicia")}, "b_del": []},
        # batch 3: delete cust 200 entirely (orphans orders 2 and 4),
        # insert cust 300 + an order for them
        {"a_up": {5: (5, 300, "E")}, "a_del": [], "b_up": {300: (300, "carol")}, "b_del": [200]},
    ]
    for i, b in enumerate(batches):
        touched_a = list(b["a_up"]) + b["a_del"]
        touched_b = list(b["b_up"]) + b["b_del"]
        orders.update(b["a_up"])
        for k in b["a_del"]:
            orders.pop(k, None)
        custs.update(b["b_up"])
        for k in b["b_del"]:
            custs.pop(k, None)
        ca = spark.createDataFrame([(k,) for k in touched_a] or [(None,)], "o_id bigint").filter(
            F.col("o_id").isNotNull()
        )
        cb = spark.createDataFrame([(k,) for k in touched_b] or [(None,)], "cust_id bigint").filter(
            F.col("cust_id").isNotNull()
        )
        view = join_view_update(
            view, df_orders(), df_custs(), ca, cb, ["cust_id"], ["o_id"], ["cust_id"]
        )
        full = df_orders().join(df_custs(), "cust_id")
        assert _rows(view) == _rows(full), f"batch {i}"


def test_changed_keys_includes_deletes(spark):
    delta = spark.createDataFrame(
        [(1, "u"), (2, "d"), (2, "u"), (3, "d")], "o_id bigint, __op string"
    )
    got = sorted(r["o_id"] for r in changed_keys(delta, ["o_id"]).collect())
    assert got == [1, 2, 3]


def test_join_view_update_is_batch_local(spark):
    """The delta joins touch only changed keys: with an empty change set
    the view passes through untouched (and no part1/part2 rows exist)."""
    a = spark.createDataFrame([(1, 10, "x")], "o_id bigint, cust_id bigint, s string")
    b = spark.createDataFrame([(10, "n")], "cust_id bigint, name string")
    empty_a = spark.createDataFrame([], "o_id bigint")
    empty_b = spark.createDataFrame([], "cust_id bigint")
    view = a.join(b, "cust_id")
    out = join_view_update(view, a, b, empty_a, empty_b, ["cust_id"], ["o_id"], ["cust_id"])
    assert _rows(out) == _rows(view)
