"""Property-based: incremental rollup == full recompute for ANY batch split,
and salted join == plain join for any salt factor."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from cdc_connector_spark.ops.rollup import merge_rollup, rollup_delta, rollup_read
from cdc_connector_spark.ops.skew import salted_join

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # hour bucket
        st.sampled_from(["a", "b"]),                  # key
        st.integers(min_value=-5, max_value=5),       # value
        st.sampled_from(["c", "c", "c", "d"]),        # ops, deletes rarer
    ),
    min_size=1,
    max_size=24,
)


def _df(spark, rows):
    data = [
        (i, f"2024-01-01 0{h}:00:00", k, float(v), op)
        for i, (h, k, v, op) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id int, ts string, event_type string, value double, op string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _snapshot(df):
    return sorted(
        (r["window_start"].isoformat(), r["event_type"], r["n_events"], float(r["sum_value"]))
        for r in rollup_read(df).collect()
    )


@settings(max_examples=12, deadline=None)
@given(rows=EVENTS, split=st.integers(min_value=0, max_value=23))
def test_incremental_rollup_equals_full_any_split(spark, rows, split):
    ev = _df(spark, rows)
    cut = min(split, len(rows))
    b1 = ev.filter(F.col("event_id") < cut)
    b2 = ev.filter(F.col("event_id") >= cut)
    inc = merge_rollup(
        merge_rollup(None, rollup_delta(b1, key_cols=["event_type"], op_col="op"), ["event_type"]),
        rollup_delta(b2, key_cols=["event_type"], op_col="op"),
        ["event_type"],
    )
    full = merge_rollup(None, rollup_delta(ev, key_cols=["event_type"], op_col="op"), ["event_type"])
    assert _snapshot(inc) == _snapshot(full)


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=30),
    salt=st.sampled_from([2, 7, 16]),
)
def test_salted_join_property(spark, keys, salt):
    big = spark.createDataFrame([(k, i) for i, k in enumerate(keys)], "k int, payload int")
    small = spark.createDataFrame([(k, f"d{k}") for k in range(3)], "k int, name string")
    plain = sorted((r["k"], r["payload"], r["name"]) for r in big.join(small, "k").collect())
    salted = sorted((r["k"], r["payload"], r["name"]) for r in salted_join(big, small, "k", salt=salt).collect())
    assert plain == salted
