"""ops/mdm.py — golden-record survivorship over match clusters."""

from __future__ import annotations

import pytest

from cdc_connector_spark.ops.mdm import golden_records


def test_golden_records_survivorship(spark):
    df = spark.createDataFrame(
        [
            # cluster {1,2,3}: phone 555 wins 2-1; city ties NY/SF -> NY (smaller)
            (1, "555", "NY"),
            (2, "555", "SF"),
            (3, "777", None),
            # cluster {7,8}: all-NULL phone survives as NULL; city LA
            (7, None, "LA"),
            (8, None, "LA"),
            # singleton 9 (no match pair): its own values
            (9, "123", "TX"),
        ],
        "id bigint, phone string, city string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a bigint, id_b bigint"
    )
    got = {r["cluster_id"]: r for r in golden_records(df, pairs, "id").collect()}
    assert set(got) == {1, 7, 9}
    assert got[1]["n_members"] == 3
    assert got[1]["phone"] == "555"
    assert got[1]["city"] == "NY"
    assert got[7]["n_members"] == 2
    assert got[7]["phone"] is None
    assert got[7]["city"] == "LA"
    assert got[9]["n_members"] == 1 and got[9]["phone"] == "123"


def test_golden_records_field_selection_and_guard(spark):
    df = spark.createDataFrame([(1, "a", "x")], "id bigint, f1 string, f2 string")
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = golden_records(df, pairs, "id", fields=["f1"])
    assert out.columns == ["cluster_id", "n_members", "f1"]
    with pytest.raises(ValueError, match="fields"):
        golden_records(df.select("id"), pairs, "id")
