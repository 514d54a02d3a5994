"""Slack Block-Kit payload builder (no network; parity with the reference's
SlackNotifier layout, tests/validation.py:795-935)."""

from cdc_connector_spark.validation.report import (
    build_slack_summary,
    format_text_summary,
    summarize_reports,
)

REPORTS = [
    {"table": "t_ok", "status": "PASS", "checks": [{"name": "rowcount", "status": "PASS"}]},
    {
        "table": "t_bad",
        "status": "FAIL",
        "checks": [
            {"name": "rowcount", "status": "FAIL"},
            {"name": "distinct_pk", "status": "FAIL"},
            {"name": "freshness", "status": "WARN"},
        ],
    },
    {"table": "t_warn", "status": "WARN", "checks": [{"name": "freshness", "status": "WARN"}]},
]


def test_summarize_counts_and_order():
    s = summarize_reports(REPORTS)
    assert not s["consistent"]
    assert s["counts"] == {"PASS": 1, "WARN": 1, "FAIL": 1}
    assert [f["table"] for f in s["failing"]] == ["t_bad", "t_warn"]  # FAIL first


def test_block_kit_payload_shape():
    p = build_slack_summary("trading", REPORTS, mention="<@ops>")
    kinds = [b["type"] for b in p["blocks"]]
    assert kinds[0] == "header" and "context" in kinds  # common-causes block
    flat = str(p)
    assert "t_bad" in flat and "rowcount, distinct_pk" in flat and "<@ops>" in flat


def test_all_pass_payload_is_minimal():
    ok = [{"table": "t", "status": "PASS", "checks": []}]
    p = build_slack_summary("db", ok, mention="<@ops>")
    assert len(p["blocks"]) == 2  # header + counts only; no mention on success
    assert ":white_check_mark:" in str(p)


def test_text_summary():
    txt = format_text_summary("trading", REPORTS)
    assert "INCONSISTENT" in txt and "t_bad [FAIL]" in txt


# --------------------------------------------------------- label_balance


def test_label_balance_hand_checked(spark):
    import math

    from cdc_connector_spark.validation.checks import label_balance

    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "label int"
    )
    out = {r["label"]: r for r in label_balance(df, "label").collect()}
    assert out["1"]["n"] == 3 and out["1"]["share"] == 0.6
    assert out["<NULL>"]["n"] == 1
    # gini = 1 - (0.6^2 + 0.2^2 + 0.2^2) with round-12 terms
    gini = round(1.0 - (round(0.6 * 0.6, 12) + 2 * round(0.2 * 0.2, 12)), 6)
    assert out["1"]["gini"] == gini
    # entropy: H = ln5 - (3ln3 + 0 + 0)/5 ; normalized by ln 3
    h = math.log(5) - (round(3 * math.log(3), 12)) / 5
    assert out["2"]["norm_entropy"] == round(h / math.log(3), 6)


def test_label_balance_single_class_entropy_zero(spark):
    from cdc_connector_spark.validation.checks import label_balance

    df = spark.createDataFrame([("a",), ("a",)], "label string")
    r = label_balance(df, "label").collect()[0]
    assert r["norm_entropy"] == 0.0 and r["gini"] == 0.0 and r["share"] == 1.0


# -------------------------------------------------- population_stability


def test_psi_identical_distributions_near_zero(spark):
    from cdc_connector_spark.validation.drift import population_stability

    df = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    r = population_stability(df, df, "v", lo=0.0, hi=100.0, bins=10).collect()[0]
    assert r["psi"] == 0.0 and r["n_expected"] == r["n_actual"] == 1000


def test_psi_detects_shift_and_smoothing_handles_empty_bins(spark):
    from cdc_connector_spark.validation.drift import population_stability

    e = spark.createDataFrame([(float(i % 50),) for i in range(500)], "v double")
    a = spark.createDataFrame([(50.0 + i % 50,) for i in range(500)], "v double")
    r = population_stability(e, a, "v", lo=0.0, hi=100.0, bins=10).collect()[0]
    # disjoint supports -> massive drift, and every bin is empty on one
    # side (the smoothing keeps ln defined)
    assert r["psi"] > 1.0


def test_psi_outliers_clamp_into_edge_bins(spark):
    from cdc_connector_spark.validation.drift import population_stability

    e = spark.createDataFrame([(5.0,), (-100.0,)], "v double")
    a = spark.createDataFrame([(5.0,), (999.0,)], "v double")
    r = population_stability(e, a, "v", lo=0.0, hi=10.0, bins=2).collect()[0]
    assert r["n_expected"] == 2 and r["n_actual"] == 2
    assert r["psi"] > 0.0
