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
