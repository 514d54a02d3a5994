"""Validation reporting: Slack Block-Kit payload + plain-text summary.

Parity with the reference's SlackNotifier (tests/validation.py:795-935):
summary header with per-status counts, top-N failing tables with their
failed checks, and a "common causes" hint block (validation.py:913-921).
This module only BUILDS payloads — posting is the caller's concern (the
reference posts to ``SLACK_WEBHOOK_URL``; we surface the same env name in
the runner's ``--slack`` flag and print the payload when unset, so no
network dependency exists in tests or this container).
"""

from __future__ import annotations

import json
from typing import Any

COMMON_CAUSES = [
    "connector lag or stopped connector (check freshness first)",
    "snapshot/stream overlap replays (duplicates: distinct-PK < total)",
    "deletes not propagated (orphans in sink)",
    "schema drift: new/renamed columns not applied at sink",
]


def summarize_reports(reports: list[dict[str, Any]]) -> dict[str, Any]:
    """Roll up per-table reports ({table, status, checks:[{name,status,...}]})."""
    counts = {"PASS": 0, "WARN": 0, "FAIL": 0}
    failing = []
    for r in reports:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
        if r["status"] != "PASS":
            failed_checks = [c["name"] for c in r.get("checks", []) if c.get("status") == "FAIL"]
            warned = [c["name"] for c in r.get("checks", []) if c.get("status") == "WARN"]
            failing.append({"table": r["table"], "status": r["status"], "failed": failed_checks, "warned": warned})
    failing.sort(key=lambda x: (x["status"] != "FAIL", x["table"]))
    return {
        "consistent": counts["WARN"] == 0 and counts["FAIL"] == 0,
        "counts": counts,
        "failing": failing,
    }


def build_slack_summary(
    database: str,
    reports: list[dict[str, Any]],
    top_n: int = 10,
    mention: str | None = None,
) -> dict[str, Any]:
    """Block-Kit payload mirroring the reference's layout: header, status
    counts, top-N failing tables, common-causes hints on failure."""
    s = summarize_reports(reports)
    emoji = ":white_check_mark:" if s["consistent"] else ":rotating_light:"
    blocks: list[dict[str, Any]] = [
        {
            "type": "header",
            "text": {"type": "plain_text", "text": f"{emoji} CDC validation — {database}"},
        },
        {
            "type": "section",
            "text": {
                "type": "mrkdwn",
                "text": "*{PASS} pass · {WARN} warn · {FAIL} fail* ({n} tables)".format(
                    n=len(reports), **s["counts"]
                ),
            },
        },
    ]
    if s["failing"]:
        lines = [
            f"• `{f['table']}` *{f['status']}* — failed: {', '.join(f['failed']) or '—'}"
            + (f"; warned: {', '.join(f['warned'])}" if f["warned"] else "")
            for f in s["failing"][:top_n]
        ]
        if len(s["failing"]) > top_n:
            lines.append(f"… and {len(s['failing']) - top_n} more")
        blocks.append({"type": "section", "text": {"type": "mrkdwn", "text": "\n".join(lines)}})
        blocks.append(
            {
                "type": "context",
                "elements": [
                    {"type": "mrkdwn", "text": "*Common causes:* " + "; ".join(COMMON_CAUSES)}
                ],
            }
        )
    if mention and not s["consistent"]:
        blocks.append({"type": "section", "text": {"type": "mrkdwn", "text": mention}})
    return {"blocks": blocks}


def format_text_summary(database: str, reports: list[dict[str, Any]]) -> str:
    """Plain-text fallback (the runner's stdout report)."""
    s = summarize_reports(reports)
    head = "{db}: {PASS} pass / {WARN} warn / {FAIL} fail -> {verdict}".format(
        db=database,
        verdict="CONSISTENT" if s["consistent"] else "INCONSISTENT",
        **s["counts"],
    )
    lines = [head] + [
        f"  {f['table']} [{f['status']}] failed={','.join(f['failed']) or '-'}" for f in s["failing"]
    ]
    return "\n".join(lines)


def to_json(payload: dict[str, Any]) -> str:
    return json.dumps(payload, indent=2, sort_keys=True)
