"""Forwarder payload goldens (M6 parity): the exact Slack Block Kit
and SES HTML payloads the reference's forwarders post, for a new
alert and an updated alert (ref forwarders/slack.rs, ses.rs). Pure
functions — no Spark session needed."""

from __future__ import annotations

from matano_spark.streaming.render import (
    context_to_strs,
    render_ses_html,
    render_slack_alert_update,
    render_slack_new_alert,
)

ALERT = {
    "id": "a-123",
    "title": "Brute force by user",
    "severity": "high",
    "severity_icon_url": "https://icons/high.png",
    "tables": ["okta_system"],
    "match_count": 7,
    "created": "2024-05-01T10:00:00Z",
    "runbook": "Check the user's recent logins.",
    "false_positives": ["VPN egress rotation", "Load tests"],
    "context": {
        "related": {
            "ip": ["10.0.0.1", "10.0.0.2"],
            "user": ["alice"],
        },
        "event.action": ["user.session.start"] * 30,
    },
}


def test_context_formatter_labels_and_truncation():
    fmt = context_to_strs(ALERT["context"], markup="slack")
    short = fmt["short_fmt"]
    # label substitution + backtick markup (slack.rs:47-88)
    assert short["related"]["ip"] == ":mag: IP:* `10.0.0.1`  `10.0.0.2`".join(
        ["*", ""]
    ) or short["related"]["ip"] == "*:mag: IP:* `10.0.0.1`  `10.0.0.2`"
    # 5-value truncation with the +N suffix
    assert short["event"]["action"].endswith(" +25 more...")
    assert short["event"]["action"].count("`user.session.start`") == 5
    # long form truncates at 25
    long = fmt["long_fmt"]
    assert long["event"]["action"].endswith(" +5 more...")
    assert long["event"]["action"].count("`user.session.start`") == 25
    # SES markup variant: bold prefix, unbackticked values
    ses = context_to_strs(ALERT["context"], markup="ses")
    assert ses["short_fmt"]["related"]["user"] == "<b>User:</b> alice"


def test_slack_new_alert_golden():
    blocks, thread = render_slack_new_alert(ALERT)
    # header carries the severity-decorated title (slack.rs:181-186)
    assert blocks[0] == {
        "type": "header",
        "text": {
            "type": "plain_text",
            "emoji": True,
            "text": "🚨  [HIGH] Brute force by user",
        },
    }
    # severity/match/table context strip
    texts = [e.get("text") for e in blocks[1]["elements"]]
    assert "Severity: *high*" in texts
    assert "Match count: *7*" in texts
    assert "Table: *okta_system*" in texts
    # id + created
    assert blocks[2]["elements"][0]["text"] == "*Alert ID:* a-123"
    # runbook section then false positives (inserted at 5), divider,
    # Context header, related strings
    assert blocks[3]["text"]["text"] == "*Runbook:* Check the user's recent logins."
    assert blocks[5]["elements"][0]["text"] == (
        "*False positives:* \n• VPN egress rotation\n• Load tests"
    )
    assert blocks[4] == {"type": "divider"}
    assert blocks[6]["text"]["text"] == "*Context*"
    related_text = blocks[-1]["elements"][0]["text"]
    assert "*:mag: IP:* `10.0.0.1`  `10.0.0.2`" in related_text
    assert "*:bust_in_silhouette: User:* `alice`" in related_text
    # the thread reply carries the full long-format context details
    assert thread[0]["text"]["text"] == "ℹ️ Context details for initial rule matches"
    assert "`user.session.start`" in thread[1]["elements"][0]["text"]


def test_slack_update_golden():
    diff = {"related": {"ip": ["10.9.9.9"]}}
    blocks = render_slack_alert_update(ALERT, diff)
    assert blocks[0]["text"]["text"] == "➕ 7 new rule matches"
    assert blocks[1] == {"type": "divider"}
    assert blocks[2]["text"]["text"] == "*New context*"
    assert blocks[3]["elements"][0]["text"] == "*:mag: IP:* `10.9.9.9`"
    # no changed context → explicit "No new context" marker
    empty = render_slack_alert_update(ALERT, {})
    assert empty[2]["elements"][0]["text"] == "No new context"


def test_ses_html_golden():
    subject, html = render_ses_html(ALERT)
    assert subject == "Brute force by user"
    assert "<style>td{padding:5px;}th{padding:5px;background:#86B4CE;}" in html
    assert "<h1>Brute force by user</h1>" in html
    assert "<th>Created</th><th>Log Source</th>" in html
    assert "<td>2024-05-01T10:00:00Z</td><td>okta_system</td>" in html
    assert "<p>Check the user&#x27;s recent logins.</p>" in html
    assert "<h2><br />Context</h2>" in html
    assert "<b>IP:</b> 10.0.0.1  10.0.0.2" in html
    assert "<b>User:</b> alice" in html


def test_transports_render_through_delivery(monkeypatch):
    """The delivery-module transports route payloads through the
    renderers and POST the rendered bodies."""
    import json as _json

    import matano_spark.streaming.delivery as delivery

    posted: list[tuple[str, dict]] = []
    monkeypatch.setattr(
        delivery, "_post_json", lambda url, body: posted.append((url, body))
    )
    t = delivery.slack_transport("https://hooked", "#alerts")
    t(
        "slack",
        {
            "alert_id": "a-1",
            "rule_name": "r",
            "match_count": 2,
            "update_count": 0,
            "context": {"related": {"ip": ["1.2.3.4"]}},
        },
    )
    assert len(posted) == 2  # channel message + context thread
    blocks = _json.loads(posted[0][1]["blocks"])
    assert blocks[0]["type"] == "header"
    posted.clear()
    e = delivery.ses_transport("https://ses", "a@x", ["b@y"])
    e("email", {"rule_name": "r", "update_count": 1})
    assert posted == []  # update noise gate
    e("email", {"rule_name": "r", "update_count": 0})
    assert posted[0][1]["subject"] == "r"
