"""Alert forwarder payload rendering (SURVEY.md M6 delivery parity).

Pure functions producing the exact payload shapes the reference's
forwarders post (alert_forwarder/src/forwarders/slack.rs:166-485,
ses.rs:127-182): Slack Block Kit arrays for new alerts, thread
replies for context details and updates, and the SES HTML email.
Rendering is driver-side string work on the tiny activated-alert set
— the Spark job's output (alert row + context map) is the input here,
so nothing in the hot path changes.

The context formatter mirrors CONTEXT_TO_STR_FMT (slack.rs:47-88,
ses.rs:42-91): per flattened context key, label substitution, value
markup (backticked for Slack, bold-prefixed for SES), and 5/25-value
truncation with a "+N more..." suffix, emitted as nested
short_fmt/long_fmt objects keyed by the dotted path's parts.
"""

from __future__ import annotations

from html import escape
from typing import Any

SLACK_KEY_TO_LABEL = {
    "related.ip": ":mag: IP",
    "related.user": ":bust_in_silhouette: User",
    "related.hosts": ":globe_with_meridians: Host",
    "related.hash": ":hash: Hash",
}

SES_KEY_TO_LABEL = {
    "matano.table": "Log Source",
    "related.ip": "IP",
    "related.user": "User",
    "related.hosts": "Host",
    "related.hash": "Hash",
}


def _flatten(obj: dict, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in obj.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _set_path(obj: dict, parts: list[str], value: Any) -> None:
    for p in parts[:-1]:
        obj = obj.setdefault(p, {})
    obj[parts[-1]] = value


def context_to_strs(context: dict, markup: str = "slack") -> dict:
    """CONTEXT_TO_STR_FMT: context (possibly nested; values are lists)
    → {"short_fmt": nested, "long_fmt": nested} of formatted strings."""
    labels = SLACK_KEY_TO_LABEL if markup == "slack" else SES_KEY_TO_LABEL
    ret: dict = {}
    for k, v in _flatten(context).items():
        label = labels.get(k)
        values = v if isinstance(v, list) else [v]
        prefix = (
            f"*{label or k}:* " if markup == "slack" else f"<b>{label or k}:</b> "
        )
        vals = [
            f"`{x}`" if markup == "slack" else f"{x}" for x in map(str, values)
        ]

        def fmt(limit: int) -> str:
            s = prefix + "  ".join(vals[:limit])
            more = len(vals) - limit
            if more > 0:
                s += f" +{more} more..."
            return s

        parts = k.split(".")
        _set_path(ret.setdefault("long_fmt", {}), parts, fmt(25))
        _set_path(ret.setdefault("short_fmt", {}), parts, fmt(5))
    return ret


def _title_fmt(title: str, severity: str) -> str:
    """slack.rs:181-186 severity-decorated title."""
    if severity == "critical":
        return f"💥 🚨  [{severity.upper()}] {title}"
    if severity == "high":
        return f"🚨  [{severity.upper()}] {title}"
    if severity in ("notice", "info"):
        return f"📢  {title}"
    return title


def _mrkdwn_context(text: str) -> dict:
    return {"type": "context", "elements": [{"type": "mrkdwn", "text": text}]}


def render_slack_new_alert(alert: dict) -> tuple[list, list]:
    """New-alert Slack payload (slack.rs:272-464): returns (blocks for
    the channel message, blocks for the context-details thread reply).

    `alert` carries: id, title, severity, severity_icon_url, tables,
    match_count, created, runbook, false_positives, context (map of
    field → value list)."""
    fmt = context_to_strs(alert.get("context") or {}, markup="slack")
    related = list((fmt.get("short_fmt") or {}).get("related", {}).values())
    context_strs = list(_flatten(fmt.get("long_fmt") or {}).values())

    blocks: list = [
        {
            "type": "header",
            "text": {
                "type": "plain_text",
                "emoji": True,
                "text": _title_fmt(alert["title"], alert.get("severity", "")),
            },
        },
        {
            "type": "context",
            "elements": [
                {
                    "type": "image",
                    "image_url": alert.get("severity_icon_url", ""),
                    "alt_text": alert.get("severity", ""),
                },
                {
                    "type": "mrkdwn",
                    "text": f"Severity: *{alert.get('severity', '')}*",
                },
                {
                    "type": "mrkdwn",
                    "text": f"Match count: *{alert.get('match_count', 0)}*",
                },
                {
                    "type": "mrkdwn",
                    "text": f"Table: *{','.join(alert.get('tables', []))}*",
                },
            ],
        },
        {
            "type": "context",
            "elements": [
                {"type": "mrkdwn", "text": f"*Alert ID:* {alert['id']}"},
                {
                    "type": "mrkdwn",
                    "text": f"*Created:* {alert.get('created', '')}",
                },
            ],
        },
        {
            "type": "section",
            "text": {
                "type": "mrkdwn",
                "text": f"*Runbook:* {alert.get('runbook', '')}",
            },
        },
        {"type": "divider"},
        {"type": "section", "text": {"type": "mrkdwn", "text": "*Context*"}},
    ]
    fps = alert.get("false_positives") or []
    if fps:
        fps_str = "\n• ".join(str(f) for f in fps)
        if len(fps) > 1:
            fps_str = "\n• " + fps_str
        blocks.insert(
            5, _mrkdwn_context(f"*False positives:* {fps_str}")
        )
    if related:
        blocks.append(_mrkdwn_context("\n\n".join(related)))

    thread_blocks = [
        {
            "type": "header",
            "text": {
                "type": "plain_text",
                "emoji": True,
                "text": "ℹ️ Context details for initial rule matches",
            },
        },
        _mrkdwn_context("\n\n".join(context_strs)),
    ]
    return blocks, thread_blocks


def render_slack_alert_update(alert: dict, context_diff: dict) -> list:
    """Updated-alert thread reply (slack.rs:188-260): new-match count
    header plus the changed-context strings from the A5 CDC payload."""
    fmt = context_to_strs(context_diff or {}, markup="slack")
    new_strs = list(_flatten(fmt.get("long_fmt") or {}).values())
    blocks: list = [
        {
            "type": "header",
            "text": {
                "type": "plain_text",
                "emoji": True,
                "text": f"➕ {alert.get('match_count', 0)} new rule matches",
            },
        },
        {"type": "divider"},
    ]
    if new_strs:
        blocks.append(
            {
                "type": "section",
                "text": {"type": "mrkdwn", "text": "*New context*"},
            }
        )
        blocks.append(_mrkdwn_context("\n\n".join(new_strs)))
    else:
        blocks.append(_mrkdwn_context("No new context"))
    return blocks


SES_STYLE = (
    "td{padding:5px;}th{padding:5px;background:#86B4CE;}"
    "h1{color:#1C3149;}h2{color:#1C3149;}"
)


def render_ses_html(alert: dict) -> tuple[str, str]:
    """SES email (ses.rs:127-182): returns (subject, html body). Only
    new alerts email (update_count == 0 gate lives at the caller)."""
    fmt = context_to_strs(alert.get("context") or {}, markup="ses")
    related = list((fmt.get("short_fmt") or {}).get("related", {}).values())
    created = alert.get("created", "")
    tables = ",".join(alert.get("tables", []))
    html = (
        "<!DOCTYPE html><html><head>"
        f"<style>{SES_STYLE}</style></head><body>"
        f"<h1>{escape(alert['title'])}</h1>"
        "<table><thead><tr><th>Created</th><th>Log Source</th></tr></thead>"
        f"<tbody><tr><td>{escape(str(created))}</td><td>{escape(tables)}</td>"
        "</tr></tbody></table>"
        f"<p>{escape(alert.get('runbook', ''))}</p>"
        "<h2><br />Context</h2>"
        f"<p>{' <br />'.join(related)}</p>"
        "</body></html>"
    )
    return alert["title"], html
