"""Driver-side HTML report rendering (SURVEY §2.1 S12).

The reference renders the day's top deals as a typed HTML table and
emails it (realdeal/luigi/email_deals.py:48-91 render, :106-126 send;
realdeal/email_message.py:9-16).  The engine keeps only the render:
``df.limit(n)`` collected driver-side and formatted per a column-type
table — the sending transport is environment-specific and out of the
engine core.  This is deliberately NOT a distributed operator: a
report is small by definition; anything large goes through the real
sinks (sources.io).
"""

from __future__ import annotations

import html
from typing import Literal

from pyspark.sql import DataFrame

CellType = Literal["string", "int", "float", "dollar", "link"]


def _render_cell(value, ctype: CellType) -> str:
    if value is None:
        return ""
    if ctype == "int":
        return f"{int(value):,}"
    if ctype == "float":
        return f"{float(value):,.2f}"
    if ctype == "dollar":
        # locale.currency analogue (email_deals.py:74-78) without
        # locale state: fixed en_US formatting
        return f"${float(value):,.2f}"
    if ctype == "link":
        u = html.escape(str(value), quote=True)
        return f'<a href="{u}">{u}</a>'
    return html.escape(str(value))


def render_html_table(
    rows: list[dict],
    names: list[str],
    columns: dict[str, CellType] | None = None,
    title: str | None = None,
) -> str:
    """Render plain dict rows as a typed HTML table (driver-side)."""
    columns = columns or {}
    out = []
    if title:
        out.append(f"<h2>{html.escape(title)}</h2>")
    out.append("<table border='1'><tr>")
    out.extend(f"<th>{html.escape(n)}</th>" for n in names)
    out.append("</tr>")
    for r in rows:
        out.append("<tr>")
        for n in names:
            out.append(f"<td>{_render_cell(r.get(n), columns.get(n, 'string'))}</td>")
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def render_html_report(
    df: DataFrame,
    columns: dict[str, CellType] | None = None,
    limit: int = 50,
    title: str | None = None,
) -> str:
    """Render the first ``limit`` rows as a typed HTML table.

    ``columns`` maps column name → cell type (the reference's
    field-type table, email_deals.py:27-37); unspecified columns
    render as escaped strings.
    """
    names = df.columns
    rows = [r.asDict() for r in df.limit(limit).collect()]
    return render_html_table(rows, names, columns, title)


class EpochReportSink:
    """Per-epoch report artifact sink — completes S12.

    The reference renders the day's deals as a typed HTML table and
    *sends* it (email_deals.py:48-91 render, :106-126 SMTP send); the
    transport is environment-specific, so the engine's analogue is a
    durable artifact per epoch next to the lineage: an append-only
    ``epochs.jsonl`` (machine-readable; one line per epoch) plus one
    rendered ``epoch-<id>.html`` table (human-readable, same typed
    cell renderer as the reference's email body).  A notifier tails
    the directory — the send stays out of the engine core.

    Pass as ``CdcApplier(report_sink=...)``; called once per epoch
    with the EpochReport (skipped-epoch replays included, flagged).
    """

    _COLUMNS: dict[str, CellType] = {
        "events_in": "int",
        "conflated": "int",
        "inserted": "int",
        "updated": "int",
        "deleted": "int",
        "unchanged": "int",
        "stale": "int",
        "wall_ms": "float",
        "events_per_sec": "float",
    }
    _FIELDS = [
        "epoch_id", "lsn_start", "lsn_end", "snapshot_version", "events_in",
        "conflated", "inserted", "updated", "deleted", "unchanged", "stale",
        "wall_ms", "events_per_sec", "skipped",
    ]

    def __init__(self, out_dir: str, title: str = "CDC epoch report"):
        import os

        self.out_dir = out_dir
        self.title = title
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, report) -> None:
        import json
        import os
        from dataclasses import asdict

        d = asdict(report)
        d["events_per_sec"] = round(report.events_per_sec, 1)
        with open(os.path.join(self.out_dir, "epochs.jsonl"), "a") as f:
            f.write(json.dumps(d, sort_keys=True) + "\n")
        page = render_html_table(
            [d], self._FIELDS, self._COLUMNS,
            title=f"{self.title} — {report.epoch_id}",
        )
        safe_id = report.epoch_id.replace(":", "_").replace("/", "_")
        with open(os.path.join(self.out_dir, f"epoch-{safe_id}.html"), "w") as f:
            f.write(page)
