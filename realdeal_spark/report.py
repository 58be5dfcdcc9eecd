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
    columns = columns or {}
    names = df.columns
    rows = df.limit(limit).collect()
    out = []
    if title:
        out.append(f"<h2>{html.escape(title)}</h2>")
    out.append("<table border='1'><tr>")
    out.extend(f"<th>{html.escape(n)}</th>" for n in names)
    out.append("</tr>")
    for r in rows:
        out.append("<tr>")
        for n in names:
            out.append(f"<td>{_render_cell(r[n], columns.get(n, 'string'))}</td>")
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)
