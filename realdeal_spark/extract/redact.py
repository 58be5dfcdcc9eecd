"""PII redaction and URL normalization — webtext curation scalars.

Training-data pipelines scrub obvious PII (emails, IPs, SSN-shaped
ids) and canonicalize URLs before dedup/per-domain accounting.  Both
are pure Catalyst expression chains (regexp_replace / regexp_extract
— JVM-side, whole-stage codegen, zero Python in the hot path), so
they cost one projection over the scan at any scale.

Regex dialect discipline: every pattern here stays inside the common
subset of Java regex (Spark) and RE2 (DuckDB oracle) — no lookaround,
no backreferences *in patterns* — so the oracle queries can run the
same chain verbatim.

Reference analogue: the reference normalizes addresses/cities for use
as keys (process_data_helper.py title_case/strip chains); this is the
same normalize-before-keying idea applied to the web-corpus domain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- PII patterns (RE2-safe) ------------------------------------------
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def redact_pii_expr(col: str | Column) -> Column:
    """Replace emails → ``<EMAIL>``, IPv4 → ``<IP>``, SSN-shaped ids →
    ``<SSN>`` (all occurrences, in that order)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    c = F.regexp_replace(c, SSN_RE, "<SSN>")
    return c


def pii_count_exprs(col: str | Column) -> list[Column]:
    """``n_emails``, ``n_ips``, ``n_ssns`` occurrence counts."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(c, F.lit(SSN_RE)).alias("n_ssns"),
    ]


# ---- URL normalization ------------------------------------------------


def normalize_url_expr(col: str | Column) -> Column:
    """Canonical URL: lowercase scheme+host, drop ``www.``, strip the
    fragment, drop ``utm_*`` tracking params (cleaning dangling
    ``?``/``&``), strip trailing slashes.  Path/query case is
    preserved (semantically significant)."""
    c = F.col(col) if isinstance(col, str) else col
    # fragment first so utm-cleanup never sees it
    c = F.regexp_replace(c, r"#.*", "")
    # lowercase scheme://host only
    head = F.lower(F.regexp_extract(c, r"(?i)^(https?://[^/?]+)", 1))
    tail = F.regexp_replace(c, r"(?i)^https?://[^/?]+", "")
    c = F.concat(head, tail)
    c = F.regexp_replace(c, r"^(https?://)www\.", r"$1")
    # drop utm params: anchored to a ?/& separator so a param merely
    # *containing* "utm_" (?xutm_source=1) is untouched; each match
    # consumes its OWN leading separator so consecutive utm params all
    # fall in one global pass, then the first surviving '&' (if the
    # '?' was consumed) is promoted back to '?'
    c = F.regexp_replace(c, r"[?&]utm_[A-Za-z]+=[^&]*", "")
    c = F.regexp_replace(c, r"^([^?]*)&", r"$1?")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"/+$", "")
    return c


def domain_expr(col: str | Column) -> Column:
    """Registrable-host of a *normalized* URL (port stripped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^https?://([^/:?]+)", 1)
