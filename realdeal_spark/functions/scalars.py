"""Scalar column functions — the reference's per-row Python helpers
(SURVEY §2.8 F1-F17) as pure Catalyst expressions.

Every function here compiles into whole-stage codegen; none round-trip
through Python.  Reference citations inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def annuity_payment(
    principal: str | Column,
    annual_rate: float = 0.04,
    years: int = 30,
    down_payment: float = 0.2,
) -> Column:
    """Monthly annuity payment on (1-down_payment)*principal.

    Reference F1: realdeal/mortgage.py:10-27 computes
    ``p*r/(1-(1+r)^-n)`` per row in Python (applied one record at a
    time in luigi/update_mortage_data.py:21-24); here it is one
    vectorized expression — the canonical "derived metric" of the
    engine.
    """
    p = F.col(principal) if isinstance(principal, str) else principal
    r = annual_rate / 12.0
    n = years * 12
    financed = p * (1.0 - down_payment)
    return F.round(financed * r / (1.0 - (1.0 + r) ** -n), 6)


def clean_numeric(col: str | Column) -> Column:
    """Strip currency symbols/commas/suffixes and cast to double;
    unparsable → NULL (reference F5/F16: realtor_spider.py:72-83
    strips '$'/',' and try/except-parses; cast-null replaces
    try/except)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, r"[$,]", "")
    cleaned = F.regexp_replace(cleaned, r"\s*(BR|Ba|ft2)\s*$", "")
    return cleaned.cast("double")


def half_bath_fix(col: str | Column) -> Column:
    """realtor '+' suffix → .5 bathrooms (realtor_spider.py:80-81)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.endswith("+"),
        F.regexp_replace(c, r"\+$", "").cast("double") + 0.5,
    ).otherwise(c.cast("double"))


def acres_to_sqft(col: str | Column) -> Column:
    """lot sizes < 100 are acres → sqft (F6: realtor_spider.py:74-79)."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    return F.when(d < 100, (d * 43560).cast("bigint")).otherwise(d.cast("bigint"))


def composite_key(*cols: str | Column, sep: str = ":") -> Column:
    """':'-joined composite key (F7: find_new_properties.py:31-32) —
    kept for sink compatibility; in-engine joins use the columns
    directly."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *cs)


def location_concat(*cols: str | Column) -> Column:
    """', '-joined location string (F8: realtor_spider.py:88)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(", ", *cs)


def epoch_millis_to_date(col: str | Column, fmt: str = "MM/dd/yyyy") -> Column:
    """epoch-millis → formatted date string (F3: redfin_client.py:122-124).

    Computed via days-since-epoch (``date_from_unix_date``), not a
    timestamp render: the result is then independent of the session
    timezone — the same query gives the same bytes on any cluster
    (and matches the UTC-naive DuckDB oracle bit-for-bit)."""
    c = F.col(col) if isinstance(col, str) else col
    days = F.floor(c / F.lit(86400000)).cast("int")
    return F.date_format(F.date_from_unix_date(days), fmt)


def title_case(col: str | Column) -> Column:
    """Python str.title analogue (F4: redfin_client.py:125-128)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(c)


def city_normalize(col: str | Column) -> Column:
    """City-name canonicalization map (F10: update_address_data.py:54-69)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "San José", "San Jose")
        .when(c == "SF", "San Francisco")
        .otherwise(c)
    )


def safe_int_predicate(col: str | Column) -> Column:
    """isInt try/except predicate (F16: craigslist_spider.py:92-104) —
    a null-on-failure cast check."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("bigint").isNotNull()
