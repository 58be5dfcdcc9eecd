"""PII redaction + URL normalization scalars (extract/redact.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realdeal_spark.extract.redact import (
    domain_expr,
    normalize_url_expr,
    pii_count_exprs,
    redact_pii_expr,
)


def _one(spark, s, expr):
    return (
        spark.createDataFrame([(s,)], "s string")
        .select(expr.alias("o"))
        .first()["o"]
    )


def test_redact_pii_cases(spark):
    cases = {
        "mail me at a.b+tag@foo.co.uk now": "mail me at <EMAIL> now",
        "server 192.168.0.1 and 10.0.0.255.": "server <IP> and <IP>.",
        "ssn 123-45-6789 ok": "ssn <SSN> ok",
        "x@y.io or z@w.org": "<EMAIL> or <EMAIL>",
        "no pii here": "no pii here",
        # version strings are not IPs (word boundary + 4 octets)
        "v1.2.3 release": "v1.2.3 release",
    }
    for src, want in cases.items():
        assert _one(spark, src, redact_pii_expr("s")) == want, src


def test_pii_counts(spark):
    row = (
        spark.createDataFrame(
            [("a@b.com c@d.net 1.2.3.4 123-45-6789",)], "s string"
        )
        .select(*pii_count_exprs("s"))
        .first()
    )
    assert (row["n_emails"], row["n_ips"], row["n_ssns"]) == (2, 1, 1)


def test_normalize_url_cases(spark):
    cases = {
        # everything at once
        "HTTPS://WWW.Ex.COM/P/q?utm_source=a&id=1&utm_b=c#f":
            "https://ex.com/P/q?id=1",
        # no changes needed
        "https://ex.com/a?id=2": "https://ex.com/a?id=2",
        # utm-only query → query dropped entirely
        "http://Ex.com/a?utm_x=1": "http://ex.com/a",
        # leading utm, keep the rest; mend '?&'
        "http://ex.com/a?utm_x=1&k=v": "http://ex.com/a?k=v",
        # trailing slashes; host lowercased, path case kept
        "HTTP://A.B/Path/": "http://a.b/Path",
        # www only stripped as a prefix label
        "https://www.wwwish.org/x": "https://wwwish.org/x",
        # a param NAME merely containing 'utm_' is NOT a tracking
        # param — must survive untouched (anchored match)
        "http://ex.com/a?xutm_source=1": "http://ex.com/a?xutm_source=1",
        # consecutive utm params all fall in one pass
        "http://ex.com/a?utm_a=1&utm_b=2&k=v": "http://ex.com/a?k=v",
        "http://ex.com/a?utm_a=1&utm_b=2": "http://ex.com/a",
        "http://ex.com/a?k=v&utm_a=1&utm_b=2": "http://ex.com/a?k=v",
    }
    for src, want in cases.items():
        assert _one(spark, src, normalize_url_expr("s")) == want, src


def test_domain_expr(spark):
    n = normalize_url_expr("s")
    assert _one(spark, "HTTPS://WWW.Foo.ORG:8080/a/b", domain_expr(n)) == "foo.org"
