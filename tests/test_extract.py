"""Extraction invariants: byte-identical text between the pandas UDF
and a local run of the same pure function (the per-row invariant);
text-stat expressions sane on fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from realdeal_spark.cdc.events import generate_change_events
from realdeal_spark.extract.html_text import extract_text, with_text
from realdeal_spark.extract.textstats import (
    detect_lang_expr,
    fingerprint_expr,
    quality_score_expr,
    token_count_expr,
)

FIXTURES = {
    "boilerplate_only": b"<html><head><title>x</title></head><body>"
    b"<nav><a href='/'>home</a></nav><footer>foot</footer></body></html>",
    "body_and_nav": b"<html><body><nav>menu</nav><div><p>Hello   world</p>"
    b"<p>Second&nbsp;para &amp; more</p></div></body></html>",
    "scripts_styles": b"<html><head><script>var a=1;</script>"
    b"<style>p{}</style></head><body><p>Visible</p></body></html>",
    "empty_body": b"<html><body></body></html>",
    "non_utf8": "caf\xe9 <p>ol\xe9</p>".encode("latin-1"),
    "nested_script": b"<body><script>if(a<b){x()}</script><p>Keep</p></body>",
}


def test_extract_text_golden():
    assert extract_text(FIXTURES["boilerplate_only"]) == ""
    assert extract_text(FIXTURES["body_and_nav"]) == "Hello world\nSecond\xa0para & more"
    assert extract_text(FIXTURES["scripts_styles"]) == "Visible"
    assert extract_text(FIXTURES["empty_body"]) == ""
    assert extract_text(FIXTURES["nested_script"]) == "Keep"
    assert extract_text(None) is None
    # replacement char for undecodable bytes, never an exception
    assert "caf" in extract_text(FIXTURES["non_utf8"])


def test_udf_matches_pure_function_byte_identical(spark):
    """The per-row invariant (input_hint): UDF output == local oracle."""
    ev = generate_change_events(spark, n_events=300, n_urls=100).where(
        F.col("html").isNotNull()
    )
    got = with_text(ev).select("url", "lsn", "html", "text").collect()
    assert len(got) > 0
    for r in got:
        oracle = extract_text(bytes(r["html"]))
        assert r["text"] == oracle, r["url"]
        assert r["text"].encode() == oracle.encode()


def test_extracted_text_drops_boilerplate(spark):
    ev = generate_change_events(spark, n_events=50, n_urls=10).where(
        F.col("html").isNotNull()
    )
    texts = [r["text"] for r in with_text(ev).select("text").collect()]
    for t in texts:
        assert "var x=1" not in t  # script stripped
        assert "example corp" not in t  # footer stripped
        assert "home" not in t.split("\n")[0][:5]  # nav stripped
        assert "body words" in t  # content kept


def test_textstats_exprs(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house is that it for it", "en"),
            ("el perro y la casa de que un por con los", "es"),
            ("", "und"),
            ("zzz qqq xxx", "und"),
        ],
        "text string, want string",
    )
    out = df.select(
        "want",
        detect_lang_expr("text").alias("lang"),
        token_count_expr("text").alias("tc"),
        quality_score_expr("text").alias("q"),
        fingerprint_expr("text").alias("fp"),
    ).collect()
    for r in out:
        assert r["lang"] == r["want"]
        assert r["q"] is None or 0.0 <= r["q"] <= 1.0
    by_want = {r["want"]: r for r in out}
    assert by_want["und"]["tc"] in (0, 3)
    # fingerprint is stable + distinct across texts
    fps = [r["fp"] for r in out if r["fp"] is not None]
    assert len(set(fps)) == len(fps)


def test_repetition_fractions(spark):
    """Gopher-rule repetition signals against hand-computed values."""
    from realdeal_spark.extract.textstats import (
        dup_line_fraction_expr,
        dup_ngram_fraction_expr,
    )

    rows = [
        (1, "a b c a b c"),          # grams: abc bca cab abc -> 1 dup of 4
        (2, "one two three four"),   # no repetition
        (3, "x\ny\nx\n\n"),          # lines x,y,x -> 1 dup of 3
        (4, "ab"),                   # < n tokens -> 0.0
        (5, ""),                     # empty -> 0.0 both
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["g"], r["l"])
        for r in df.select(
            "doc_id",
            dup_ngram_fraction_expr("text", 3).alias("g"),
            dup_line_fraction_expr("text").alias("l"),
        ).collect()
    }
    assert out[1][0] == 0.25
    assert out[2] == (0.0, 0.0)
    assert abs(out[3][1] - (1 - 2 / 3)) < 1e-6
    assert out[4] == (0.0, 0.0)
    assert out[5] == (0.0, 0.0)
