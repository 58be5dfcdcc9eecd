"""Text-analysis column expressions: language id, quality scoring,
token counting, document fingerprinting.

All four are pure Catalyst column expressions (JVM-side, whole-stage
codegen, no Python in the hot path) — the scale rule of the engine:
UDFs only where built-ins can't express the semantics (html parsing),
never for arithmetic over strings.  Each function documents the exact
DuckDB-SQL equivalent used by the correctness oracle.

Reference parity: the reference's only text handling is city-name
normalization fallbacks (update_address_data.py:54-69) and numeric
string cleanup (realtor_spider.py:72-83); these generalize that to
the web-page domain per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/stopword
# heuristic.  Deliberately small + frozen: the oracle SQL embeds the
# same lists, so the two engines must agree forever.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tiebreak order


def tokens_expr(col: str | Column) -> Column:
    """Whitespace tokens of trimmed, lowercased text (empty → [])."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.lower(F.trim(c))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_expr(col: str | Column) -> Column:
    """Number of whitespace tokens.

    DuckDB oracle: ``case when trim(text)='' then 0 else
    len(regexp_split_to_array(trim(text), '\\s+')) end``
    """
    return F.size(tokens_expr(col)).cast("int")


def _stop_hits(col: str | Column, lang: str) -> Column:
    toks = tokens_expr(col)
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def detect_lang_expr(col: str | Column) -> Column:
    """Stopword-vote language id over {en,es,de,fr}; 'und' if no hits.

    argmax over per-language stopword hit counts, ties broken by
    LANG_ORDER.  DuckDB oracle: the same chain of
    ``list_filter(regexp_split_to_array(...)...)`` counts compared in
    the same order (see __spark_entry__.oracle_sql).
    """
    hits = {lang: _stop_hits(col, lang) for lang in LANG_ORDER}
    # left-to-right argmax with strict >, so earlier languages win ties
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_ORDER:
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return best


def punct_ratio_expr(col: str | Column) -> Column:
    """share of non-alphanumeric-non-space chars.

    DuckDB oracle: ``(length(text) - length(regexp_replace(text,
    '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1)``
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^a-zA-Z0-9\s]", "")
    return (F.length(c) - F.length(stripped)) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio_expr(col: str | Column, lang: str = "en") -> Column:
    """share of tokens that are (en) stopwords."""
    toks = tokens_expr(col)
    return _stop_hits(col, lang) / F.greatest(F.size(toks), F.lit(1))


def quality_score_expr(col: str | Column) -> Column:
    """Composite quality heuristic in [0,1]:

      0.4 * min(token_count/100, 1)        (enough content)
    + 0.3 * (1 - min(punct_ratio*5, 1))    (not symbol soup)
    + 0.3 * min(stopword_ratio*5, 1)       (natural-language-like)

    Deterministic, engine-portable arithmetic; the DuckDB oracle
    repeats the formula verbatim.
    """
    tc = token_count_expr(col).cast("double")
    pr = punct_ratio_expr(col)
    sr = stopword_ratio_expr(col)
    return F.round(
        0.4 * F.least(tc / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(pr * 5.0, F.lit(1.0)))
        + 0.3 * F.least(sr * 5.0, F.lit(1.0)),
        6,
    )


def fingerprint_expr(col: str | Column) -> Column:
    """64-bit document fingerprint: md5 over whitespace-normalized,
    lowercased text, first 15 hex digits as a bigint.

    md5 is bit-identical across Spark and DuckDB, so the oracle is
    ``('0x' || substr(md5(...), 1, 15))::bigint``.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint")


def dup_ngram_fraction_expr(col: str | Column, n: int = 3) -> Column:
    """Within-document repetition: fraction of token n-grams that are
    duplicates of an earlier n-gram (Gopher-rule family — high values
    flag boilerplate loops, keyword stuffing, decode garbage).

    ``1 - distinct(ngrams)/count(ngrams)`` over the whitespace tokens,
    entirely array expressions (no explode, no shuffle, no UDF);
    rounded to 6dp for cross-engine hashing.  Docs shorter than ``n``
    tokens score 0.0.

    DuckDB oracle: the same arithmetic over
    ``list_transform(generate_series(...), i -> array_to_string(
    toks[i:i+n-1], ' '))`` with ``list_distinct``.
    """
    toks = tokens_expr(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    total = F.size(grams)
    return F.when(F.size(toks) < n, F.lit(0.0)).otherwise(
        F.round(
            1.0 - F.size(F.array_distinct(grams)) / total.cast("double"), 6
        )
    )


def dup_line_fraction_expr(col: str | Column) -> Column:
    """Fraction of non-empty lines that duplicate an earlier line
    (the C4/Gopher duplicate-line rule; scrapes with repeated nav
    blocks score high).  0.0 for texts with <= 1 non-empty line.

    DuckDB oracle: same arithmetic over
    ``list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) <> '')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(
        F.split(c, r"\n"), lambda l: F.trim(l) != F.lit("")
    )
    total = F.size(lines)
    return F.when(total <= 1, F.lit(0.0)).otherwise(
        F.round(
            1.0 - F.size(F.array_distinct(lines)) / total.cast("double"), 6
        )
    )
