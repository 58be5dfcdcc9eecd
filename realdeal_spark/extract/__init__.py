"""Vectorized extraction: html→text, language id, text statistics.

The reference extracts fields from HTML with per-row xpath in Scrapy
spiders (realdeal/scrapy/spiders/realtor_spider.py:42-86,
craigslist_spider.py:70-141).  Here extraction is a single pure
Python function applied over Arrow batches (pandas UDF) — the
`input_hint` forbids per-row Python in the engine, and the per-row
invariant (byte-identical text per url between the UDF and a local
oracle run of the same function) is what the tests pin.
"""

from realdeal_spark.extract.html_text import extract_text, html_to_text_udf, with_text
from realdeal_spark.extract.textstats import (
    detect_lang_expr,
    quality_score_expr,
    token_count_expr,
    fingerprint_expr,
)

__all__ = [
    "extract_text",
    "html_to_text_udf",
    "with_text",
    "detect_lang_expr",
    "quality_score_expr",
    "token_count_expr",
    "fingerprint_expr",
]
