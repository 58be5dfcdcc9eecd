"""Deterministic html→text boilerplate stripping (trafilatura-style,
dependency-free).

Design constraints (BASELINE.json input_hint):

- **one pure function** ``extract_text(html_bytes) -> str`` is the
  single source of truth: the Spark pandas UDF maps it over Arrow
  batches, and tests run the *same function* locally as the oracle —
  byte-identical output per url is the per-row invariant;
- no wall clock, no randomness, no library whose output could change
  under vectorization (regex + stdlib only — lxml/trafilatura are not
  in this container, and a hand-rolled stripper keeps the
  byte-determinism proof trivial);
- bytes→str decoding is explicit (utf-8, errors="replace"), mirroring
  the encoding pitfalls the reference handles at
  tests/response_utils.py:31-34.

The stripper: drop <script>/<style>/<head>/<nav>/<footer>/<aside>
subtrees and comments, strip all remaining tags, unescape entities,
collapse whitespace.  Block-level boundaries become newlines so
paragraph structure survives.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# subtrees removed wholesale (boilerplate / non-content)
_DROP_SUBTREE = re.compile(
    r"<(script|style|head|nav|footer|aside|noscript|template|svg|iframe)\b[^>]*>"
    r".*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# block-level closers/openers that imply a line break
_BLOCK_BREAK = re.compile(
    r"</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|blockquote|pre)"
    r"[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n\s*\n+")


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str | None:
    """Pure, deterministic main-text extraction. None in → None out."""
    if html_bytes is None:
        return None
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _COMMENT.sub(" ", raw)
    # repeat subtree removal to handle (non-pathological) nesting
    prev = None
    while prev != s:
        prev = s
        s = _DROP_SUBTREE.sub(" ", s)
    s = _BLOCK_BREAK.sub("\n", s)
    s = _ANY_TAG.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RUN.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _NL_RUN.sub("\n", s)
    return s.strip()


@pandas_udf(StringType())
def html_to_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched wrapper over :func:`extract_text`.

    Iterator form so per-executor setup cost (regex compilation is
    module-level anyway) is paid once per partition, not per batch.
    """
    for series in batches:
        yield series.map(extract_text)


def with_text(df: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """Add the extracted ``text`` column — the CdcApplier transform hook."""
    return df.withColumn(out_col, html_to_text_udf(F.col(html_col)))
