"""Deterministic synthetic change-event log (the binlog/WAL tail).

Replaces the reference's network sources (Scrapy crawls of
realtor/craigslist, redfin GIS endpoint — realdeal/luigi/scrape_*.py)
with a seed-fixed, wall-clock-free, fully *distributed* generator:
every column is derived from ``spark.range`` ids via hash
expressions, so generating 10^10 events is an embarrassingly parallel
scan with no driver-side data and no shuffle.

Event schema (FIXTURES.md A2)::

    lsn:long  op:string  url:string  warc_ts:timestamp
    html:binary  lang:string

Properties by construction:

- ``lsn`` = the range id: dense, strictly increasing, unique — like a
  real binlog offset (an earlier sparse-lsn design made epoch grids
  mostly empty and was reworked after profiling);
- url per event is a hash pick over ``n_urls``, with an optional hot
  url absorbing ``hot_share_percent`` of all events (skew testing,
  SURVEY ST8);
- op is a weighted hash choice (insert/update/delete); the MERGE
  upserts NOT-MATCHED updates, so arbitrary op sequences are valid
  and chains may resurrect after deletes;
- a configurable fraction of events is delivered out of ``warc_ts``
  order relative to ``lsn`` (tests the stale-event guard, SURVEY ST6);
- ``html`` is synthetic but realistic enough for the extractor:
  boilerplate (<nav>/<script>/<footer>) wrapping hash-derived body
  paragraphs; byte-deterministic given (url, lsn); NULL on deletes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "es", "de", "fr", "zh", "pt", "ru", "ja"]

EVENT_SCHEMA = (
    "lsn bigint, op string, url string, warc_ts timestamp_ntz, "
    "html binary, lang string"
)


def _h(seed: int, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of (seed, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_change_events(
    spark: SparkSession,
    n_events: int = 5000,
    n_urls: int = 1000,
    hot_share_percent: int = 0,
    ooo_percent: int = 10,
    insert_percent: int = 25,
    delete_percent: int = 10,
    seed: int = 42,
    html_paragraphs: int = 3,
) -> DataFrame:
    """Build the change log as a DataFrame (lazily; nothing collected).

    ``hot_share_percent`` routes that share of all events to url 0
    (e.g. 50 for the "one url carries ~50% of events" skew test).
    Every column derives from the dense event id, so scaling to 10^10
    events is one ``spark.range`` — no shuffle, no driver data.
    """
    ev = spark.range(n_events).withColumnRenamed("id", "e")

    is_hot = _h(seed, F.col("e"), F.lit("hot")) % 100 < hot_share_percent
    u = F.when(is_hot, F.lit(0)).otherwise(
        _h(seed, F.col("e"), F.lit("url")) % n_urls
    )
    ev = ev.withColumn("u", u)

    lsn = F.col("e").alias("lsn")
    url = F.format_string(
        "https://site%d.example.com/p/%d",
        (_h(seed, F.col("u"), F.lit("site")) % 50).cast("int"),
        F.col("u").cast("int"),
    ).alias("url")
    oproll = _h(seed, F.col("e"), F.lit("op")) % 100
    op = (
        F.when(oproll < insert_percent, F.lit("insert"))
        .when(oproll < insert_percent + delete_percent, F.lit("delete"))
        .otherwise(F.lit("update"))
    ).alias("op")

    # event time: minutes since epoch base, normally increasing with
    # lsn; an ooo_percent fraction gets a large negative offset so its
    # warc_ts precedes events with smaller lsn.
    base_minutes = F.col("e")
    ooo = _h(seed, F.col("e"), F.lit("ooo")) % 100 < ooo_percent
    skew_back = (_h(seed, F.col("e"), F.lit("back")) % (3 * n_urls)) + n_urls
    minutes = F.when(ooo, base_minutes - skew_back).otherwise(base_minutes)
    warc_ts = F.timestamp_seconds(
        F.lit(1704067200) + minutes * 60  # 2024-01-01T00:00:00Z base
    ).cast("timestamp_ntz").alias("warc_ts")

    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (_h(seed, F.col("u"), F.lit("lang")) % len(LANGS) + 1).cast("int"),
    ).alias("lang")

    # deterministic html: boilerplate + md5-derived paragraphs
    paras = [
        F.format_string(
            "<p>%s body words %s content %s</p>",
            F.md5(F.concat_ws("-", F.col("u"), F.col("e"), F.lit(f"p{i}"))),
            F.md5(F.concat_ws("-", F.col("u"), F.col("e"), F.lit(f"q{i}"))),
            F.md5(F.concat_ws("-", F.col("u"), F.lit(f"r{i}"))),
        )
        for i in range(html_paragraphs)
    ]
    html_str = F.concat(
        F.lit(
            "<html><head><title>t</title>"
            "<script>var x=1;</script>"
            "<style>.a{color:red}</style></head>"
            "<body><nav><a href='/'>home</a> <a href='/x'>x</a></nav>"
            "<div class='main'>"
        ),
        *paras,
        F.lit("</div><footer>(c) example corp</footer></body></html>"),
    )
    html = (
        F.when(op == "delete", F.lit(None).cast("binary"))
        .otherwise(F.encode(html_str, "UTF-8"))
        .alias("html")
    )

    return ev.select(lsn, op, url, warc_ts, html, lang)


def naive_replay(rows) -> dict:
    """Pure-Python oracle: sequentially apply events in lsn order with
    out-of-order protection and tombstone semantics; return
    {url: final_row_dict} for *visible* (non-deleted) keys.

    This is the executable spec the MERGE is tested against — the
    same read-modify-write loop the reference runs row-at-a-time over
    Fusion Tables (real_deal_batch_uploader.py:79-104), minus the
    network.  Because every event (including deletes) advances the
    per-key order tuple and tuples are unique, the result is simply
    "the max-(warc_ts, lsn) event per key wins; if it is a delete the
    key is invisible" — the property the SQL oracle relies on.
    """
    state: dict[str, dict] = {}
    for r in sorted(rows, key=lambda r: r["lsn"]):
        key = r["url"]
        cur = state.get(key)
        order = (r["warc_ts"], r["lsn"])
        if cur is not None and order < (cur["warc_ts"], cur["lsn"]):
            continue  # stale
        state[key] = dict(r)  # op kept; delete rows are tombstones
    return {k: v for k, v in state.items() if v["op"] != "delete"}
