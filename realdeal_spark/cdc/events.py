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

- ``lsn`` = an affine permutation of the range id: dense on [0, n),
  unique — like a real binlog offset (an earlier sparse-lsn design
  made epoch grids mostly empty and was reworked after profiling);
  permuted rather than identity so a contiguous lsn window (an
  applier epoch) spans all input partitions instead of one (see
  ``generate_change_events``);
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


def _scatter_multiplier(n: int) -> int:
    """Multiplier a with gcd(a, n) = 1 such that ``lsn = (a·r + b)
    mod n`` permutes [0, n) AND the *preimages* of any contiguous lsn
    window are low-discrepancy across r-space.  The preimage of
    lsn = e is r = a⁻¹·(e − b) mod n, i.e. consecutive lsn values
    step r by a⁻¹ — so the quantity that must avoid small-rational
    ratios to n is the INVERSE, not a.  We therefore pick
    a⁻¹ ≈ φ·n (golden-ratio stride, the Fibonacci-hashing argument:
    φ is the irrational hardest to approximate by rationals, so the
    stride never bands) and return its modular inverse.

    int64 bound: a < n, so a·r < n² — exact for n ≤ 3·10^9 events
    per generator call.  A 10^10-event log is generated as a union of
    lsn-range shards of ≤ 3·10^9 each (each shard independently
    scattered), which preserves both the schema and the epoch-spread
    property."""
    import math

    if n <= 2:
        return 1
    inv = int(n * 0.6180339887498949) | 1  # odd
    while math.gcd(inv, n) != 1:
        inv += 2
    return pow(inv, -1, n)


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

    Physical layout: ``lsn`` is a fixed affine *permutation* of the
    range index (``(a·r + b) mod n``, ``gcd(a, n) = 1`` so it is a
    bijection on [0, n)), NOT the index itself.  With ``lsn = id``,
    range partitions are contiguous lsn blocks, so an applier epoch
    (a contiguous lsn window) falls entirely inside ONE partition and
    every per-epoch map stage runs on a single core — profiled round
    5: an 8-epoch run showed local[4] == local[1] wall (scaling
    efficiency 0.25) purely from this layout artifact.  Scattering
    lsn across partitions models how a real epoch's rows land spread
    over Kafka partitions / log segments.  The *data* is unchanged:
    every column is a function of the lsn value, so the generated
    relation (as a set) is identical for any partition count — only
    physical placement moves.  The row for a given lsn differs from
    the pre-scatter generator's, which is fine: every consumer
    derives its expectation from the generated rows themselves.
    """
    ev = spark.range(n_events).select(
        ((F.col("id") * _scatter_multiplier(n_events) + 17) % n_events)
        .alias("e")
    )

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
