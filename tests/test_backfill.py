"""Backfill/repair jobs: quota-bounded enrichment through the same
MERGE operator (the reference's update_* maintenance scripts)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realdeal_spark.cdc.backfill import backfill
from realdeal_spark.extract.html_text import with_text
from realdeal_spark.lake.merge import merge_apply
from realdeal_spark.lake.table import LakeTable

SCHEMA = (
    "url string, warc_ts timestamp_ntz, lsn bigint, html binary, text string"
)
TS = dt.datetime(2024, 1, 1)


def _mk(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        ["url"], ["warc_ts", "lsn"], n_buckets=4, soft_delete=True,
    )
    rows = [
        (i, "insert", f"u{i}", TS + dt.timedelta(seconds=i),
         f"<p>body {i}</p>".encode(), None)
        for i in range(6)
    ]
    src = spark.createDataFrame(
        rows,
        "lsn bigint, op string, url string, warc_ts timestamp_ntz, "
        "html binary, text string",
    )
    merge_apply(t, src, epoch_id="seed")
    return t


def test_backfill_fills_missing_text(spark, tmp_path):
    t = _mk(spark, tmp_path)
    res = backfill(
        t, F.col("text").isNull(), with_text, epoch_id="repair-1"
    )
    assert res.updated == 6
    out = {r["url"]: r for r in t.read().collect()}
    assert all(out[f"u{i}"]["text"] == f"body {i}" for i in range(6))
    # order tuple unchanged: repair must not advance recency
    assert all(out[f"u{i}"]["lsn"] == i for i in range(6))


def test_backfill_budget_and_progress(spark, tmp_path):
    t = _mk(spark, tmp_path)
    r1 = backfill(t, F.col("text").isNull(), with_text, budget=4, epoch_id="r1")
    assert r1.updated == 4
    r2 = backfill(t, F.col("text").isNull(), with_text, budget=4, epoch_id="r2")
    assert r2.updated == 2  # progresses through the backlog
    assert t.read().where(F.col("text").isNull()).count() == 0


def test_backfill_does_not_shadow_later_event(spark, tmp_path):
    t = _mk(spark, tmp_path)
    backfill(t, F.col("text").isNull(), with_text, epoch_id="r1")
    # a genuine newer event for u0 must still win after the repair
    newer = spark.createDataFrame(
        [(100, "update", "u0", TS + dt.timedelta(hours=1),
          b"<p>new body</p>", None)],
        "lsn bigint, op string, url string, warc_ts timestamp_ntz, "
        "html binary, text string",
    )
    merge_apply(t, with_text(newer), epoch_id="e2")
    row = {r["url"]: r for r in t.read().collect()}["u0"]
    assert row["lsn"] == 100 and row["text"] == "new body"
