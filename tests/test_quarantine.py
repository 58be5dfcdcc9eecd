"""Dead-letter routing: malformed change events (unknown op, null key,
null order) go to a quarantine sink instead of failing the epoch or
silently corrupting state; the valid remainder applies normally and
replay stays exactly-once."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realdeal_spark.cdc.apply import CdcApplier
from realdeal_spark.cdc.quarantine import invalidity_expr, split_quarantine
from realdeal_spark.streaming import StreamingCdcApplier

from tests.test_merge_cdc import _events_df, _mk_table, _ts

EVENT_SCHEMA_Q = (
    "lsn bigint, op string, url string, warc_ts timestamp_ntz, "
    "html binary, lang string"
)


def _mixed_rows(spark):
    rows = [
        (0, "insert", "u1", _ts(0), b"A", "en"),          # valid
        (1, "bogus", "u2", _ts(1), b"B", "en"),           # unknown_op
        (2, None, "u3", _ts(2), b"C", "en"),              # null op
        (3, "insert", None, _ts(3), b"D", "en"),          # null_key:url
        (4, "insert", "u4", None, b"E", "en"),            # null_order:warc_ts
        (5, "update", "u1", _ts(5), b"A2", "en"),         # valid
        (6, "bogus", None, _ts(6), b"F", "en"),           # op wins precedence
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA_Q)


def test_split_reasons_and_precedence(spark):
    df = _mixed_rows(spark)
    good, bad = split_quarantine(df, ["url"], ["warc_ts", "lsn"])
    assert sorted(r["lsn"] for r in good.collect()) == [0, 5]
    reasons = {r["lsn"]: r["_reason"] for r in bad.collect()}
    assert reasons == {
        1: "unknown_op",
        2: "unknown_op",
        3: "null_key:url",
        4: "null_order:warc_ts",
        6: "unknown_op",  # unknown op outranks the null key
    }
    # valid schema untouched, no reason column leaks
    assert good.columns == df.columns


def test_applier_routes_bad_rows_and_applies_good(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "dlq")
    applier = CdcApplier(table, quarantine_dir=qdir)
    rep = applier.apply_epoch(_mixed_rows(spark), 0, 9)
    assert rep.quarantined == 5
    # final state = replay of only the valid rows
    state = {r["url"]: bytes(r["html"]) for r in table.read().collect()}
    assert state == {"u1": b"A2"}
    # quarantine parquet holds exactly the bad rows with reasons
    q = spark.read.parquet(f"{qdir}/lsn_0-9")
    assert sorted(r["lsn"] for r in q.collect()) == [1, 2, 3, 4, 6]
    assert "_reason" in q.columns
    # replay of the committed epoch is a no-op and does not duplicate
    rep2 = applier.apply_epoch(_mixed_rows(spark), 0, 9)
    assert rep2.skipped and rep2.quarantined == 0
    assert spark.read.parquet(f"{qdir}/lsn_0-9").count() == 5


def test_applier_without_quarantine_dir_unchanged(spark, tmp_path):
    """Default behavior (no quarantine_dir) is untouched: valid-only
    logs replay exactly as before."""
    table = _mk_table(spark, tmp_path)
    applier = CdcApplier(table)
    rep = applier.apply_epoch(
        _events_df(spark, [(0, "insert", "u1", 0, "A"), (1, "update", "u1", 1, "B")]),
        0,
        9,
    )
    assert rep.quarantined == 0
    assert {r["url"]: bytes(r["html"]) for r in table.read().collect()} == {
        "u1": b"B"
    }


def test_streaming_applier_quarantines_per_microbatch(spark, tmp_path):
    src = tmp_path / "dlq_src"
    rows0 = [
        (0, "insert", "u1", _ts(0), b"A", "en"),
        (1, "bogus", "u2", _ts(1), b"B", "en"),
    ]
    rows1 = [
        (2, "insert", None, _ts(2), b"C", "en"),
        (3, "update", "u1", _ts(3), b"A2", "en"),
    ]
    for i, rows in enumerate([rows0, rows1]):
        # one file per micro-batch (order-insensitive here, but keeps
        # the two-batch shape deterministic)
        spark.createDataFrame(rows, EVENT_SCHEMA_Q).coalesce(1).write.parquet(
            str(src / f"p{i}")
        )
    table = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "dlq_stream")
    applier = StreamingCdcApplier(table, name="dlq", quarantine_dir=qdir)
    stream = StreamingCdcApplier.file_source(spark, f"{src}/p*", EVENT_SCHEMA_Q)
    q = applier.start(stream, str(tmp_path / "dlq_ckpt"))
    assert q.awaitTermination(300), "availableNow drain did not finish"
    assert sum(r.quarantined for r in applier.reports) == 2
    state = {r["url"]: bytes(r["html"]) for r in table.read().collect()}
    assert state == {"u1": b"A2"}
    dlq = spark.read.parquet(f"{qdir}/*")
    assert sorted(r["lsn"] for r in dlq.collect()) == [1, 2]


def test_invalidity_expr_all_valid_is_null(spark):
    df = _events_df(spark, [(0, "insert", "u1", 0, "A")])
    out = df.select(invalidity_expr(["url"], ["warc_ts", "lsn"]).alias("r"))
    assert out.first()["r"] is None
