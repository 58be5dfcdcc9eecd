"""Schema-evolution reconciler: add / rename / widen inferred from the
event schema, applied pre-MERGE, old files readable throughout."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realdeal_spark.cdc.apply import CdcApplier
from realdeal_spark.cdc.evolve import plan_evolution, reconcile
from realdeal_spark.lake.table import LakeTable

SCHEMA_V1 = "url string, warc_ts timestamp_ntz, lsn bigint, fetch_status int"


def _mk_table(spark, tmp_path):
    return LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA_V1,
        key_columns=["url"],
        order_columns=["warc_ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
    )


def _ev(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


TS = dt.datetime(2024, 1, 1)


def test_plan_add_widen_and_rename(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    events = _ev(
        spark,
        [("u", TS, 1, 200, "insert", "x")],
        "url string, warc_ts timestamp_ntz, lsn bigint, fetch_status bigint,"
        " op string, content_hash string",
    )
    actions = plan_evolution(table, events.schema, renames={"fetch_status": "status"})
    kinds = [(a.kind, a.column) for a in actions]
    # rename first, then the widen applies to the *new* name? no —
    # rename maps fetch_status→status, then event's fetch_status is a
    # fresh add (the CDC stream kept the old name: contradictory hints
    # are the caller's bug, but the plan is still deterministic).
    assert ("rename", "fetch_status") in kinds
    assert ("add", "content_hash") in kinds


def test_auto_evolve_epoch_roundtrip(spark, tmp_path):
    """Epoch 1 under v1; epoch 2 adds a column and widens
    fetch_status int→bigint; rows from epoch 1 read back with typed
    nulls in the new column."""
    table = _mk_table(spark, tmp_path)
    e1 = _ev(
        spark,
        [("a", TS, 0, 200, "insert"), ("b", TS, 1, 404, "insert")],
        "url string, warc_ts timestamp_ntz, lsn bigint, fetch_status int, op string",
    )
    CdcApplier(table, auto_evolve=True).apply_epoch(e1, 0, 1)

    big = 3_000_000_000  # needs bigint
    e2 = _ev(
        spark,
        [
            ("c", TS + dt.timedelta(seconds=5), 2, big, "insert", "h1"),
            ("a", TS + dt.timedelta(seconds=6), 3, 201, "update", "h2"),
        ],
        "url string, warc_ts timestamp_ntz, lsn bigint, fetch_status bigint,"
        " op string, content_hash string",
    )
    CdcApplier(table, auto_evolve=True).apply_epoch(e2, 2, 3)

    out = {r["url"]: r for r in table.read().collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["c"]["fetch_status"] == big
    assert out["a"]["content_hash"] == "h2"
    assert out["b"]["content_hash"] is None  # pre-evolution row
    assert table.schema()["fetch_status"].dataType.simpleString() == "bigint"


def test_reconcile_noop_when_no_drift(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    events = _ev(
        spark,
        [("u", TS, 1, 200, "insert")],
        "url string, warc_ts timestamp_ntz, lsn bigint, fetch_status int, op string",
    )
    v0 = table.current_version()
    assert reconcile(table, events.schema) == []
    assert table.current_version() == v0


def test_narrower_event_type_needs_no_evolution(spark, tmp_path):
    """Event carries int where table has bigint → no DDL; MERGE casts up."""
    table = LakeTable.create(
        spark,
        str(tmp_path / "t2"),
        "url string, warc_ts timestamp_ntz, lsn bigint, fetch_status bigint",
        key_columns=["url"],
        order_columns=["warc_ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
    )
    events = _ev(
        spark,
        [("u", TS, 1, 200, "insert")],
        "url string, warc_ts timestamp_ntz, lsn bigint, fetch_status int, op string",
    )
    assert plan_evolution(table, events.schema) == []
    CdcApplier(table).apply_epoch(events, 0, 1)
    assert table.read().collect()[0]["fetch_status"] == 200
