"""Lake maintenance (snapshot expiration / orphan GC) and CDC edge
cases (bogus ops, empty epochs)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from realdeal_spark.cdc.apply import CdcApplier
from realdeal_spark.lake.merge import merge_apply
from realdeal_spark.lake.table import LakeTable

SCHEMA = "url string, warc_ts timestamp_ntz, lsn bigint, html binary, lang string"
TS = dt.datetime(2024, 1, 1)


def _mk(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        ["url"], ["warc_ts", "lsn"], n_buckets=n_buckets, soft_delete=True,
    )


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (lsn, op, u, TS + dt.timedelta(seconds=lsn), b"x", "en")
            for (lsn, op, u) in rows
        ],
        "lsn bigint, op string, url string, warc_ts timestamp_ntz, "
        "html binary, lang string",
    )


def _count_parquet(root):
    n = 0
    for dirpath, _dirs, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_expire_snapshots_gc(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for i in range(3):
        merge_apply(t, _ev(spark, [(i, "insert", f"u{i}")]), epoch_id=f"e{i}")
    assert t.current_version() == 4  # create + 3 merges
    before = _count_parquet(str(tmp_path / "t"))
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots_removed"] == 3
    assert stats["files_removed"] > 0
    after = _count_parquet(str(tmp_path / "t"))
    assert after < before
    # latest state fully readable; exactly-once memory intact
    assert {r["url"] for r in t.read().collect()} == {"u0", "u1", "u2"}
    assert "e0" in t.snapshot().applied_epochs
    # expired versions are gone
    with pytest.raises(FileNotFoundError):
        t.snapshot(2)


def test_expire_then_continue_merging(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [(0, "insert", "a")]), epoch_id="e0")
    t.expire_snapshots(keep_last=1)
    merge_apply(t, _ev(spark, [(1, "update", "a"), (2, "insert", "b")]), epoch_id="e1")
    out = {r["url"]: r["lsn"] for r in t.read().collect()}
    assert out == {"a": 1, "b": 2}


def test_bogus_op_treated_as_upsert(spark, tmp_path):
    """Unknown op values behave as upserts (only 'delete' is special)
    — the documented contract; a strict mode would pre-filter."""
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [(0, "frobnicate", "a")]))
    assert {r["url"] for r in t.read().collect()} == {"a"}


def test_empty_epoch_is_cheap_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    a = CdcApplier(t)
    rep = a.apply_epoch(_ev(spark, []), 0, 9)
    assert rep.events_in == 0
    # empty batch: no buckets touched → no snapshot version consumed
    assert rep.snapshot_version is None
