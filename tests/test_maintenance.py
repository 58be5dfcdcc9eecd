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


# ------------------------------------------------------------- rebucket


def test_rebucket_preserves_state_and_changes_layout(spark, tmp_path):
    from realdeal_spark.cdc.events import generate_change_events, naive_replay

    ev = generate_change_events(
        spark, n_events=400, n_urls=60, ooo_percent=20, delete_percent=10
    )
    t = LakeTable.create(
        spark, str(tmp_path / "rb"),
        "url string, warc_ts timestamp_ntz, lsn bigint, html binary, lang string",
        ["url"], ["warc_ts", "lsn"], n_buckets=4, soft_delete=True,
    )
    CdcApplier(t, merge_mode="mor").run(ev, epoch_size=100)
    before = {r["url"]: r["lsn"] for r in t.read().collect()}
    v_pre = t.current_version()

    t.rebucket(16)
    snap = t.snapshot()
    assert snap.n_buckets == 16
    # layout actually changed and bucket values respect the new modulus
    got_buckets = {
        r["_bucket"] for r in t.read(with_bucket=True).select("_bucket").collect()
    }
    assert max(got_buckets) > 3 and max(got_buckets) < 16
    # state identical, still matches the event-log oracle
    after = {r["url"]: r["lsn"] for r in t.read().collect()}
    assert after == before
    exp = naive_replay([r.asDict() for r in ev.collect()])
    assert set(after) == set(exp)
    # rebucket folds MoR deltas: one base file set, no mor flags
    assert not any(fe.get("mor") for fl in snap.files.values() for fe in fl)
    # time travel to the pre-rebucket version still works (old layout)
    assert {r["url"]: r["lsn"] for r in t.read(version=v_pre).collect()} == before


def test_merge_after_rebucket_lands_in_new_layout(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=2)
    merge_apply(t, _ev(spark, [(1, "insert", "a"), (2, "insert", "b")]))
    t.rebucket(8)
    r = merge_apply(t, _ev(spark, [(3, "update", "a"), (4, "insert", "c")]), mode="mor")
    assert r.updated == 1 and r.inserted == 1
    assert all(0 <= b < 8 for b in r.touched_buckets)
    urls = {row["url"]: row["lsn"] for row in t.read().collect()}
    assert urls == {"a": 3, "b": 2, "c": 4}


# ---------------------------------------------------------- report sink


def test_epoch_report_sink_writes_artifacts(spark, tmp_path):
    import json

    from realdeal_spark.report import EpochReportSink

    t = _mk(spark, tmp_path)
    out = str(tmp_path / "reports")
    a = CdcApplier(t, report_sink=EpochReportSink(out))
    a.run(_ev(spark, [(1, "insert", "a"), (2, "insert", "b")]), epoch_size=10)
    lines = [
        json.loads(l) for l in open(f"{out}/epochs.jsonl").read().splitlines()
    ]
    assert len(lines) == len(a.reports) >= 1
    assert lines[0]["inserted"] == 2
    assert lines[0]["epoch_id"] == a.reports[0].epoch_id
    html_files = [f for f in os.listdir(out) if f.endswith(".html")]
    assert len(html_files) == len(lines)
    page = open(os.path.join(out, html_files[0])).read()
    assert a.reports[0].epoch_id in page and "<table" in page
    # typed cells: counts render with the int formatter
    assert "<td>2</td>" in page
