"""Write-time CDF capture (merge_apply(capture_changes=True)): the
changes feed served purely from capture files must equal the
reconstruction path row-for-row, cost O(changes) — proven by a
poisoned-read test that deletes every table data file and still reads
the feed — with fallback, GC, and replay edges covered."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from realdeal_spark.lake import LakeTable
from realdeal_spark.lake.merge import merge_apply

SCHEMA = "k string, ts timestamp_ntz, lsn bigint, cat string, v double"


def _mk(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_columns=["k"], order_columns=["ts", "lsn"],
        n_buckets=n_buckets, soft_delete=True,
    )


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (k, base + dt.timedelta(seconds=lsn), lsn, cat, v, op)
            for (lsn, op, k, cat, v) in rows
        ],
        SCHEMA + ", op string",
    )


def _cap(t, ev):
    return merge_apply(t, ev, capture_changes=True)


def _feed(t, a, b, pre=False, use_capture=None):
    df = t.read_changes(a, b, include_preimage=pre, use_capture=use_capture)
    return sorted(
        tuple(None if x is None else x for x in r)
        for r in df.select(
            "k", "ts", "lsn", "cat", "v", "change_type"
        ).collect()
    )


def _chain(spark, tmp_path):
    """Four captured epochs covering every change shape: insert,
    update, delete, resurrect, change-back, insert-then-update,
    delete-of-fresh-insert."""
    t = _mk(spark, tmp_path)
    _cap(t, _ev(spark, [
        (i, "insert", f"k{i}", "x", float(i)) for i in range(1, 13)
    ]))
    v1 = t.current_version()
    _cap(t, _ev(spark, [
        (20, "update", "k1", "y", 100.0),
        (21, "delete", "k2", None, None),
        (22, "insert", "n1", "z", 7.0),        # insert (later updated)
        (23, "insert", "n2", "z", 8.0),        # insert (later deleted)
    ]))
    _cap(t, _ev(spark, [
        (30, "update", "n1", "z", 7.5),        # update of intra-interval insert
        (31, "delete", "n2", None, None),      # delete of intra-interval insert
        (32, "insert", "k2", "x", 2.0),        # resurrect
        (33, "update", "k3", "y", 300.0),
    ]))
    _cap(t, _ev(spark, [
        (40, "update", "k3", "x", 3.0),        # change-back (new lsn)
        (41, "update", "k4", "y", 400.0),
    ]))
    return t, v1


def test_capture_feed_equals_reconstruction(spark, tmp_path):
    t, v1 = _chain(spark, tmp_path)
    vs = t.versions()
    intervals = [(vs[0], vs[-1]), (v1, vs[-1]), (vs[-2], vs[-1]), (v1, vs[-2])]
    for a, b in intervals:
        for pre in (False, True):
            fast = _feed(t, a, b, pre=pre, use_capture=True)
            slow = _feed(t, a, b, pre=pre, use_capture=False)
            assert fast == slow, f"interval ({a},{b}] pre={pre}"


def test_capture_preimage_semantics(spark, tmp_path):
    """Keys inserted inside the interval get no pre-image; deleted
    keys keep theirs; the pre-image is the state at from_version,
    not an intra-interval state."""
    t, v1 = _chain(spark, tmp_path)
    rows = t.read_changes(
        v1, t.current_version(), include_preimage=True, use_capture=True
    ).collect()
    pre = {r["k"]: r for r in rows if r["change_type"] == "update_preimage"}
    assert "n1" not in pre and "n2" not in pre  # born inside the interval
    assert pre["k1"]["v"] == 1.0 and pre["k1"]["cat"] == "x"  # v1 state
    assert pre["k3"]["v"] == 3.0  # v1 state, not the intra-interval 300.0
    post = {r["k"]: r for r in rows if r["change_type"] != "update_preimage"}
    assert post["n2"]["change_type"] == "delete"
    assert post["k2"]["change_type"] == "upsert"  # net: delete + resurrect
    assert post["k3"]["v"] == 3.0 and post["k3"]["lsn"] == 40  # change-back emits


def test_capture_feed_reads_no_table_files(spark, tmp_path):
    """The poisoned read: remove every data file (manifest paths
    break, read() fails) — the capture feed still answers, proving it
    touches ONLY capture files."""
    t, v1 = _chain(spark, tmp_path)
    want = _feed(t, v1, t.current_version(), pre=True, use_capture=True)
    snap = t.snapshot()
    for fl in snap.files.values():
        for fe in fl:
            os.unlink(os.path.join(t.root, fe["path"]))
    with pytest.raises(Exception):
        t.read().collect()
    assert _feed(t, v1, t.current_version(), pre=True, use_capture=True) == want


def test_uncaptured_version_falls_back_or_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _cap(t, _ev(spark, [(1, "insert", "a", "x", 1.0)]))
    v1 = t.current_version()
    merge_apply(t, _ev(spark, [(2, "update", "a", "y", 2.0)]))  # no capture
    _cap(t, _ev(spark, [(3, "insert", "b", "x", 3.0)]))
    v3 = t.current_version()
    with pytest.raises(ValueError, match="use_capture=True"):
        t.read_changes(v1, v3, use_capture=True).collect()
    # auto silently reconstructs and stays correct
    assert _feed(t, v1, v3) == _feed(t, v1, v3, use_capture=False)
    rows = dict(
        (r["k"], r["cat"])
        for r in t.read_changes(v1, v3).collect()
    )
    assert rows == {"a": "y", "b": "x"}


def test_capture_survives_schema_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _cap(t, _ev(spark, [(1, "insert", "a", "x", 1.0),
                        (2, "insert", "b", "x", 2.0)]))
    v1 = t.current_version()
    t.add_column("score", "double")
    ev = _ev(spark, [(5, "update", "a", "y", 5.0)]).withColumn(
        "score", F.lit(0.5)
    )
    merge_apply(t, ev, capture_changes=True)
    v_end = t.current_version()
    caps = t._capture_chain(v1, v_end)
    assert caps is None  # the schema commit itself carries no capture
    # but the sub-interval after evolution is captured, old files align
    rows = t.read_changes(v1 + 1, v_end, include_preimage=True,
                          use_capture=True).collect()
    got = {(r["k"], r["change_type"]): r for r in rows}
    assert got[("a", "upsert")]["score"] == 0.5
    assert got[("a", "update_preimage")]["score"] is None  # pre-evolution row


def test_capture_files_gc_with_their_snapshot(spark, tmp_path):
    t, v1 = _chain(spark, tmp_path)

    def cap_paths(version):
        c = t.snapshot(version).summary.get("cdf") or {}
        return [fe["path"] for kind in ("pre", "chg") for fe in c.get(kind, [])]

    vs = t.versions()
    old_caps = cap_paths(vs[1])
    new_caps = cap_paths(vs[-1])
    assert old_caps and new_caps
    t.expire_snapshots(keep_last=1)
    for p in old_caps:
        assert not os.path.exists(os.path.join(t.root, p)), p
    for p in new_caps:
        assert os.path.exists(os.path.join(t.root, p)), p


def test_captured_rollup_advance_without_table_read(spark, tmp_path):
    """The consumer story end-to-end: a maintained rollup advanced
    over a captured interval is correct even after the table's data
    files are poisoned — advance cost is O(changes), full stop."""
    from realdeal_spark.cdc.rollup import Measure, rollup_advance, rollup_full

    t, v1 = _chain(spark, tmp_path)
    measures = [Measure("n", "count"), Measure("sv", "sum", "v")]
    state1 = rollup_full(t, ["cat"], measures, version=v1).localCheckpoint()
    want = sorted(
        (r["cat"], r["n"], float(r["sv"]))
        for r in rollup_full(t, ["cat"], measures).collect()
    )
    snap = t.snapshot()
    for fl in snap.files.values():
        for fe in fl:
            os.unlink(os.path.join(t.root, fe["path"]))
    adv = rollup_advance(
        t, state1, v1, t.current_version(), ["cat"], measures
    )
    got = sorted((r["cat"], r["n"], float(r["sv"])) for r in adv.collect())
    assert got == want
