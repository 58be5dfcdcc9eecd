"""Streaming changes-feed source (streaming/cdf_source): a LakeTable
as a Structured Streaming source — version-tail descriptors with
Spark-checkpointed offsets, expanded per micro-batch through the
distributed read_changes plan; maintained-rollup and maintained-IVF
consumers riding it with exactly-once semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from realdeal_spark.cdc.rollup import Measure, RollupMaintainer, rollup_full
from realdeal_spark.lake.merge import merge_apply
from realdeal_spark.lake.table import LakeTable
from realdeal_spark.streaming.cdf_source import (
    foreach_changes,
    stream_changes,
    stream_maintain_rollup,
)

SCHEMA = "k string, ts timestamp_ntz, lsn bigint, cat string, v double"


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_columns=["k"], order_columns=["ts", "lsn"],
        n_buckets=4, soft_delete=True,
    )


def _ev(spark, rows):
    """rows: (lsn, op, k, sec, cat, v)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (k, base + dt.timedelta(seconds=sec), lsn, cat, v, op)
            for (lsn, op, k, sec, cat, v) in rows
        ],
        SCHEMA + ", op string",
    )


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def _seed(spark, tmp_path):
    """Table with three committed epochs; returns (table, [v1, v2, v3])
    where v1 is the FIRST data commit (create itself commits an empty
    snapshot below it — that empty snapshot is what 'earliest' means)."""
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [
        (1, "insert", "a", 10, "x", 1.0),
        (2, "insert", "b", 11, "x", 2.0),
    ]))
    v1 = t.current_version()
    merge_apply(t, _ev(spark, [
        (3, "insert", "c", 12, "y", 3.0),
        (4, "update", "a", 13, "y", 5.0),
    ]))
    v2 = t.current_version()
    merge_apply(t, _ev(spark, [(5, "delete", "b", 14, None, None)]))
    v3 = t.current_version()
    return t, [v1, v2, v3]


def test_descriptor_stream_tails_from_earliest(spark, tmp_path):
    t, (v1, v2, v3) = _seed(spark, tmp_path)
    v0 = t.versions()[0]  # the empty create snapshot
    seen: list[tuple[int, int, tuple]] = []

    def handler(df, fv, tv):
        rows = sorted(
            (r["k"], r["change_type"]) for r in df.collect()
        )
        seen.append((fv, tv, tuple(rows)))

    q = foreach_changes(
        t, handler, str(tmp_path / "ckpt"), starting_version="earliest"
    )
    _drain(q)
    # one descriptor netting the whole committed interval; the rows the
    # stream hands its consumer ARE the batch feed for that interval
    assert [(fv, tv) for fv, tv, _ in seen] == [(v0, v3)]
    batch = sorted(
        (r["k"], r["change_type"])
        for r in t.read_changes(v0, v3).collect()
    )
    assert seen[0][2] == tuple(batch)
    assert ("a", "upsert") in batch and ("c", "upsert") in batch


def test_max_versions_per_trigger_paces_epochs(spark, tmp_path):
    t, (v1, v2, v3) = _seed(spark, tmp_path)
    seen: list[tuple[int, int]] = []
    q = foreach_changes(
        t,
        lambda df, fv, tv: seen.append((fv, tv)),
        str(tmp_path / "ckpt"),
        starting_version=v1,
        max_versions_per_trigger=1,
    )
    _drain(q)
    assert seen == [(v1, v2), (v2, v3)]


def test_starting_latest_sees_only_new_commits(spark, tmp_path):
    t, (v1, v2, v3) = _seed(spark, tmp_path)
    seen: list[tuple[int, int]] = []
    q = foreach_changes(
        t, lambda df, fv, tv: seen.append((fv, tv)), str(tmp_path / "c1")
    )
    q.processAllAvailable()
    assert seen == []  # nothing committed since stream start
    merge_apply(t, _ev(spark, [(6, "insert", "d", 20, "z", 7.0)]))
    v4 = t.current_version()
    _drain(q)
    assert seen == [(v3, v4)]


def test_restart_resumes_from_checkpoint_no_overlap(spark, tmp_path):
    t, (v1, v2, v3) = _seed(spark, tmp_path)
    v0 = t.versions()[0]
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple[int, int]] = []
    q = foreach_changes(
        t, lambda df, fv, tv: seen.append((fv, tv)), ckpt,
        starting_version="earliest",
    )
    _drain(q)
    assert seen == [(v0, v3)]
    merge_apply(t, _ev(spark, [(7, "insert", "e", 30, "z", 9.0)]))
    v4 = t.current_version()
    q2 = foreach_changes(
        t, lambda df, fv, tv: seen.append((fv, tv)), ckpt,
        starting_version="earliest",  # ignored: checkpoint wins
    )
    _drain(q2)
    assert seen == [(v0, v3), (v3, v4)]


def test_bad_starting_version_rejected(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    q = foreach_changes(
        t, lambda df, fv, tv: None, str(tmp_path / "ckpt"),
        starting_version=999,
    )
    with pytest.raises(Exception, match="not a live snapshot"):
        _drain(q)


MEASURES = [
    Measure("n_rows", "count"),
    Measure("sum_v", "sum", "v"),
    Measure("max_ts", "max", "ts"),
]


def _norm(df):
    return sorted(
        (r["cat"], r["n_rows"], float(r["sum_v"]), r["max_ts"])
        for r in df.collect()
    )


def test_stream_maintained_rollup_matches_full(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    m = RollupMaintainer(
        t, ["cat"], MEASURES, state_dir=str(tmp_path / "state")
    )
    m.refresh()  # bootstrap at v3
    # two more epochs while the consumer is running
    q = stream_maintain_rollup(m, str(tmp_path / "ckpt"))
    merge_apply(t, _ev(spark, [
        (8, "insert", "f", 40, "x", 11.0),
        (9, "update", "c", 41, "x", 13.0),   # cat y -> x
    ]))
    merge_apply(t, _ev(spark, [(10, "delete", "a", 42, None, None)]))
    _drain(q)
    assert m.version == t.current_version()
    assert _norm(m.refresh()) == _norm(
        rollup_full(t, ["cat"], MEASURES)
    )


def test_stream_maintained_rollup_restart_is_idempotent(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    m = RollupMaintainer(
        t, ["cat"], MEASURES, state_dir=str(tmp_path / "state")
    )
    m.refresh()
    ckpt = str(tmp_path / "ckpt")
    q = stream_maintain_rollup(m, ckpt)
    merge_apply(t, _ev(spark, [(11, "insert", "g", 50, "y", 17.0)]))
    _drain(q)
    v_after = t.current_version()
    assert m.version == v_after
    # restart with a FRESH maintainer over the same state dir and the
    # same checkpoint: nothing new to do, state must not regress
    m2 = RollupMaintainer(
        t, ["cat"], MEASURES, state_dir=str(tmp_path / "state")
    )
    q2 = stream_maintain_rollup(m2, ckpt)
    merge_apply(t, _ev(spark, [(12, "insert", "h", 60, "x", 19.0)]))
    _drain(q2)
    assert m2.version == t.current_version()
    assert _norm(m2.refresh()) == _norm(
        rollup_full(t, ["cat"], MEASURES)
    )


def test_refresh_to_version_never_regresses(spark, tmp_path):
    t, (v1, v2, v3) = _seed(spark, tmp_path)
    m = RollupMaintainer(t, ["cat"], MEASURES)
    m.refresh()
    assert m.version == v3
    # a replayed old descriptor must be a no-op, not a rollback
    before = _norm(m.refresh())
    m.refresh(to_version=v2)
    assert m.version == v3
    assert _norm(m.refresh()) == before


def test_descriptor_schema_and_raw_stream(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    df = stream_changes(spark, t.root, starting_version="earliest")
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "from_version", "to_version",
    ]


def test_max_versions_pacing_jumps_expiry_gaps(spark, tmp_path):
    """expire_snapshots can leave version gaps (a tagged old snapshot
    pinned while intermediates drop); the pacer must clamp descriptors
    to RETAINED versions — an interval ending on a dropped version
    would wedge the stream permanently (regression)."""
    t, (v1, v2, v3) = _seed(spark, tmp_path)
    t.set_tag("base", version=v1)
    t.expire_snapshots(keep_last=1)
    vs = t.versions()
    assert v1 in vs and v2 not in vs  # the gap is real
    seen: list[tuple[int, int]] = []
    q = foreach_changes(
        t,
        lambda df, fv, tv: seen.append((fv, tv)),
        str(tmp_path / "ckpt_gap"),
        starting_version=v1,
        max_versions_per_trigger=1,
    )
    _drain(q)
    # one hop across the gap, landing on the retained head
    assert seen == [(v1, v3)]
