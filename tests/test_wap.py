"""Write-audit-publish: stage an append outside the version chain,
audit it, publish (rebase-aware) or abort; staged data survives GC
until aborted."""

from __future__ import annotations

import os

import pytest

from realdeal_spark.lake.table import CommitConflict, LakeTable

from tests.test_merge_cdc import _events_df, _mk_table


def _rows(lo, n):
    return [(lo + i, "insert", f"u{lo + i}", lo + i, f"B{lo + i}") for i in range(n)]


def _load(spark, rows):
    return _events_df(spark, rows).drop("op")


def test_stage_is_invisible_until_published(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.append(_load(spark, _rows(0, 10)))
    v_before = t.current_version()

    t.append(_load(spark, _rows(100, 5)), stage="audit1")
    # the table is untouched
    assert t.current_version() == v_before
    assert t.read().count() == 10
    assert t.staged_names() == ["audit1"]
    # the audit view sees base + staged rows
    assert t.read_staged("audit1").count() == 15

    out = t.publish_staged("audit1")
    assert out.version == v_before + 1
    assert out.summary["operation"] == "publish-staged"
    assert t.read().count() == 15
    assert t.staged_names() == []


def test_publish_rebases_over_concurrent_compact(spark, tmp_path):
    """A background compact() between stage and publish commutes: the
    publish rebases onto the compacted snapshot instead of aborting."""
    t = _mk_table(spark, tmp_path)
    t.append(_load(spark, _rows(0, 20)))
    t.append(_load(spark, _rows(20, 20)))  # second file per bucket
    t.append(_load(spark, _rows(200, 8)), stage="big_load")
    compacted = t.compact(max_files_per_bucket=1)
    assert compacted is not None
    out = t.publish_staged("big_load")
    assert out.version == compacted.version + 1
    assert t.read().count() == 48
    # the staged rows are all present post-rebase
    urls = {r["url"] for r in t.read().collect()}
    assert {f"u{200 + i}" for i in range(8)} <= urls


def test_publish_conflicts_on_overlapping_write(spark, tmp_path):
    """A non-commuting concurrent commit (another append overlapping
    the staged buckets) must refuse to publish, not silently merge."""
    t = _mk_table(spark, tmp_path)
    t.append(_load(spark, _rows(0, 10)))
    t.append(_load(spark, _rows(100, 10)), stage="s")
    t.append(_load(spark, _rows(300, 10)))  # hits overlapping buckets
    with pytest.raises(CommitConflict):
        t.publish_staged("s")
    # staged snapshot survives the failed publish for a retry/abort
    assert t.staged_names() == ["s"]


def test_abort_releases_files_to_gc(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.append(_load(spark, _rows(0, 10)))

    t.append(_load(spark, _rows(100, 10)), stage="bad_load")
    # staged files are pinned while the stage is live
    res = t.expire_snapshots(keep_last=1)
    assert res["files_removed"] == 0
    assert t.read_staged("bad_load").count() == 20

    t.abort_staged("bad_load")
    assert t.staged_names() == []
    res = t.expire_snapshots(keep_last=1)
    assert res["files_removed"] > 0  # orphaned staged files swept
    assert t.read().count() == 10  # published state never affected


def test_stage_name_collision_and_validation(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.append(_load(spark, _rows(0, 5)))
    t.append(_load(spark, _rows(10, 5)), stage="x")
    with pytest.raises(CommitConflict, match="already exists"):
        t.append(_load(spark, _rows(20, 5)), stage="x")
    with pytest.raises(ValueError, match="invalid staged name"):
        t.append(_load(spark, _rows(30, 5)), stage="../evil")
    with pytest.raises(KeyError):
        t.staged_snapshot("nope")
    with pytest.raises(KeyError):
        t.abort_staged("nope")


def test_staged_snapshot_reopens_across_handles(spark, tmp_path):
    """Staging is durable metadata: a fresh LakeTable handle sees and
    can publish it (the audit step may run in another process)."""
    t = _mk_table(spark, tmp_path)
    t.append(_load(spark, _rows(0, 5)))
    t.append(_load(spark, _rows(10, 5)), stage="handoff")
    t2 = LakeTable(spark, t.root)
    assert t2.staged_names() == ["handoff"]
    t2.publish_staged("handoff")
    assert t2.read().count() == 10
