"""Manifest spill: content-addressed per-bucket manifest files.

Above ``MANIFEST_SPILL_MIN`` total entries a snapshot stores
``manifest_files`` (bucket → _meta/manifests/m-<sha1>.json) instead
of the inline inventory, so a commit's metadata IO is O(touched
buckets) rather than O(table files).  These tests force the threshold
to 0 and prove: round-trip fidelity, manifest reuse for untouched
buckets, mixed inline/spilled histories, GC of expired manifests,
staged (WAP) spill, and that every read path (read / lookup /
changes feed / time travel) is form-agnostic.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import realdeal_spark.lake.table as TBL
from realdeal_spark.lake.merge import merge_apply
from realdeal_spark.lake.table import LakeTable

SCHEMA = "url string, v bigint, ts bigint, lsn bigint"


@pytest.fixture()
def spill_always(monkeypatch):
    monkeypatch.setattr(TBL, "MANIFEST_SPILL_MIN", 0)


def _mk(spark, tmp_path, name, **kw):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        SCHEMA,
        key_columns=["url"],
        order_columns=["ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
        **kw,
    )


def _batch(spark, lo, hi, op="upsert", ts_shift=0):
    return spark.range(lo, hi).select(
        F.format_string("https://x.com/%d", F.col("id")).alias("url"),
        (F.col("id") * 10).alias("v"),
        (F.col("id") + ts_shift).alias("ts"),
        (F.col("id") + ts_shift).alias("lsn"),
        F.lit(op).alias("op"),
    )


def _snap_json(table, version):
    with open(table._snap_path(version)) as f:
        return json.load(f)


def test_spilled_snapshot_roundtrip_and_reads(spark, tmp_path, spill_always):
    t = _mk(spark, tmp_path, "t1")
    merge_apply(t, _batch(spark, 0, 100), mode="mor", epoch_id="e1")
    d = _snap_json(t, t.current_version())
    assert "manifest_files" in d and "files" not in d
    snap = t.snapshot()
    assert sum(len(fl) for fl in snap.files.values()) > 0
    assert snap.bucket_manifests and all(
        os.path.exists(os.path.join(t.root, m))
        for m in snap.bucket_manifests.values()
    )
    assert t.read().count() == 100
    got = t.read().where(F.col("url") == "https://x.com/7").first()
    assert got["v"] == 70


def test_untouched_buckets_reuse_manifests(spark, tmp_path, spill_always):
    """A second epoch touching a key subset must reuse the manifest of
    every bucket it did not write — the O(touched buckets) claim."""
    t = _mk(spark, tmp_path, "t2")
    merge_apply(t, _batch(spark, 0, 400), mode="mor", epoch_id="e1")
    v1 = t.current_version()
    m1 = t.snapshot(v1).bucket_manifests
    # epoch 2: single key -> one bucket touched
    merge_apply(
        t, _batch(spark, 5, 6, ts_shift=10_000), mode="mor", epoch_id="e2"
    )
    v2 = t.current_version()
    m2 = t.snapshot(v2).bucket_manifests
    changed = [b for b in m2 if m1.get(b) != m2[b]]
    unchanged = [b for b in m2 if m1.get(b) == m2[b]]
    assert len(changed) == 1  # exactly the touched bucket re-manifested
    assert unchanged  # the rest share the parent's manifest files


def test_mixed_inline_then_spilled_history(spark, tmp_path, monkeypatch):
    """Inline commits below the threshold, spilled above it: both are
    readable in one history, and time travel crosses the boundary."""
    monkeypatch.setattr(TBL, "MANIFEST_SPILL_MIN", 10**9)  # inline
    t = _mk(spark, tmp_path, "t3")
    merge_apply(t, _batch(spark, 0, 50), mode="mor", epoch_id="e1")
    v_inline = t.current_version()
    assert "files" in _snap_json(t, v_inline)
    monkeypatch.setattr(TBL, "MANIFEST_SPILL_MIN", 0)  # now spill
    merge_apply(
        t, _batch(spark, 0, 50, ts_shift=10_000), mode="mor", epoch_id="e2"
    )
    v_spill = t.current_version()
    assert "manifest_files" in _snap_json(t, v_spill)
    assert t.read(version=v_inline).count() == 50
    assert t.read().agg(F.max("ts")).first()[0] >= 10_000


def test_expire_sweeps_unreferenced_manifests(spark, tmp_path, spill_always):
    t = _mk(spark, tmp_path, "t4")
    merge_apply(t, _batch(spark, 0, 200), mode="mor", epoch_id="e1")
    merge_apply(
        t, _batch(spark, 0, 200, ts_shift=10_000), mode="mor", epoch_id="e2"
    )
    t.compact()
    res = t.expire_snapshots(keep_last=1)
    assert res["manifests_removed"] > 0
    live = set(t.snapshot().bucket_manifests.values())
    mdir = os.path.join(t.root, "_meta", "manifests")
    on_disk = {
        os.path.join("_meta", "manifests", fn)
        for fn in os.listdir(mdir)
        if fn.startswith("m-")
    }
    assert on_disk == live  # exactly the live set survives
    assert t.read().count() == 200


def test_staged_snapshot_spills_and_publishes(spark, tmp_path, spill_always):
    t = _mk(spark, tmp_path, "t5")
    merge_apply(t, _batch(spark, 0, 100), mode="mor", epoch_id="e1")
    extra = _batch(spark, 100, 150).drop("op")
    t.append(extra, stage="audit1")
    staged = t.staged_snapshot("audit1")
    assert staged.bucket_manifests  # staged form spilled too
    assert t.read_staged("audit1").count() == 150
    assert t.read().count() == 100  # invisible until published
    t.publish_staged("audit1")
    assert t.read().count() == 150


def test_lookup_and_changes_feed_on_spilled_table(
    spark, tmp_path, spill_always
):
    t = _mk(spark, tmp_path, "t6", key_blooms=True)
    merge_apply(t, _batch(spark, 0, 100), mode="mor", epoch_id="e1")
    v1 = t.current_version()
    merge_apply(
        t, _batch(spark, 10, 20, ts_shift=10_000), mode="mor", epoch_id="e2"
    )
    rows = t.lookup(["https://x.com/12"]).collect()
    assert len(rows) == 1 and rows[0]["ts"] == 10_012
    ch = t.read_changes(from_version=v1).collect()
    assert {r["url"] for r in ch} == {f"https://x.com/{i}" for i in range(10, 20)}


def test_from_json_rejects_spilled_form(spark, tmp_path, spill_always):
    t = _mk(spark, tmp_path, "t7")
    merge_apply(t, _batch(spark, 0, 20), mode="mor", epoch_id="e1")
    with open(t._snap_path(t.current_version())) as f:
        s = f.read()
    with pytest.raises(ValueError, match="manifest-spilled"):
        TBL.Snapshot.from_json(s)
