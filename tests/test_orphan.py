"""Orphan-file cleanup (lake.inspect.remove_orphan_files): crash
debris is removed, history/stages/sidecars are never touched, and the
age guard protects in-flight writers."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from realdeal_spark.lake import LakeTable, merge_apply, remove_orphan_files

SCHEMA = "k string, ts timestamp_ntz, lsn bigint, v double"


def _mk(spark, tmp_path, **kw):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_columns=["k"], order_columns=["ts", "lsn"],
        n_buckets=4, soft_delete=True, **kw,
    )


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (k, base + dt.timedelta(seconds=lsn), lsn, v, op)
            for (lsn, op, k, v) in rows
        ],
        SCHEMA + ", op string",
    )


def _plant(table, rel, age_s=120.0):
    """Drop a fake uncommitted parquet under the table's data dir."""
    full = os.path.join(table.root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(b"PAR1 not really parquet PAR1")
    old = os.path.getmtime(full) - age_s
    os.utime(full, (old, old))
    return rel


def _snap_rows(table):
    return {
        v: sorted((r["k"], r["lsn"]) for r in table.read(version=v).collect())
        for v in table.versions()
    }


def test_orphans_removed_history_intact(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [
        (1, "insert", "a", 1.0), (2, "insert", "b", 2.0),
    ]))
    merge_apply(t, _ev(spark, [(3, "update", "a", 9.0)]))
    before = _snap_rows(t)
    # crash debris: a loser delta dir and a stray inside a live dir
    live_delta = sorted(os.listdir(os.path.join(t.root, "data")))[0]
    o1 = _plant(t, "data/delta-zombie/pb=0/part-dead.parquet")
    o2 = _plant(t, f"data/{live_delta}/pb=1/part-loser.parquet")

    dry = remove_orphan_files(t, older_than_s=60, dry_run=True)
    assert sorted(dry["orphans"]) == sorted([o1, o2])
    assert dry["removed"] == 0 and dry["bytes"] > 0
    assert os.path.exists(os.path.join(t.root, o1))

    res = remove_orphan_files(t, older_than_s=60)
    assert res["removed"] == 2
    assert not os.path.exists(os.path.join(t.root, o1))
    assert not os.path.exists(os.path.join(t.root, o2))
    # the zombie's emptied dirs collapse
    assert not os.path.exists(os.path.join(t.root, "data/delta-zombie"))
    # every time-travel version still reads identically
    assert _snap_rows(t) == before


def test_age_guard_spares_inflight_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [(1, "insert", "a", 1.0)]))
    fresh = _plant(t, "data/delta-racing/pb=0/part-inflight.parquet", age_s=0.0)
    res = remove_orphan_files(t, older_than_s=3600)
    assert res["orphans"] == [] and res["removed"] == 0
    assert os.path.exists(os.path.join(t.root, fresh))
    # and it IS collected once old enough
    res = remove_orphan_files(t, older_than_s=-1)
    assert res["orphans"] == [fresh]


def test_clean_table_yields_zero_orphans(spark, tmp_path):
    """MoR deltas + compaction churn are all referenced by SOME
    version: nothing is an orphan even with no age guard at all."""
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [(1, "insert", "a", 1.0)]), mode="mor")
    merge_apply(t, _ev(spark, [(2, "update", "a", 2.0)]), mode="mor")
    t.compact()
    res = remove_orphan_files(t, older_than_s=-1)
    assert res == {"orphans": [], "removed": 0, "bytes": 0}
    assert [r["v"] for r in t.read().collect()] == [2.0]


def test_staged_and_bloom_files_are_pinned(spark, tmp_path):
    t = _mk(spark, tmp_path, key_blooms=True)
    merge_apply(t, _ev(spark, [
        (1, "insert", "a", 1.0), (2, "insert", "b", 2.0),
    ]))
    # a staged WAP append is invisible to readers but must be pinned
    t.append(
        _ev(spark, [(5, "insert", "z", 5.0)]).drop("op"), stage="audit"
    )
    res = remove_orphan_files(t, older_than_s=-1)
    assert res["orphans"] == []
    # bloom-pruned lookup still serves
    keys = spark.createDataFrame([("a",)], "k string")
    assert [r["v"] for r in t.lookup(keys).collect()] == [1.0]
    assert t.staged_names() == ["audit"]


# --------------------------------------------- TIMESTAMP AS OF time travel


def test_version_asof_resolution(spark, tmp_path):
    import time as _time

    t = _mk(spark, tmp_path)
    stamps = []
    for i, lsn in enumerate((1, 2, 3)):
        merge_apply(t, _ev(spark, [(lsn, "insert", f"k{lsn}", float(lsn))]))
        stamps.append(t.snapshot().summary["committed_at"])
        _time.sleep(0.05)
    v_create = t.versions()[0]
    # exactly-at and just-after each commit resolve to that commit;
    # just-before resolves to the previous one
    vs = t.versions()[1:]  # the three merge commits
    for v, at in zip(vs, stamps):
        assert t.version_asof(at) == v
        assert t.version_asof(at + 0.01) == v
    assert t.version_asof(stamps[1] - 0.001) == vs[0]
    # far future -> current; before creation -> error
    assert t.version_asof(_time.time() + 3600) == t.current_version()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no snapshot"):
        t.version_asof(0.0)
    # read_asof serves the historical state
    mid = t.read_asof(stamps[1])
    assert sorted(r["k"] for r in mid.collect()) == ["k1", "k2"]


def test_version_asof_mtime_fallback_and_datetime(spark, tmp_path):
    import datetime as dt
    import json, os

    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [(1, "insert", "a", 1.0)]))
    v = t.current_version()
    # simulate a pre-stamp snapshot: strip committed_at from the JSON
    p = t._snap_path(v)
    d = json.loads(open(p).read())
    d["summary"].pop("committed_at")
    os.unlink(p)
    open(p, "w").write(json.dumps(d))
    t._snap_cache.clear() if hasattr(t, "_snap_cache") else None
    at = os.path.getmtime(p)
    assert t.version_asof(at + 1) == v
    # datetime input (naive = UTC)
    assert t.version_asof(dt.datetime.now(dt.timezone.utc)) == v


def test_to_view_sql_composition(spark, tmp_path):
    import time as _time

    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [
        (1, "insert", "a", 1.0), (2, "insert", "b", 2.0),
    ]))
    mid = _time.time()
    merge_apply(t, _ev(spark, [(3, "update", "a", 9.0)]))
    t.to_view("pages")
    got = spark.sql("select k, v from pages order by k").collect()
    assert [(r.k, r.v) for r in got] == [("a", 9.0), ("b", 2.0)]
    # frozen snapshot semantics + time travel via asof
    t.to_view("pages_mid", asof=mid)
    got = spark.sql("select sum(v) as s from pages_mid").first().s
    assert got == 3.0
    # catalyst pushes query filters into the view's pruned plan
    plan = spark.sql(
        "select k from pages where k = 'a'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "Filter" in plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not both"):
        t.to_view("x", version=2, asof=mid)


def test_fresh_empty_dir_spared_by_rmdir_age_gate(spark, tmp_path):
    """An empty delta dir the sweep never emptied itself (an in-flight
    writer's freshly created, not-yet-populated dir) must survive the
    sweep; emptied-by-the-sweep dirs still collapse (the other tests
    prove that)."""
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [(1, "insert", "a", 1.0)]))
    racing = os.path.join(t.root, "data/delta-racing2/pb=0")
    os.makedirs(racing)
    res = remove_orphan_files(t, older_than_s=3600)
    assert res["removed"] == 0
    assert os.path.isdir(racing)  # spared — writer may populate it
