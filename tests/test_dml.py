"""Predicate DML (lake/dml): DELETE WHERE / UPDATE WHERE expressed as
self-sourced MERGE batches must inherit the CDC path's guarantees —
bucket pruning, order protection, exactly-once, changes-feed
visibility — and interact correctly with replayed CDC events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from realdeal_spark.lake import (
    LakeTable,
    delete_where,
    merge_apply,
    update_where,
)

SCHEMA = "url string, ts timestamp_ntz, lsn bigint, lang string, v double"


def _mk(spark, tmp_path, name="t", n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA,
        key_columns=["url"], order_columns=["ts", "lsn"],
        n_buckets=n_buckets, soft_delete=True,
    )


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (u, base + dt.timedelta(seconds=lsn), lsn, lang, v, op)
            for (lsn, op, u, lang, v) in rows
        ],
        SCHEMA + ", op string",
    )


def _seed(spark, tmp_path, **kw):
    t = _mk(spark, tmp_path, **kw)
    merge_apply(t, _ev(spark, [
        (i, "insert", f"u{i}", ["de", "en", "fr"][i % 3], float(i))
        for i in range(1, 21)
    ]), epoch_id="seed")
    return t


def _state(t, version=None):
    return {
        r["url"]: (r["lang"], r["v"])
        for r in t.read(version=version).collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_matches_filter(spark, tmp_path, mode):
    t = _seed(spark, tmp_path, name=f"d_{mode}")
    res = delete_where(t, F.col("lang") == "de", epoch_id="purge", mode=mode)
    assert res.snapshot is not None
    st = _state(t)
    assert st and all(lang != "de" for lang, _ in st.values())
    assert set(st) == {f"u{i}" for i in range(1, 21) if i % 3 != 0}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_where_sql_and_column_exprs(spark, tmp_path, mode):
    t = _seed(spark, tmp_path, name=f"u_{mode}")
    update_where(
        t, "lang = 'en'", {"v": F.col("v") * 10, "lang": "upper(lang)"},
        epoch_id="fix", mode=mode,
    )
    st = _state(t)
    for i in range(1, 21):
        if i % 3 == 1:  # 'en' rows
            assert st[f"u{i}"] == ("EN", i * 10.0)
        else:
            assert st[f"u{i}"][1] == float(i)


def test_exactly_once_and_no_match(spark, tmp_path):
    t = _seed(spark, tmp_path)
    v0 = t.current_version()
    delete_where(t, "v >= 18", epoch_id="trim")
    v1 = t.current_version()
    assert v1 == v0 + 1
    # retried statement with the same id: no-op, no new snapshot
    delete_where(t, "v >= 0", epoch_id="trim")
    assert t.current_version() == v1
    assert len(_state(t)) == 17
    # a statement matching nothing commits nothing
    res = delete_where(t, "v > 1e9", epoch_id="noop")
    assert res.snapshot is None
    assert t.current_version() == v1


def test_default_order_interacts_with_cdc_replay(spark, tmp_path):
    """Default stamping places the DML one tick after the matched row:
    an exact replay of the event that created the row loses to the
    tombstone, while a genuinely later CDC event still supersedes."""
    t = _seed(spark, tmp_path)
    delete_where(t, "url = 'u5'", epoch_id="del5")
    assert "u5" not in _state(t)
    # later event for the same key supersedes the tombstone
    merge_apply(t, _ev(spark, [(100, "insert", "u5", "it", 55.0)]),
                epoch_id="later")
    assert _state(t)["u5"] == ("it", 55.0)
    # exact replay of the ORIGINAL insert does NOT revive a defaulted
    # delete (lsn=7 < tombstone's lsn=8)
    delete_where(t, "url = 'u7'", epoch_id="del7")
    merge_apply(t, _ev(spark, [(7, "insert", "u7", "de", 7.0)]),
                epoch_id="replay7")
    assert "u7" not in _state(t)
    # the tie escape hatch (order_stamp={}) keeps the row's own tuple
    # on CoW, where ties win on apply — and replay then revives
    delete_where(t, "url = 'u9'", epoch_id="del9", order_stamp={})
    assert "u9" not in _state(t)
    merge_apply(t, _ev(spark, [(9, "insert", "u9", "fr", 9.0)]),
                epoch_id="replay9")
    assert _state(t)["u9"] == ("fr", 9.0)


def test_order_stamp_survives_full_replay(spark, tmp_path):
    """GDPR-style erasure: stamping the tombstones after every
    existing log position makes a FULL log replay converge back to
    the erased state."""
    t = _seed(spark, tmp_path)
    hi = dt.datetime(2030, 1, 1)
    delete_where(
        t, "lang = 'fr'", epoch_id="erase",
        order_stamp={"ts": hi, "lsn": 10**9},
    )
    erased = _state(t)
    assert all(lang != "fr" for lang, _ in erased.values())
    # replay the whole original log under a new epoch id
    merge_apply(t, _ev(spark, [
        (i, "insert", f"u{i}", ["de", "en", "fr"][i % 3], float(i))
        for i in range(1, 21)
    ]), epoch_id="full-replay")
    assert _state(t) == erased


def test_update_where_validation(spark, tmp_path):
    t = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="key columns"):
        update_where(t, "v > 0", {"url": "upper(url)"})
    with pytest.raises(ValueError, match="order columns"):
        update_where(t, "v > 0", {"lsn": "lsn + 1"})
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(t, "v > 0", {"nope": "1"})
    with pytest.raises(ValueError, match="order columns"):
        delete_where(t, "v > 0", order_stamp={"v": 1.0})


def test_dml_rides_changes_feed(spark, tmp_path):
    """Downstream CDF consumers see predicate DML as ordinary change
    rows — deletes as deletes, updates as upserts."""
    t = _seed(spark, tmp_path)
    v0 = t.current_version()
    update_where(t, "url = 'u1'", {"v": F.lit(111.0)}, epoch_id="e1")
    delete_where(t, "url = 'u2'", epoch_id="e2")
    ch = {
        r["url"]: (r["change_type"], r["v"])
        for r in t.read_changes(v0).collect()
    }
    assert ch == {"u1": ("upsert", 111.0), "u2": ("delete", None)} or (
        ch["u1"] == ("upsert", 111.0) and ch["u2"][0] == "delete"
    )


def test_bucket_pruning_one_key_touches_one_bucket(spark, tmp_path):
    """A DML matching keys of a single bucket rewrites only that
    bucket's files (the O(matched buckets) claim)."""
    t = _seed(spark, tmp_path, name="prune", n_buckets=8)
    snap0 = t.snapshot()
    before = {b: [fe["path"] for fe in fl] for b, fl in snap0.files.items()}
    delete_where(t, "url = 'u3'", epoch_id="one")
    snap1 = t.snapshot()
    changed = [
        b for b, fl in snap1.files.items()
        if [fe["path"] for fe in fl] != before.get(b, [])
    ]
    assert len(changed) == 1
