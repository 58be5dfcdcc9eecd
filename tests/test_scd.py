"""SCD2 history reconstruction (lake.scd.history_rows) and
point-in-time enrichment (enrich_asof): validity intervals match the
commit clock, and enrichment equals a per-timestamp read_asof lookup."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from realdeal_spark.lake import LakeTable, merge_apply
from realdeal_spark.lake.scd import enrich_asof, history_rows

SCHEMA = "k string, ts timestamp_ntz, lsn bigint, v double"


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_columns=["k"], order_columns=["ts", "lsn"],
        n_buckets=4, soft_delete=True,
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


@pytest.fixture()
def table3(spark, tmp_path):
    """Three epochs: insert a+b, update a + insert c, delete b."""
    t = _mk(spark, tmp_path)
    merge_apply(t, _ev(spark, [
        (1, "insert", "a", 1.0), (2, "insert", "b", 2.0),
    ]))
    time.sleep(0.05)
    merge_apply(t, _ev(spark, [
        (3, "update", "a", 10.0), (4, "insert", "c", 3.0),
    ]))
    time.sleep(0.05)
    merge_apply(t, _ev(spark, [(5, "delete", "b", None)]))
    return t


def test_history_rows_intervals(spark, table3):
    t = table3
    hist = history_rows(t)
    rows = sorted(
        (r["k"], r["_commit_version"], r["_live"],
         r["_valid_to"] is None, r["v"])
        for r in hist.collect()
    )
    vs = t.versions()  # [1(create), 2, 3, 4]
    v2, v3, v4 = vs[1], vs[2], vs[3]
    assert rows == sorted([
        ("a", v2, True, False, 1.0),      # superseded by the update
        ("a", v3, True, True, 10.0),      # current
        ("b", v2, True, False, 2.0),      # ended by the delete
        ("b", v4, False, True, None),     # tombstone interval, open
        ("c", v3, True, True, 3.0),       # current
    ])
    # validity chains per key: valid_to of the old row == valid_from
    # of its successor, and stamps follow the commit clock
    a = {r["_commit_version"]: r for r in hist.where("k='a'").collect()}
    assert a[v2]["_valid_to"] == a[v3]["_valid_from"]
    s2 = t.snapshot(v2).summary["committed_at"]
    s3 = t.snapshot(v3).summary["committed_at"]
    assert a[v2]["_valid_from"] == pytest.approx(s2)
    assert a[v3]["_valid_from"] == pytest.approx(s3)


def test_enrich_asof_equals_read_asof(spark, table3):
    t = table3
    vs = t.versions()
    stamps = [t.snapshot(v).summary["committed_at"] for v in vs[1:]]
    # facts straddling every interval boundary, incl. before-history
    # and after-current, for keys a (updated), b (deleted), d (never)
    probes = (
        [stamps[0] - 10.0]
        + [s + 0.01 for s in stamps]
        + [time.time() + 60]
    )
    facts = spark.createDataFrame(
        [(k, p, i) for i, p in enumerate(probes) for k in ("a", "b", "d")],
        "k string, fts double, fid int",
    )
    got = {
        (r["k"], r["fid"]): r["v"]
        for r in enrich_asof(facts, t, on=["k"], fact_ts="fts").collect()
    }
    # oracle: one read_asof lookup per probe timestamp
    for i, p in enumerate(probes):
        try:
            state = {
                r["k"]: r["v"] for r in t.read_asof(p).collect()
            }
        except ValueError:
            state = {}
        for k in ("a", "b", "d"):
            assert got[(k, i)] == state.get(k), (k, i, p)


def test_enrich_asof_bucketed_identity_and_validation(spark, table3):
    t = table3
    facts = spark.createDataFrame(
        [("a", time.time(), 1)], "k string, fts double, fid int"
    )
    plain = enrich_asof(facts, t, on=["k"], fact_ts="fts").collect()
    bucketed = enrich_asof(
        facts, t, on=["k"], fact_ts="fts", bucket_width=3600.0
    ).collect()
    assert plain == bucketed
    with pytest.raises(ValueError, match="collide"):
        enrich_asof(
            facts.withColumnRenamed("fid", "v"), t, on=["k"], fact_ts="fts"
        )
    with pytest.raises(ValueError, match="no retained versions"):
        history_rows(t, from_version=10_000)


def test_history_rows_after_expire_and_evolution(spark, table3):
    """Expiring old snapshots shortens history (the first retained
    version's full state seeds it); schema evolution mid-history
    union-aligns."""
    t = table3
    t.add_column("lang", "string")
    merge_apply(t, _ev(spark, [
        (6, "update", "a", 20.0),
    ]).withColumn("lang", F.lit("de")))
    hist = history_rows(t)
    a = sorted(
        (r["v"], r["lang"]) for r in hist.where("k='a'").collect()
    )
    assert a == [(1.0, None), (10.0, None), (20.0, "de")]
    t.expire_snapshots(keep_last=2)
    hist2 = history_rows(t)
    # only the last two versions remain: the seed state + one epoch
    assert hist2.where("k='a'").count() <= 2
    cur = hist2.where("k='a' and _valid_to is null").first()
    assert cur["v"] == 20.0 and cur["lang"] == "de"
