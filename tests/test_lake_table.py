"""Lake table format: snapshots, bucket pruning, schema evolution,
time travel, compaction, commit atomicity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realdeal_spark.lake.table import CommitConflict, LakeTable

SCHEMA = "url string, warc_ts timestamp_ntz, n int"


def _mk(spark, tmp_path, **kw):
    return LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key_columns=["url"],
        order_columns=["warc_ts"],
        n_buckets=kw.pop("n_buckets", 8),
        **kw,
    )


def _rows(spark, n=20):
    return spark.range(n).select(
        F.format_string("u%d", F.col("id")).alias("url"),
        F.timestamp_seconds(1704067200 + F.col("id")).cast("timestamp_ntz").alias("warc_ts"),
        F.col("id").cast("int").alias("n"),
    )


def test_create_read_empty(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.read().count() == 0
    assert [f.name for f in t.read().schema.fields] == ["url", "warc_ts", "n"]


def test_append_and_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark))
    df = t.read()
    assert df.count() == 20
    assert df.where(F.col("url") == "u3").select("n").collect()[0][0] == 3


def test_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, 5))
    v2 = t.current_version()
    t.append(_rows(spark, 5).withColumn("url", F.concat(F.lit("x"), "url")))
    assert t.read(version=v2).count() == 5
    assert t.read().count() == 10


def test_bucket_pruning_matches_full_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, 50))
    snap = t.snapshot()
    some = [int(b) for b in list(snap.files)[:3]]
    pruned = t.read(buckets=some, with_bucket=True)
    assert set(r["_bucket"] for r in pruned.select("_bucket").distinct().collect()) <= set(some)
    full = t.read(with_bucket=True)
    assert full.where(F.col("_bucket").isin(some)).count() == pruned.count()


def test_schema_add_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, 5))
    t.add_column("fetch_status", "int")
    df = t.read()
    assert "fetch_status" in df.columns
    # old files read as null for the new column
    assert df.where(F.col("fetch_status").isNull()).count() == 5


def test_schema_rename_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, 5))
    t.rename_column("n", "count_n")
    df = t.read()
    assert "count_n" in df.columns and "n" not in df.columns
    # data written under the old name still readable (field-id mapping)
    assert df.agg(F.sum("count_n")).collect()[0][0] == sum(range(5))


def test_schema_widen_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, 5))
    t.widen_column("n", "bigint")
    df = t.read()
    assert dict(df.dtypes)["n"] == "bigint"
    assert df.agg(F.sum("n")).collect()[0][0] == sum(range(5))
    with pytest.raises(ValueError):
        t.widen_column("url", "int")


def test_evolution_then_append_mixes_schemas(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, 5))
    t.add_column("fetch_status", "int")
    t.rename_column("n", "m")
    new = _rows(spark, 3).withColumn("url", F.concat(F.lit("y"), "url")).select(
        "url", "warc_ts", F.col("n").alias("m"), F.lit(7).alias("fetch_status")
    )
    t.append(new)
    df = t.read()
    assert df.count() == 8
    assert df.where(F.col("fetch_status") == 7).count() == 3
    assert df.agg(F.sum("m")).collect()[0][0] == sum(range(5)) + sum(range(3))


def test_commit_conflict(spark, tmp_path):
    t = _mk(spark, tmp_path)
    snap = t.snapshot()
    snap.version = 1  # try to re-commit the existing version
    with pytest.raises(CommitConflict):
        t._commit(snap)


def test_compact(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=2)
    for i in range(3):
        t.append(_rows(spark, 10).withColumn("url", F.concat(F.lit(str(i)), "url")))
    before = t.read().count()
    snap = t.compact(max_files_per_bucket=1)
    assert snap is not None
    assert all(len(fl) <= 1 for fl in t.snapshot().files.values())
    assert t.read().count() == before
