"""Stream-table enrichment (streaming/enrich.py): per-micro-batch
point lookup of the batch's keys against the lake table's current
snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realdeal_spark.lake.merge import merge_apply
from realdeal_spark.lake.table import LakeTable
from realdeal_spark.streaming.enrich import enrich_batch, stream_enrich

SCHEMA = "url string, v bigint, ts bigint, lsn bigint"


def _mk(spark, tmp_path, name="dim"):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        SCHEMA,
        key_columns=["url"],
        order_columns=["ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
        key_blooms=True,
    )


def _state(spark, lo, hi, op="upsert", ts_shift=0, v=None):
    return spark.range(lo, hi).select(
        F.format_string("u%d", F.col("id")).alias("url"),
        (F.col("id") * 10 if v is None else F.lit(v)).alias("v"),
        (F.col("id") + ts_shift).alias("ts"),
        (F.col("id") + ts_shift).alias("lsn"),
        F.lit(op).alias("op"),
    )


def test_enrich_batch_left_and_inner(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_apply(t, _state(spark, 0, 50), mode="mor", epoch_id="e1")
    merge_apply(
        t, _state(spark, 5, 6, op="delete", ts_shift=1000), mode="mor",
        epoch_id="e2",
    )
    batch = spark.createDataFrame(
        [("u3", 1), ("u5", 2), ("u999", 3)], "url string, seq int"
    )
    left = {r["url"]: r for r in enrich_batch(batch, t).collect()}
    assert set(left) == {"u3", "u5", "u999"}
    assert left["u3"]["t_v"] == 30 and left["u3"]["seq"] == 1
    assert left["u5"]["t_v"] is None  # deleted -> no current state
    assert left["u999"]["t_v"] is None  # absent
    inner = {r["url"] for r in enrich_batch(batch, t, how="inner").collect()}
    assert inner == {"u3"}
    with pytest.raises(ValueError, match="key column"):
        enrich_batch(spark.createDataFrame([(1,)], "x int"), t)
    with pytest.raises(ValueError, match="left or inner"):
        enrich_batch(batch, t, how="full")


def test_stream_enrich_sees_table_updates_between_triggers(spark, tmp_path):
    """Wave 1 enriches against the v-at-trigger-time state; the table
    is updated; wave 2 (same checkpoint) must see the new values —
    per-batch snapshot isolation, fresh at every trigger."""
    t = _mk(spark, tmp_path)
    merge_apply(t, _state(spark, 0, 20), mode="mor", epoch_id="e1")

    src = tmp_path / "facts"
    ckpt = str(tmp_path / "ckpt")
    got: dict[str, int] = {}

    def sink(df, batch_id):
        for r in df.collect():
            got[f"{r['url']}@{r['wave']}"] = (
                r["t_v"] if r["t_v"] is not None else -1
            )

    def run_wave():
        stream = spark.readStream.schema("url string, wave int").parquet(
            str(src)
        )
        q = stream_enrich(
            stream, t, sink, checkpoint_dir=ckpt,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

    spark.createDataFrame([("u1", 1), ("u2", 1)], "url string, wave int").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run_wave()
    assert got == {"u1@1": 10, "u2@1": 20}

    # dimension update lands between triggers
    merge_apply(
        t, _state(spark, 1, 2, ts_shift=5000, v=777), mode="mor",
        epoch_id="e2",
    )
    spark.createDataFrame([("u1", 2), ("u7", 2)], "url string, wave int").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run_wave()
    assert got["u1@2"] == 777  # sees the post-e2 state
    assert got["u7@2"] == 70
    assert got["u1@1"] == 10  # wave-1 result untouched (not reprocessed)
