"""Bloom-filter winner pushdown (operators.bloom).

Covers: no false negatives (the hard guarantee), bounded false
positives, plan shape (payload side broadcast-probed, not shuffled,
before the filter), conflate-light equivalence with the pushdown
active, and the MoR routing path above BROADCAST_KEYS_MAX.
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from realdeal_spark.cdc.conflate import conflate
from realdeal_spark.operators.bloom import bloom_build, bloom_prefilter


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("url-"), F.col("id")).alias("url")
    )


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = _keys(spark, 0, 2000)
    # payload: members 0..1999 plus non-members 2000..11999
    payload = _keys(spark, 0, 12000).withColumn(
        "html", F.sha2(F.col("url"), 256)
    )
    out = bloom_prefilter(payload, members, ["url"], expected_keys=2000)
    got = {r["url"] for r in out.select("url").collect()}
    want = {f"url-{i}" for i in range(2000)}
    assert want <= got, "false negatives: bloom dropped true members"
    # fpp at 16 bits/key, k=2 is ~1.4%; allow 4x slack on 10k trials
    fp = len(got - want) / 10000
    assert fp <= 0.06, f"false-positive rate {fp} out of bounds"
    # survivors keep their payload untouched
    row = out.where(F.col("url") == "url-7").first()
    assert row["html"] is not None


def test_bloom_words_table_is_compact(spark):
    members = _keys(spark, 0, 5000)
    words, m_bits = bloom_build(members, ["url"], expected_keys=5000)
    assert m_bits == 5000 * 16
    # at most m/64 words, fewer in practice (only set words stored)
    assert words.count() <= m_bits // 64 + 1


def test_bloom_prefilter_plan_broadcasts_probes(spark):
    members = _keys(spark, 0, 1000)
    payload = _keys(spark, 0, 5000).withColumn("html", F.sha2(F.col("url"), 256))
    out = bloom_prefilter(payload, members, ["url"], expected_keys=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # the payload side reaches the filter without an exchange: no
    # shuffle exchange at all in the prefilter plan (probes broadcast)
    assert "Exchange hashpartitioning" not in plan, plan


def test_conflate_light_bloom_matches_max_by(spark):
    rows = [
        (f"u{i % 50}", (i * 7) % 97, i, f"payload-{i}") for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts int, lsn bigint, html string")
    base = conflate(df, ["url"], ["warc_ts", "lsn"], strategy="max_by")
    pushed = conflate(
        df,
        ["url"],
        ["warc_ts", "lsn"],
        strategy="light",
        broadcast_winners=False,
        bloom_expected_keys=50,
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, pushed.collect()))


def test_applier_engages_bloom_above_cap(spark, tmp_path, monkeypatch):
    """Drive an epoch whose distinct-key estimate exceeds the cap:
    the applier must disable the broadcast AND pass the bloom
    pushdown, and the final state must still equal the oracle."""
    import importlib

    # the cdc package re-exports the conflate *function* under the
    # module's name — go through importlib for the module itself
    conflate_mod = importlib.import_module("realdeal_spark.cdc.conflate")
    from realdeal_spark.cdc import apply as apply_mod
    from realdeal_spark.cdc.apply import CdcApplier
    from realdeal_spark.lake import merge as merge_mod
    from realdeal_spark.lake.table import LakeTable

    monkeypatch.setattr(merge_mod, "BROADCAST_KEYS_MAX", 100)

    seen: dict = {}
    real_conflate = conflate_mod.conflate

    def spy(*a, **kw):
        seen.update(kw)
        return real_conflate(*a, **kw)

    monkeypatch.setattr(apply_mod, "conflate", spy)

    ev = spark.range(0, 4000).select(
        F.concat(F.lit("u"), (F.col("id") % 1000)).alias("url"),
        (F.col("id") % 13).cast("int").alias("warc_ts"),
        F.col("id").alias("lsn"),
        F.sha2(F.col("id").cast("string"), 256).alias("html"),
        F.lit("update").alias("op"),
    )
    root = str(tmp_path / "bloomlake")
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(
        spark,
        root,
        "url string, warc_ts int, lsn bigint, html string",
        ["url"],
        ["warc_ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
    )
    CdcApplier(t, lsn_col="lsn").run(ev, epoch_size=4000)
    assert seen.get("broadcast_winners") is False
    assert seen.get("bloom_expected_keys", 0) > 100
    exp = {
        (r["url"], r["lsn"])
        for r in conflate(ev, ["url"], ["warc_ts", "lsn"], strategy="max_by")
        .select("url", "lsn")
        .collect()
    }
    got = {(r["url"], r["lsn"]) for r in t.read().select("url", "lsn").collect()}
    assert got == exp


def test_mor_routing_bloom_above_cap(spark, tmp_path, monkeypatch):
    """MoR winner routing above the cap goes through the Bloom
    prefilter and still lands exactly the winner rows."""
    from realdeal_spark.cdc.apply import CdcApplier
    from realdeal_spark.lake import merge as merge_mod
    from realdeal_spark.lake.table import LakeTable

    monkeypatch.setattr(merge_mod, "BROADCAST_KEYS_MAX", 50)

    ev = spark.range(0, 2000).select(
        F.concat(F.lit("u"), (F.col("id") % 400)).alias("url"),
        (F.col("id") % 7).cast("int").alias("warc_ts"),
        F.col("id").alias("lsn"),
        F.sha2(F.col("id").cast("string"), 256).alias("html"),
        F.when(F.col("id") % 37 == 0, "delete").otherwise("update").alias("op"),
    )
    root = str(tmp_path / "bloommor")
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(
        spark,
        root,
        "url string, warc_ts int, lsn bigint, html string",
        ["url"],
        ["warc_ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
    )
    CdcApplier(t, lsn_col="lsn", merge_mode="mor").run(ev, epoch_size=1000)
    latest = conflate(
        ev.withColumn("op", F.col("op")),
        ["url"],
        ["warc_ts", "lsn"],
        strategy="max_by",
    )
    exp = {
        (r["url"], r["lsn"])
        for r in latest.where(F.col("op") != "delete")
        .select("url", "lsn")
        .collect()
    }
    got = {(r["url"], r["lsn"]) for r in t.read().select("url", "lsn").collect()}
    assert got == exp
