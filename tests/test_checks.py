"""CHECK constraints (LakeTable.add_check): enforced on every write
path — merge CoW/MoR, append, predicate DML — via Observations riding
jobs that run anyway (no extra scan), raising before any file lands;
appliers with a quarantine_dir dead-letter the violations instead.
Persistence must survive every snapshot-producing operation (the
child_kwargs carry-forward), and schema evolution must refuse to
orphan a check."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from realdeal_spark.lake import (
    CheckViolation,
    LakeTable,
    merge_apply,
    update_where,
)
from realdeal_spark.cdc.apply import CdcApplier

SCHEMA = "url string, ts timestamp_ntz, lsn bigint, lang string, v double"


def _mk(spark, tmp_path, name="t", **kw):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA,
        key_columns=["url"], order_columns=["ts", "lsn"],
        n_buckets=4, soft_delete=True, **kw,
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


GOOD = [(1, "insert", "u1", "de", 1.0), (2, "insert", "u2", "en", 2.0)]
BAD_V = [(3, "insert", "u3", "fr", -5.0)]           # violates v_nonneg
BAD_LANG = [(4, "insert", "u4", "xx", 4.0)]         # violates lang_known
NULL_V = [(5, "insert", "u5", "de", None)]          # NULL passes CHECK


def _add_checks(t):
    t.add_check("v_nonneg", "v >= 0")
    t.add_check("lang_known", "lang in ('de','en','fr')")


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_raises_before_any_write(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, name=f"m_{mode}")
    _add_checks(t)
    merge_apply(t, _ev(spark, GOOD), epoch_id="ok", mode=mode)
    v = t.current_version()
    with pytest.raises(CheckViolation) as ei:
        merge_apply(t, _ev(spark, GOOD[-1:] + BAD_V + BAD_LANG),
                    epoch_id="bad", mode=mode)
    assert ei.value.counts == {"v_nonneg": 1, "lang_known": 1}
    # nothing landed: same version, same rows
    assert t.current_version() == v
    assert t.read().count() == 2


def test_null_passes_and_deletes_exempt(spark, tmp_path):
    t = _mk(spark, tmp_path, name="nulls")
    _add_checks(t)
    merge_apply(t, _ev(spark, GOOD + NULL_V), epoch_id="e1")
    assert t.read().count() == 3  # NULL v passes (ANSI CHECK)
    # a tombstone carrying out-of-range values is exempt
    merge_apply(t, _ev(spark, [(9, "delete", "u1", "xx", -1.0)]),
                epoch_id="e2")
    assert t.read().count() == 2


def test_append_enforces_and_discards_files(spark, tmp_path):
    t = _mk(spark, tmp_path, name="app")
    _add_checks(t)
    base = dt.datetime(2024, 1, 1)
    bad = spark.createDataFrame(
        [("u1", base, 1, "de", 1.0), ("u2", base, 2, "de", -1.0)], SCHEMA
    )
    with pytest.raises(CheckViolation):
        t.append(bad)
    assert t.read().count() == 0
    t.append(bad.where(F.col("v") >= 0))
    assert t.read().count() == 1


def test_quarantine_routes_check_violations(spark, tmp_path):
    t = _mk(spark, tmp_path, name="q")
    _add_checks(t)
    qdir = str(tmp_path / "dead")
    a = CdcApplier(t, lsn_col="lsn", quarantine_dir=qdir)
    rep = a.apply_epoch(_ev(spark, GOOD + BAD_V + BAD_LANG + NULL_V), 0, 9)
    assert rep.quarantined == 2
    assert t.read().count() == 3  # GOOD + NULL_V applied
    bad = spark.read.parquet(f"{qdir}/lsn_0-9")
    reasons = {r["url"]: r["_reason"] for r in bad.collect()}
    assert reasons == {"u3": "check:v_nonneg", "u4": "check:lang_known"}


def test_dml_update_cannot_break_check(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dml")
    _add_checks(t)
    merge_apply(t, _ev(spark, GOOD), epoch_id="seed")
    with pytest.raises(CheckViolation):
        update_where(t, "url = 'u1'", {"v": F.lit(-1.0)}, epoch_id="bad")
    assert {r["v"] for r in t.read().collect()} == {1.0, 2.0}


def test_checks_survive_every_operation(spark, tmp_path):
    """The child_kwargs carry-forward: compaction, schema evolution,
    rebucketing, key-bloom toggles must not drop the constraint set."""
    t = _mk(spark, tmp_path, name="carry")
    t.add_check("v_nonneg", "v >= 0")
    merge_apply(t, _ev(spark, GOOD), epoch_id="e1", mode="mor")
    t.compact()
    t.add_column("extra", "string")
    t.rebucket(2)
    t.set_key_blooms(True)
    assert t.snapshot().checks == {"v_nonneg": "v >= 0"}
    with pytest.raises(CheckViolation):
        merge_apply(t, _ev(spark, BAD_V).withColumn("extra", F.lit("x")),
                    epoch_id="bad")


def test_add_drop_validation_and_evolution_guard(spark, tmp_path):
    t = _mk(spark, tmp_path, name="val")
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_check("broken", "no_such_col > 0")
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_check("agg", "sum(v) > 0")  # aggregate: not row-level
    with pytest.raises(ValueError, match="identifier"):
        t.add_check("n", "v >= 0")  # reserved (append's null counter)
    with pytest.raises(ValueError, match="identifier"):
        t.add_check("bad name!", "v >= 0")
    t.add_check("v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check("v_nonneg", "v >= 1")
    # renaming the checked column must be refused until the check drops
    with pytest.raises(ValueError, match="orphans CHECK"):
        t.rename_column("v", "val")
    t.drop_check("v_nonneg")
    t.rename_column("v", "val")
    with pytest.raises(KeyError):
        t.drop_check("v_nonneg")


def test_no_checks_costs_nothing(spark, tmp_path):
    """A table without checks takes the exact pre-feature code path
    (no Observation attached)."""
    from realdeal_spark.lake.merge import _observe_checks

    t = _mk(spark, tmp_path, name="zero")
    df = _ev(spark, GOOD)
    out, obs = _observe_checks(df, {})
    assert obs is None and out is df
    merge_apply(t, df, epoch_id="e1")
    assert t.read().count() == 2
