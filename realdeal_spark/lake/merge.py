"""MERGE-apply: a change batch → a new table snapshot.

Semantics (the reference's upsert loop, made set-based and
batching-independent):

- source rows carry ``op`` ∈ {insert, update, delete} plus the key,
  the order columns, and any subset of data columns;
- the source must be conflated to ≤1 row per key (cdc.conflate does
  this; same load-bearing requirement as Iceberg MERGE's unique-source
  rule, and the reference's intra-batch key-set dedup at
  realdeal/luigi/find_new_properties.py:49);
- NOT MATCHED + op≠delete → insert (reference: find-new anti-join →
  INSERT, find_new_properties.py:20-52 + batch uploader insert queue);
- MATCHED + op≠delete + src not older → replace/patch row (reference:
  field-diff → UPDATE, real_deal_batch_uploader.py:48-59);
- op=delete + src not older → write a **tombstone** (row kept with a
  hidden ``_deleted`` flag; default reads filter it).  Tombstones make
  the final state independent of epoch boundaries: a stale update
  arriving in a later epoch than the delete cannot resurrect the row,
  because the tombstone still carries the delete's order tuple.
  (Reference analogue: DELETE-by-rowid, fusion_tables_client.py:
  170-174, which *lacks* this protection — SURVEY ST6.)
- src strictly older than the stored row (by the order-column tuple)
  → no-op: out-of-order events cannot regress state.

Scale shape: the target side is read bucket-pruned (only buckets the
source batch hashes into), the join is a shuffled hash join on the
key within those buckets, and only buckets with ≥1 *effective* change
are rewritten — a no-op update batch rewrites nothing (the
reference's "only update when a field actually differs" check,
zillow_client.py:119-129, lifted to file level).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from realdeal_spark.lake.table import (
    _BUCKET_COL,
    _DATA,
    _DELETED_COL,
    LakeTable,
    Snapshot,
)

OP_COL = "op"
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"


@dataclass
class MergeResult:
    snapshot: Snapshot | None  # None => empty batch / pure no-op
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    unchanged: int = 0
    stale: int = 0
    touched_buckets: list[int] = field(default_factory=list)
    rewritten_buckets: list[int] = field(default_factory=list)

    @property
    def effective_changes(self) -> int:
        return self.inserted + self.updated + self.deleted


def merge_apply(
    table: LakeTable,
    source: DataFrame,
    column_merge: str = "replace",
    epoch_id: str | None = None,
    extra_summary: dict | None = None,
) -> MergeResult:
    """Apply one conflated change batch to the table.

    ``column_merge``:
      - ``"replace"``  — a winning source row replaces the whole row
        (full-row CDC events, the engine default);
      - ``"coalesce"`` — null source fields keep the target's value
        (partial updates; the reference's per-field patch semantics,
        zillow_client.py:119-129).
    """
    snap = table.snapshot()
    if not snap.soft_delete:
        raise ValueError(
            "merge_apply requires a soft_delete table (create with "
            "soft_delete=True); hard-delete merge would make state "
            "depend on epoch boundaries"
        )
    cur_fields = table._schema_version(snap, snap.current_schema).fields
    data_cols = [f["name"] for f in cur_fields]
    if OP_COL in data_cols:
        raise ValueError(
            f"table has a data column named '{OP_COL}', which collides "
            "with the change-event envelope; store it under another "
            "name (e.g. 'last_op')"
        )
    key_cols = snap.key_columns
    order_cols = snap.order_columns
    src_cols = set(source.columns)
    missing = [c for c in key_cols + order_cols if c not in src_cols]
    if missing:
        raise ValueError(f"source missing key/order columns: {missing}")
    if OP_COL not in src_cols:
        raise ValueError(f"source missing '{OP_COL}' column")

    # project source onto the current table schema (absent columns →
    # typed nulls; present columns → cast), keep op, compute bucket.
    src = source.select(
        *[
            (
                F.col(f["name"]).cast(f["type"])
                if f["name"] in src_cols
                else F.lit(None).cast(f["type"])
            ).alias(f["name"])
            for f in cur_fields
        ],
        F.col(OP_COL),
    ).withColumn(_BUCKET_COL, table.bucket_expr(snap))

    # persist the conflated batch: it is read by the touched-bucket
    # probe, the join, and (via the resolved cache) nothing else — one
    # materialization instead of re-running conflation (and whatever
    # upstream extraction feeds it) per phase.
    src = src.persist(StorageLevel.MEMORY_AND_DISK)
    touched = sorted(r[0] for r in src.select(_BUCKET_COL).distinct().collect())
    if not touched:
        src.unpersist()
        return MergeResult(snapshot=None)

    tgt = table.read(buckets=touched, with_bucket=True, include_deleted=True)

    s = src.alias("s")
    t = tgt.alias("t")
    joined = s.join(
        t, on=[F.col(f"s.{k}") == F.col(f"t.{k}") for k in key_cols], how="full_outer"
    )

    s_order = F.struct(*[F.col(f"s.{c}") for c in order_cols])
    t_order = F.struct(*[F.col(f"t.{c}") for c in order_cols])
    s_present = F.col(f"s.{key_cols[0]}").isNotNull()
    t_present = F.col(f"t.{key_cols[0]}").isNotNull()
    t_visible = t_present & ~F.col(f"t.{_DELETED_COL}")
    is_delete = F.col(f"s.{OP_COL}") == OP_DELETE
    wins = s_present & (~t_present | (s_order >= t_order))

    if column_merge == "coalesce":
        src_val = {c: F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")) for c in data_cols}
    elif column_merge == "replace":
        src_val = {c: F.col(f"s.{c}") for c in data_cols}
    else:
        raise ValueError(f"unknown column_merge: {column_merge}")
    # order columns always come from the winning event itself, even in
    # coalesce mode — recency must advance.
    for c in order_cols:
        src_val[c] = F.col(f"s.{c}")

    # change detection: does the winning source row actually differ
    # from the stored row (values or visibility)?
    differs = ~t_present | (is_delete != F.col(f"t.{_DELETED_COL}"))
    for c in data_cols:
        differs = differs | ~src_val[c].eqNullSafe(F.col(f"t.{c}"))

    action = (
        F.when(~s_present, F.lit("carry"))
        .when(~wins, F.lit("stale"))
        .when(~differs, F.lit("unchanged"))
        .when(is_delete & t_visible, F.lit("delete"))
        .when(is_delete, F.lit("tombstone"))  # delete of absent/deleted key
        .when(~t_visible, F.lit("insert"))  # new key or resurrect
        .otherwise(F.lit("update"))
    )

    take_src = F.col("_action").isin("insert", "update", "unchanged", "delete", "tombstone")
    out_cols = [
        F.when(take_src, src_val[c]).otherwise(F.col(f"t.{c}")).alias(c)
        for c in data_cols
    ]
    deleted_out = (
        F.when(take_src, is_delete).otherwise(F.col(f"t.{_DELETED_COL}"))
    ).alias(_DELETED_COL)
    bucket_out = F.coalesce(
        F.col(f"s.{_BUCKET_COL}"), F.col(f"t.{_BUCKET_COL}")
    ).alias(_BUCKET_COL)

    resolved = joined.withColumn("_action", action).select(
        "_action", bucket_out, deleted_out, *out_cols
    )

    # single output pass: the action statistics ride the delta write as
    # an Observation instead of a separate aggregation job (halves the
    # evaluations of the join).  All touched buckets are rewritten; the
    # earlier design pruned no-op buckets at the cost of one extra full
    # pass — the wrong trade for a CDC stream where touched buckets
    # almost always carry changes.  A fully no-op batch is detected
    # from the observation and its files discarded before commit.
    cnt = lambda a: F.sum(
        F.when(F.col("_action") == a, 1).otherwise(0).cast("long")
    )
    obs = Observation()
    observed = resolved.observe(
        obs,
        cnt("insert").alias("ins"),
        cnt("update").alias("upd"),
        cnt("delete").alias("del"),
        cnt("tombstone").alias("tomb"),
        cnt("unchanged").alias("unch"),
        cnt("stale").alias("stale"),
    )
    new_rows = observed.drop("_action").repartition(
        min(max(len(touched), 1), 256), _BUCKET_COL
    )
    new_version = snap.version + 1
    try:
        new_files = table._write_delta(new_rows, new_version, snap.current_schema)
        m = obs.get
        result = MergeResult(
            snapshot=None,
            inserted=int(m["ins"]),
            updated=int(m["upd"]),
            deleted=int(m["del"]),
            unchanged=int(m["unch"]),
            stale=int(m["stale"]),
            touched_buckets=touched,
        )
        if result.effective_changes + int(m["tomb"]) == 0 and epoch_id is None:
            # pure no-op batch: drop the just-written delta, commit nothing
            shutil.rmtree(
                os.path.join(table.root, _DATA, f"delta-{new_version:09d}"),
                ignore_errors=True,
            )
            return result
        result.rewritten_buckets = sorted(int(b) for b in new_files)
        summary = {
            "inserted": result.inserted,
            "updated": result.updated,
            "deleted": result.deleted,
            "unchanged": result.unchanged,
            "stale": result.stale,
            **(extra_summary or {}),
        }
        result.snapshot = table.commit_bucket_replacement(
            snap, new_version, new_files, touched, summary=summary, epoch_id=epoch_id
        )
        return result
    finally:
        src.unpersist()
        src.unpersist()
