"""Table-to-table CDC replication: keep a replica LakeTable in sync
with a source table through the incremental changes feed.

This is the engine emitting CDC *and* consuming it end-to-end — the
downstream-replica use case `read_changes` exists for.  A replica is
how a 100-TB deployment serves divergent workloads off one ingest:
re-bucketed for a different join key, region-local, or schema-trimmed.
Replication cost per interval is O(changes), never O(table):

- the feed nets each changed key to one row (intermediate churn
  inside the interval is conflated away at the source);
- the replica MERGE rewrites only the buckets those keys hash to;
- exactly-once composes from the replica's own applied-epoch guard —
  the interval id IS the epoch id, so a replayed interval (streaming
  restart, crashed driver) is a metadata no-op.

Out-of-order protection carries over for free: the feed's rows carry
the SOURCE's order-column values, so the replica's MERGE rejects any
stale overlap exactly like the source would — replicas converge to
the source state no matter how the version range is chopped into
intervals (tested).

Schema evolution propagates: when the source gained columns (or
widened types), the feed emits current-schema rows and
``auto_evolve`` reconciles the replica's schema (metadata-only
commits) before the MERGE.

Reference analogue: none — the reference writes one Fusion Tables
store and re-renders from it (generate_report.py); fan-out to
derived stores without rescanning is the lake-format recast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realdeal_spark.cdc.evolve import reconcile
from realdeal_spark.lake.merge import MergeResult, merge_apply
from realdeal_spark.lake.table import LakeTable, interval_watermark


def create_replica(
    src: LakeTable,
    root: str,
    n_buckets: int | None = None,
) -> LakeTable:
    """An empty replica of ``src``: same current schema, keys, and
    order columns; ``n_buckets`` may differ (a re-partitioned replica
    — the point of replicating instead of copying files)."""
    snap = src.snapshot()
    fields = src._schema_version(snap, snap.current_schema).fields
    ddl = ", ".join(f"{f['name']} {f['type']}" for f in fields)
    return LakeTable.create(
        src.spark,
        root,
        ddl,
        key_columns=list(snap.key_columns),
        order_columns=list(snap.order_columns),
        n_buckets=n_buckets or snap.n_buckets,
        soft_delete=True,  # deletes must be representable downstream
    )


def replicate_interval(
    src: LakeTable,
    dst: LakeTable,
    from_version: int,
    to_version: int,
    auto_evolve: bool = True,
    mode: str = "cow",
) -> MergeResult | None:
    """Apply one source interval to the replica, exactly once.

    The feed's net rows become a MERGE batch: ``upsert`` →
    ``update`` (the MERGE inserts unmatched keys — upsert
    semantics), ``delete`` → ``delete``.  Epoch id
    ``cdf-replicate:<from>-<to>`` makes a replayed interval a
    metadata-only no-op: checked against the replica's applied
    epochs BEFORE any read (merge_apply records ids but the skip
    decision is the applier's job — same split as CdcApplier)."""
    if int(to_version) <= int(from_version):
        return None  # empty or inverted interval — nothing to apply
    epoch_id = f"cdf-replicate:{int(from_version)}-{int(to_version)}"
    if epoch_id in dst.snapshot().applied_epochs:
        return None
    ch = src.read_changes(from_version, to_version)
    if auto_evolve:
        reconcile(dst, ch.drop("change_type").schema)
    ev = ch.withColumn(
        "op",
        F.when(F.col("change_type") == "delete", F.lit("delete")).otherwise(
            F.lit("update")
        ),
    ).drop("change_type")
    return merge_apply(dst, ev, epoch_id=epoch_id, mode=mode)


def replica_watermark(dst: LakeTable) -> int | None:
    """The highest source version the replica has applied, recovered
    from its own applied-epoch ids (``cdf-replicate:<from>-<to>``) —
    the replica carries its replication state in-band, the same
    checkpoint-in-the-data property the applier has.  None if this
    table never received a replicated interval."""
    return interval_watermark(dst, "cdf-replicate:")


def replication_lag(src: LakeTable, dst: LakeTable) -> dict:
    """How far behind is the replica?  ``versions_behind`` is the
    metric a monitor alerts on (the per-epoch lag analogue for the
    replication path); ``source_version``/``replica_watermark`` give
    the retention check — expire_snapshots on the source must keep at
    least the watermark snapshot or the replica cannot resume."""
    wm = replica_watermark(dst)
    cur = src.current_version()
    return {
        "source_version": cur,
        "replica_watermark": wm,
        "versions_behind": (cur - wm) if wm is not None else None,
    }


def stream_replicate(
    src: LakeTable,
    dst: LakeTable,
    checkpoint_dir: str,
    starting_version: str | int = "earliest",
    max_versions_per_trigger: int | None = None,
    auto_evolve: bool = True,
    mode: str = "cow",
    trigger: dict | None = None,
):
    """Standing replication: one O(changes) MERGE on the replica per
    source commit, driven by the ``lake_changes`` descriptor stream
    (Spark-checkpointed offsets + the epoch-id guard above =
    exactly-once under restart/replay).  Returns the StreamingQuery."""
    from realdeal_spark.streaming.cdf_source import foreach_changes

    def _apply(changes_df, fv: int, tv: int) -> None:
        # foreach_changes hands us the default feed; recompute through
        # replicate_interval so the epoch-id/evolution path is shared
        replicate_interval(
            src, dst, fv, tv, auto_evolve=auto_evolve, mode=mode
        )

    return foreach_changes(
        src,
        _apply,
        checkpoint_dir,
        starting_version=starting_version,
        max_versions_per_trigger=max_versions_per_trigger,
        trigger=trigger,
        expand=False,
    )
