"""Structured Streaming driver over the same epoch body as cdc.apply.

``readStream`` source → ``foreachBatch(body)`` → MERGE into the lake
table.  The body is identical to the batch applier's epoch: conflate
→ transform → merge_apply; only the epoch-id scheme differs (the
streaming ``batchId`` from the checkpoint instead of an lsn range).

Exactly-once composition (SURVEY §2.9 ST2):

- Spark's streaming checkpoint guarantees each source offset range is
  presented as the same ``batchId`` on replay after a crash;
- merge_apply commits the epoch id ``stream:<name>:<batchId>`` inside
  the same snapshot as the data;
- so a replayed batch finds its id already in
  ``Snapshot.applied_epochs`` and becomes a no-op → end-to-end
  exactly-once without a transactional sink API.

Late/out-of-order data needs no watermark on this path: state lives
in the table itself and the MERGE's order-tuple guard (warc_ts, lsn)
makes stale events no-ops regardless of which micro-batch delivered
them (SURVEY ST6).

The reference analogue of this file is the Luigi cron loop
(realtor_pipeline.py:27-64) — one workflow run per epoch with
completion-token idempotence; here the scheduler is Spark's
micro-batch engine and the token is the snapshot property.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from realdeal_spark.cdc.conflate import conflate
from realdeal_spark.lake.merge import MergeResult, merge_apply
from realdeal_spark.lake.table import LakeTable


class StreamingCdcApplier:
    """Attach the CDC epoch body to any streaming DataFrame.

    ``name`` must be stable across restarts — it namespaces the epoch
    ids recorded in the table (one logical stream per name; two
    differently-named streams into one table are allowed and commit
    independently).
    """

    def __init__(
        self,
        table: LakeTable,
        name: str,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        column_merge: str = "replace",
        conflate_strategy: str = "auto",
        auto_evolve: bool = False,
        renames: dict[str, str] | None = None,
        merge_mode: str = "cow",
    ):
        self.table = table
        self.name = name
        self.transform = transform
        self.column_merge = column_merge
        self.conflate_strategy = conflate_strategy
        self.auto_evolve = auto_evolve
        self.renames = renames
        self.merge_mode = merge_mode
        self.batch_results: list[tuple[int, MergeResult | None]] = []

    # the foreachBatch body — public so tests can drive it directly
    # (e.g. to simulate a post-crash replay of the same batchId).
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> MergeResult | None:
        epoch_id = f"stream:{self.name}:{batch_id}"
        snap = self.table.snapshot()
        if epoch_id in snap.applied_epochs:
            self.batch_results.append((batch_id, None))  # replay → skip
            return None
        strategy = self.conflate_strategy
        if strategy == "auto":
            # same payload-shape heuristic as CdcApplier: binary
            # payload → payload-light conflation, else max_by
            keyed = set(snap.key_columns) | set(snap.order_columns)
            fields = self.table._schema_version(snap, snap.current_schema).fields
            strategy = (
                "light"
                if any(f["type"] == "binary" for f in fields if f["name"] not in keyed)
                else "max_by"
            )
        src = conflate(
            batch_df,
            snap.key_columns,
            snap.order_columns,
            strategy=strategy,
        )
        if self.transform is not None:
            src = self.transform(src)
        if self.auto_evolve:
            from realdeal_spark.cdc.evolve import reconcile

            reconcile(self.table, src.schema, self.renames)
        res = merge_apply(
            self.table,
            src,
            column_merge=self.column_merge,
            epoch_id=epoch_id,
            mode=self.merge_mode,
        )
        self.batch_results.append((batch_id, res))
        return res

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        trigger_available_now: bool = True,
        **trigger_kwargs,
    ):
        """Start the streaming query; returns the StreamingQuery.

        ``trigger_available_now`` drains everything currently in the
        source then stops — the batch-replay mode used by tests and
        backfills.  For a continuous tail pass
        ``trigger_available_now=False, processingTime='...'``.
        """
        writer = stream.writeStream.foreachBatch(self.apply_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_kwargs:
            writer = writer.trigger(**trigger_kwargs)
        return writer.start()

    @staticmethod
    def file_source(
        spark: SparkSession,
        path: str,
        schema: str,
        max_files_per_trigger: int = 1,
    ) -> DataFrame:
        """Tail a directory of event files (the sandbox's stand-in for
        a Kafka/binlog source; maxFilesPerTrigger is the per-trigger
        admission budget, SURVEY ST4/P6)."""
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
        )
