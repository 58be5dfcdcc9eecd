"""CDC engine: change-event generation, conflation, epoch apply loop.

The reference's epoch loop (scrape → find-new → enrich → upsert,
realtor_pipeline.py:27-54 driven by Luigi) becomes: tail the change
log by LSN range → conflate to one winner per key → MERGE into the
lake table → commit epoch id into the snapshot (exactly-once).
"""

from realdeal_spark.cdc.conflate import conflate
from realdeal_spark.cdc.apply import CdcApplier, EpochReport
from realdeal_spark.cdc.backfill import backfill
from realdeal_spark.cdc.evolve import plan_evolution, reconcile
from realdeal_spark.cdc.replicate import (
    create_replica,
    replicate_interval,
    stream_replicate,
)
from realdeal_spark.cdc.quarantine import (
    RedriveReport,
    purge_drained,
    read_quarantine,
    redrive_quarantine,
    split_quarantine,
)
from realdeal_spark.cdc.rollup import (
    Measure,
    RollupMaintainer,
    rollup_advance,
    rollup_full,
)
from realdeal_spark.cdc.joinview import (
    JoinViewMaintainer,
    advance_join_view,
    create_join_view,
    join_view_lag,
    join_view_watermark,
    stream_maintain_join_view,
)

__all__ = [
    "conflate",
    "CdcApplier",
    "EpochReport",
    "RedriveReport",
    "read_quarantine",
    "redrive_quarantine",
    "split_quarantine",
    "purge_drained",
    "backfill",
    "plan_evolution",
    "reconcile",
    "Measure",
    "RollupMaintainer",
    "create_replica",
    "replicate_interval",
    "rollup_advance",
    "rollup_full",
    "stream_replicate",
    "JoinViewMaintainer",
    "advance_join_view",
    "create_join_view",
    "join_view_lag",
    "join_view_watermark",
    "stream_maintain_join_view",
]
