"""Incremental backfill / repair jobs (SURVEY §3.3).

The reference's cron maintenance scripts all share one shape: pull a
filtered, limited projection of the live table (rows missing an
enrichment — ``where zillow_id='' limit 900``,
update_zillow_data.py:21-23), compute the enrichment per row, push
row-by-row updates.  Recast: the *same MERGE operator* the ingest
path uses, with the table itself as the source —

    src = table.read().where(<missing>).limit(budget) |> enrich
    merge_apply(table, src, column_merge="coalesce")

The coalesce mode patches only the newly-computed columns, and the
source re-submits each row's *stored* order tuple, so a repair never
advances recency — a genuine later event still wins over a repaired
row.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realdeal_spark.lake.merge import MergeResult, OP_UPDATE, merge_apply
from realdeal_spark.lake.table import LakeTable


def backfill(
    table: LakeTable,
    missing: Column,
    enrich: Callable[[DataFrame], DataFrame],
    budget: int | None = None,
    epoch_id: str | None = None,
) -> MergeResult:
    """Repair rows matching ``missing`` via ``enrich``, quota-bounded.

    ``budget`` is the reference's per-run quota (limit=900); the
    deterministic order-by before the limit makes repeated runs
    progress through the backlog instead of resampling it.
    ``enrich`` receives the current rows and must return them with
    the repaired columns filled (extra columns are ignored by the
    MERGE projection).
    """
    snap = table.snapshot()
    src = table.read().where(missing)
    if budget is not None:
        src = src.orderBy(*snap.key_columns).limit(budget)
    src = enrich(src).withColumn("op", F.lit(OP_UPDATE))
    return merge_apply(
        table,
        src,
        column_merge="coalesce",
        epoch_id=epoch_id,
    )
