"""Stream-table enrichment through the bloom-indexed lookup path.

The classic CDC consumption pattern: a fact/event stream needs the
CURRENT row of a dimension table per event ("what is the latest
crawled state of this url right now").  Spark's built-in
stream-static join re-plans the static side per micro-batch — a full
scan-and-reconcile of the dimension table every trigger.  Here the
static side is a :class:`LakeTable`, so each micro-batch instead
does a **point lookup of exactly the batch's keys**: bucket-hash the
keys, probe the per-file Bloom sidecars, read only bloom-positive
files (lake/bloomidx.py).  Per-trigger cost tracks the batch's key
set, not the table — at 10^10 table rows a 10^4-event trigger reads
a few files, not a few petabytes.

Freshness semantics: each micro-batch joins against the table's
LATEST committed snapshot at batch time (snapshot isolation per
batch — one consistent version serves the whole batch; concurrent
MERGE commits become visible at the next trigger).  ``enrich_batch``
is the pure per-batch body, directly reusable inside any
``foreachBatch``; :func:`stream_enrich` wires it to a sink callback.

Reference analogue: the reference hydrates each scraped record with
its previously-uploaded row one HTTP GET at a time
(fusion_tables_client.py:21-26, zillow_client.py:119-129); this is
that lookup re-expressed as a per-trigger distributed index probe.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from realdeal_spark.lake.table import LakeTable


def enrich_batch(
    batch: DataFrame,
    table: LakeTable,
    how: str = "left",
    prefix: str = "t_",
) -> DataFrame:
    """Join one (micro-)batch against the table's current rows for
    the batch's own keys.

    Every non-key table column arrives prefixed with ``prefix`` (the
    batch keeps its own columns untouched; name collisions are
    impossible by construction).  ``how`` is ``left`` (events whose
    key is absent/deleted keep null enrichment — the usual fact-join)
    or ``inner`` (drop them).  Deleted keys enrich as null: a
    tombstone means "no current state", which is the correct answer.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left or inner, got {how!r}")
    snap = table.snapshot()
    key_cols = snap.key_columns
    missing = [c for c in key_cols if c not in batch.columns]
    if missing:
        raise ValueError(f"enrich batch lacks key column(s) {missing}")
    current = table.lookup(batch.select(*key_cols), snapshot=snap)
    renamed = current.select(
        *key_cols,
        *[
            current[c].alias(f"{prefix}{c}")
            for c in current.columns
            if c not in key_cols
        ],
    )
    return batch.join(renamed, on=key_cols, how=how)


def stream_enrich(
    stream: DataFrame,
    table: LakeTable,
    sink: Callable[[DataFrame, int], None],
    how: str = "left",
    prefix: str = "t_",
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    query_name: str = "lake-enrich",
) -> StreamingQuery:
    """Run a streaming enrichment: per micro-batch, point-lookup the
    batch's keys in ``table`` and hand the joined frame to ``sink``.

    ``sink(enriched_df, batch_id)`` owns delivery semantics — write
    to a lake table with an epoch id derived from ``batch_id`` for
    exactly-once, or fire-and-forget for dashboards.  Enrichment
    itself is stateless (the table IS the state), so no watermark is
    needed and a replayed batch re-enriches against the then-current
    snapshot — downstream idempotence is the sink's contract, same as
    every foreachBatch pipeline in this engine.
    """

    def body(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(enrich_batch(batch, table, how=how, prefix=prefix), batch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(body)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
