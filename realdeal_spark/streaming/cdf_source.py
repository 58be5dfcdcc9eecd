"""Streaming changes-feed source: tail a LakeTable as a stream.

``LakeTable.read_changes(from_v, to_v)`` gives the *batch* incremental
read (Iceberg changelog-scan shape).  This module makes the table a
first-class Structured Streaming source so downstream consumers — a
maintained rollup, a secondary index, a replica — tail it with Spark's
own offset checkpointing instead of hand-rolled version bookkeeping.

Design (the 100-TB shape)
-------------------------
The stream carries **epoch descriptors**, not change rows: one
metadata-sized row ``(from_version, to_version)`` per micro-batch,
produced by a PySpark 4 Python DataSource
(:class:`SimpleDataSourceStreamReader` — explicitly intended for
driver-side, metadata-rate sources).  The offset IS the table version,
checkpointed by Spark exactly like a Kafka offset.  Each micro-batch
then *expands* its descriptor inside ``foreachBatch`` through the
existing distributed ``read_changes`` plan — winner reconcile,
carryover elimination, bucket-pruned pre-images all stay in the
DataFrame engine, scanning O(changes) data files, never O(table).

Pushing the change *rows* through the source instead would force the
reconcile semi-join into per-partition Python readers (impossible:
it is a cross-partition join) or a driver-side collect (the
anti-pattern).  Control-plane stream + data-plane DataFrame is the
standard connector recast of that constraint.

Exactly-once: offsets live in the Spark checkpoint; on restart the
last in-flight batch replays via ``readBetweenOffsets`` with the same
``(from_version, to_version)``, and ``read_changes`` is a pure
function of those versions — so any idempotent-per-interval handler
(RollupMaintainer's per-version state, ``ivf_index_advance``'s
stamped sidecar) reconverges to the identical state.

Retention contract (same as Delta CDF / Iceberg incremental reads):
``expire_snapshots`` must keep at least the stream's lag worth of
snapshots — a checkpointed offset whose snapshot was expired fails
loudly at ``read_changes`` time rather than silently rescanning.

Reference analogue: the reference re-scrapes and re-renders the whole
report per run (realdeal/generate_report.py); a standing "what
changed since my last run" subscription is the Spark-first recast.
"""

from __future__ import annotations

from typing import Callable, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

_FORMAT_NAME = "lake_changes"

# descriptor schema: one row per micro-batch, metadata-sized
_SCHEMA_DDL = "from_version bigint, to_version bigint"


def _list_versions(table_root: str) -> list[int]:
    """Committed snapshot versions present on disk, ascending.  Pure
    filesystem metadata — callable from the driver-side reader where
    no SparkSession exists."""
    import os

    meta = os.path.join(table_root, "_meta")
    try:
        names = os.listdir(meta)
    except FileNotFoundError:
        raise FileNotFoundError(f"not a lake table: {table_root}") from None
    return sorted(
        int(n[1:-5])
        for n in names
        if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
    )


class LakeChangesStreamReader(SimpleDataSourceStreamReader):
    """Driver-side version tailer.  Offsets are ``{"version": N}``."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("lake_changes requires .option('path', <table root>)")
        self.path = path
        start = str(options.get("startingversion", "latest")).lower()
        self.starting = start
        mvt = options.get("maxversionspertrigger")
        self.max_versions = int(mvt) if mvt is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("maxVersionsPerTrigger must be >= 1")

    def initialOffset(self) -> dict:
        vs = _list_versions(self.path)
        if not vs:
            raise FileNotFoundError(f"lake table has no snapshots: {self.path}")
        if self.starting == "latest":
            v = vs[-1]
        elif self.starting == "earliest":
            # NOTE: baseline-EXCLUSIVE — the offset starts AT the
            # oldest retained snapshot and the stream delivers changes
            # strictly after it.  On a fresh table that snapshot is
            # the empty create commit, so "earliest" sees everything;
            # after expire_snapshots it holds accumulated state a new
            # consumer must bootstrap separately (read the snapshot,
            # then tail from it — the create_replica pattern seeds the
            # replica from the feed only because replicas start before
            # expiry).  Unlike Delta CDF's inclusive startingVersion.
            v = vs[0]
        else:
            v = int(self.starting)
            if v not in vs:
                raise ValueError(
                    f"startingVersion {v} is not a live snapshot of "
                    f"{self.path} (present: {vs[0]}..{vs[-1]})"
                )
        return {"version": v}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        from_v = int(start["version"])
        vs = _list_versions(self.path)
        cur = vs[-1] if vs else from_v
        if cur <= from_v:
            return iter([]), start  # no progress — empty batch
        to_v = cur
        if self.max_versions is not None:
            # admission control: a numeric cap bounds epochs-per-
            # trigger (ST4's per-trigger budget, applied to the
            # change-feed side).  Clamp to a version that EXISTS:
            # expire_snapshots can leave gaps (a tagged old snapshot
            # pinned while intermediates were dropped), and a
            # descriptor ending on a dropped version would fail
            # read_changes on every replay — a permanently wedged
            # stream.  Take the largest retained version inside the
            # budget, else the smallest retained one past it (jump
            # the gap; the interval still ends on real metadata).
            cap = from_v + self.max_versions
            inside = [v for v in vs if from_v < v <= cap]
            to_v = max(inside) if inside else min(
                v for v in vs if v > from_v
            )
        return iter([(from_v, to_v)]), {"version": to_v}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        from_v, to_v = int(start["version"]), int(end["version"])
        if to_v <= from_v:
            return iter([])
        return iter([(from_v, to_v)])

    def commit(self, end: dict) -> None:
        pass


class LakeChangesDataSource(DataSource):
    """``spark.readStream.format("lake_changes")`` — version-advance
    descriptors of a LakeTable as a streaming source.

    Options: ``path`` (table root, required); ``startingVersion``
    (``latest`` default | ``earliest`` | int); ``maxVersionsPerTrigger``
    (int — cap snapshots consumed per micro-batch)."""

    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType) -> LakeChangesStreamReader:
        return LakeChangesStreamReader(self.options)


def register_lake_changes(spark: SparkSession) -> None:
    """Register the data source (idempotent per session).

    The DataSource class is pickled to a separate Python worker
    process whose ``sys.path`` is NOT the driver script's — a user
    whose job found ``realdeal_spark`` via a path tweak (or an
    unshipped checkout) would hit ``ModuleNotFoundError`` at
    ``load()`` time.  The reader is deliberately self-contained
    (os/json only), so serialize this module BY VALUE instead of by
    reference; ``spark-submit --py-files`` deployments work either
    way."""
    if getattr(spark, "_lake_changes_registered", False):
        return
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # older cloudpickle: --py-files / PYTHONPATH deployments still work
    spark.dataSource.register(LakeChangesDataSource)
    spark._lake_changes_registered = True


def stream_changes(
    spark: SparkSession,
    table_root: str,
    starting_version: str | int = "latest",
    max_versions_per_trigger: int | None = None,
) -> DataFrame:
    """The descriptor stream as a DataFrame (schema
    ``from_version bigint, to_version bigint``)."""
    register_lake_changes(spark)
    r = (
        spark.readStream.format(_FORMAT_NAME)
        .option("path", table_root)
        .option("startingVersion", str(starting_version))
    )
    if max_versions_per_trigger is not None:
        r = r.option("maxVersionsPerTrigger", str(max_versions_per_trigger))
    return r.load()


def foreach_changes(
    table,
    handler: Callable[[DataFrame, int, int], None],
    checkpoint_dir: str,
    starting_version: str | int = "latest",
    max_versions_per_trigger: int | None = None,
    include_preimage: bool = False,
    trigger: dict | None = None,
    expand: bool = True,
):
    """Run ``handler(changes_df, from_version, to_version)`` for every
    epoch the table advances — the standing CDF consumer.

    ``changes_df`` is the full distributed ``read_changes`` plan for
    the interval.  The handler MUST be idempotent per interval (a
    replayed batch after restart re-presents the same versions).
    Returns the StreamingQuery; ``trigger`` kwargs pass through (e.g.
    ``{"availableNow": True}`` to drain and stop).

    ``expand=False`` passes ``changes_df=None`` and skips building the
    feed plan here — every ``stream_maintain_*`` wrapper sets it
    because the advance it calls re-derives the feed internally
    (building it twice doubles per-trigger manifest/plan work, and
    with ``include_preimage`` the wasted build even runs eager
    jobs)."""
    desc = stream_changes(
        table.spark, table.root, starting_version, max_versions_per_trigger
    )

    def _expand(batch_df: DataFrame, batch_id: int) -> None:
        # descriptor rows: at most one per source per batch — metadata
        for row in batch_df.collect():
            fv, tv = int(row["from_version"]), int(row["to_version"])
            handler(
                table.read_changes(fv, tv, include_preimage=include_preimage)
                if expand
                else None,
                fv,
                tv,
            )

    w = desc.writeStream.foreachBatch(_expand).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        w = w.trigger(**trigger)
    return w.start()


def stream_maintain_rollup(
    maintainer,
    checkpoint_dir: str,
    max_versions_per_trigger: int | None = None,
    trigger: dict | None = None,
):
    """Keep a :class:`~realdeal_spark.cdc.rollup.RollupMaintainer`
    continuously current: one O(changes) advance per table commit.

    The maintainer's per-version parquet state makes the handler
    idempotent (re-advancing to a version it already reflects is a
    no-op), so exactly-once composes from Spark's offset checkpoint
    alone.  Starts from the maintainer's own resume point — the
    descriptor stream begins at its persisted version when it has one
    (bootstrap otherwise handles itself via rollup_full)."""
    start = maintainer.version if maintainer.version is not None else "latest"

    def _advance(changes_df: DataFrame, fv: int, tv: int) -> None:
        maintainer.refresh(to_version=tv)

    return foreach_changes(
        maintainer.table,
        _advance,
        checkpoint_dir,
        starting_version=start,
        max_versions_per_trigger=max_versions_per_trigger,
        trigger=trigger,
        expand=False,
    )


def stream_maintain_ivf(
    table,
    index_dir: str,
    checkpoint_dir: str,
    max_versions_per_trigger: int | None = None,
    trigger: dict | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Keep a persisted IVF index (:func:`build_ivf_index`) in sync
    with the table: per commit, rewrite only the affected cells
    (``ivf_index_advance`` — O(changes + affected cells)).

    Idempotent per interval: the advance anti-joins removals and
    re-adds upserts, and the sidecar version stamps last, so a
    replayed batch reconverges.  Starts at the index's own stamped
    version."""
    import json
    import os

    from realdeal_spark.operators.similarity import ivf_index_advance

    with open(os.path.join(index_dir, "centroids.json")) as f:
        start = int(json.load(f)["table_version"])

    def _advance(changes_df: DataFrame, fv: int, tv: int) -> None:
        ivf_index_advance(
            table, index_dir, to_version=tv, vec_col=vec_col, id_col=id_col
        )

    return foreach_changes(
        table,
        _advance,
        checkpoint_dir,
        starting_version=start,
        max_versions_per_trigger=max_versions_per_trigger,
        trigger=trigger,
        expand=False,
    )


def stream_maintain_dedup_index(
    src,
    idx,
    checkpoint_dir: str,
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_versions_per_trigger: int | None = None,
    trigger: dict | None = None,
):
    """Keep a near-dup LSH index (:func:`~realdeal_spark.lake.dedupidx.
    create_dedup_index`) continuously current: one O(changes) advance
    per base commit, so every newly-ingested document is probe-able
    against the corpus one trigger later.

    Idempotent per interval through the index's own epoch guard
    (``dedupidx:<from>-<to>``); exactly-once composes from Spark's
    offset checkpoint alone.  An empty index bootstraps synchronously
    before the stream starts."""
    from realdeal_spark.lake.dedupidx import (
        advance_dedup_index,
        dedup_index_watermark,
    )

    params = dict(
        text_col=text_col, num_perm=num_perm,
        bands=bands, shingle_n=shingle_n,
    )
    wm = dedup_index_watermark(idx)
    if wm is None:
        advance_dedup_index(src, idx, **params)
        wm = dedup_index_watermark(idx)
    start = wm if wm is not None else src.current_version()

    def _advance(changes_df: DataFrame, fv: int, tv: int) -> None:
        advance_dedup_index(src, idx, to_version=tv, **params)

    return foreach_changes(
        src,
        _advance,
        checkpoint_dir,
        starting_version=start,
        max_versions_per_trigger=max_versions_per_trigger,
        trigger=trigger,
        expand=False,
    )


def stream_maintain_history(
    src,
    hist,
    checkpoint_dir: str,
    max_versions_per_trigger: int | None = None,
    trigger: dict | None = None,
):
    """Keep an SCD2 history table (:func:`~realdeal_spark.lake.scd.
    create_history_table`) continuously current: one O(changes)
    advance per src commit.

    Idempotent per interval through the history table's own epoch
    guard (``scd2:<from>-<to>``), so exactly-once composes from
    Spark's offset checkpoint alone.  An empty history bootstraps
    synchronously before the stream starts (the descriptor source
    needs a concrete starting version)."""
    from realdeal_spark.lake.scd import advance_history, history_watermark

    wm = history_watermark(hist)
    if wm is None:
        advance_history(src, hist)
        wm = history_watermark(hist)
    start = wm if wm is not None else src.current_version()

    def _advance(changes_df: DataFrame, fv: int, tv: int) -> None:
        advance_history(src, hist, to_version=tv)

    return foreach_changes(
        src,
        _advance,
        checkpoint_dir,
        starting_version=start,
        max_versions_per_trigger=max_versions_per_trigger,
        trigger=trigger,
        expand=False,
    )
