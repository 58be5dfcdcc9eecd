"""Event-time windowed aggregation with watermarks (SURVEY ST9).

The CDC appliers use time only as *ordering* (latest per key wins);
this module adds the orthogonal rollup shape: tumbling / sliding
event-time windows over the change stream — or any event table — with
a watermark bounding streaming state and defining when late data is
dropped.

Batch/stream symmetric by construction: ``F.window`` is the same
Catalyst expression in both engines, so one definition serves the
oracle-checked batch query and the Structured Streaming path; the
only stream-specific piece is ``withWatermark``, applied iff the
input is streaming.

Scale notes (100 TB / unbounded stream):

- State is keyed by ``(window, *keys)`` in the executor state store
  and partitioned by the same tuple — group cardinality per trigger
  is (windows live under the watermark) × (keys), independent of
  total stream length.  The watermark is the state bound: without it
  an unbounded stream accumulates every window ever seen, which is
  why :func:`tumbling_rollup` *requires* a watermark on streaming
  input instead of silently defaulting to unbounded state.
- In ``append`` output mode a window emits exactly once, when the
  watermark passes ``window_end`` — the mode to use when the sink is
  an immutable log (e.g. :class:`~realdeal_spark.lake.table.LakeTable`
  ``append``).  ``update`` re-emits on every change for dashboards.
- Aggregates are partially computed map-side before the state-store
  shuffle (HashAggregate → state merge), so the shuffle carries one
  row per (window, key) per task, not per event.

Reference analogue: the reference has no windowed rollup — its cron
loop (realtor_pipeline.py:27-64) recomputes whole-table summaries per
run.  This is the Spark-native replacement: incremental, per-window,
late-data-aware.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_rollup(
    df: DataFrame,
    ts_col: str,
    window: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Group ``df`` into event-time windows of ``window`` length
    (sliding every ``slide`` if given) per distinct ``keys`` tuple and
    apply ``aggs`` (default: event count).

    Output columns: ``window_start``, ``window_end`` (timestamps),
    then ``keys``, then the aggregate aliases.

    On a **streaming** DataFrame a ``watermark`` is mandatory — it is
    what bounds the state store and finalizes windows (append mode
    emits a window once the watermark passes its end; events arriving
    later than the watermark are dropped).  On a **batch** DataFrame
    the watermark is a no-op and the same call computes the exact
    full-history answer, which is what the correctness oracle checks.
    """
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return _windowed_agg(
        df, ts_col, win, keys, aggs, watermark,
        "window_start", "window_end", "tumbling_rollup",
    )


def session_rollup(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sessionize ``df`` per ``keys``: events whose successive gap is
    under ``gap`` merge into one session (``F.session_window`` —
    session start = first event, end = last event + ``gap``).

    Output columns: ``session_start``, ``session_end``, then ``keys``,
    then the aggregate aliases.  Same watermark contract as
    :func:`tumbling_rollup`: mandatory on streaming input (session
    state merges in the state store and is finalized when the
    watermark passes the session end), no-op on batch — the batch run
    is the gaps-and-islands oracle.

    Scale note: unlike tumbling windows, sessions MERGE — the state
    store may rewrite several adjacent sessions on one late event;
    state per key is still bounded by (sessions live under the
    watermark), so the watermark remains the state bound.
    """
    return _windowed_agg(
        df, ts_col, F.session_window(ts_col, gap), keys, aggs, watermark,
        "session_start", "session_end", "session_rollup",
    )


def _windowed_agg(
    df: DataFrame,
    ts_col: str,
    win: Column,
    keys: Sequence[str],
    aggs: Sequence[Column] | None,
    watermark: str | None,
    start_alias: str,
    end_alias: str,
    what: str,
) -> DataFrame:
    ntz_in = df.schema[ts_col].dataType.simpleString().startswith(
        "timestamp_ntz"
    )
    if df.isStreaming:
        if not watermark:
            raise ValueError(
                f"streaming {what} requires a watermark — unbounded "
                "window state does not survive an unbounded stream"
            )
        if ntz_in:
            # watermarks need an instant (TIMESTAMP, not NTZ); the
            # engine's tables are NTZ throughout, interpreted in the
            # session tz (UTC — see realdeal_spark.session), so the
            # cast is wall-clock identity.  Window bounds are cast
            # back below to keep batch/stream output schemas equal.
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
        df = df.withWatermark(ts_col, watermark)
    if aggs is None:
        aggs = [F.count(F.lit(1)).alias("n_events")]
    # win references ts_col by NAME (unresolved until analysis), so it
    # binds to the recast/watermarked column even though the caller
    # built it against the original df
    out = df.groupBy(win.alias("_w"), *[F.col(k) for k in keys]).agg(*aggs)
    rest = [c for c in out.columns if c != "_w"]
    bound = lambda f: (
        F.col(f"_w.{f}").cast("timestamp_ntz")
        if ntz_in
        else F.col(f"_w.{f}")
    )
    return out.select(
        bound("start").alias(start_alias),
        bound("end").alias(end_alias),
        *rest,
    )
