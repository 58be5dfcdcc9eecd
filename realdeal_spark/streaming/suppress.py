"""Cross-batch change suppression — a custom stateful operator.

A web-crawl CDC stream is dominated by *no-op recrawls*: the fetcher
re-reads a page, the content hash is unchanged, and the event still
flows through conflation and MERGE only to be classified `unchanged`
and dropped.  MERGE already makes these correct (field-level diff,
ST5); this operator makes them *cheap* by suppressing them upstream,
before they cost a shuffle: per key, an event is emitted only when
its fingerprint differs from the previous event's.

Batch/stream split:

- **Batch** — pure Catalyst: ``lag(fingerprint) over (partition by
  keys order by order_cols)``, keep first-row-per-key and rows whose
  fingerprint is distinct from the previous.  Exact, and the
  SQL-expressible oracle form.
- **Stream** — :meth:`applyInPandasWithState` keyed by ``keys``: the
  state store holds one row per key (the last-seen fingerprint as a
  string), each micro-batch group is sorted by ``order_cols`` and
  scanned against the stored fingerprint, and the state is updated to
  the group's last value.  This is the operator Spark's built-in
  ``dropDuplicatesWithinWatermark`` cannot express — dedup is
  *against the previous value*, not against all values seen (an
  A→B→A pattern emits all three events; a set-membership dedup would
  wrongly swallow the second A).

Semantics contract: per-key **monotone arrival** across micro-batches
(each batch's events for a key are newer than the previous batch's) —
the same contract the CDC appliers already place on the binlog
source.  Within a batch, order is restored by sorting; across
batches, the state remembers the last order tuple (typed fields, not
strings) and a straggler older than it is passed through WITHOUT
updating state — suppression can only err toward emitting (false
pass; MERGE re-classifies downstream), never toward dropping a
change, which is why the batch path, not the stream path, is the
oracle.

Semantic trade, stated plainly: MERGE's ``unchanged`` action still
*advances the stored order tuple* (the table records "last seen at"
even when content is identical — lake/merge.py:200-203), so
suppressing those events upstream means the stored ``warc_ts``/``lsn``
stay at the first sighting of the current content version.  Use this
operator when the table's contract is (key, content-version) history;
skip it when last-seen recency stamping is load-bearing.

State bound: one string per key, plus an optional processing-time TTL
(``state_ttl_ms``).  An expired key's next event always passes through —
a false *pass*, never a false suppress, so correctness degrades to
"MERGE classifies it unchanged" exactly as if this operator were
absent.  That asymmetry is what makes TTL safe to set aggressively at
100 TB key cardinalities.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def suppress_unchanged(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    fingerprint_col: str,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Keep, per ``keys`` group in ``order_cols`` order, only rows
    whose ``fingerprint_col`` differs from the previous row's
    (null-safe; a group's first row always passes).  Output schema ==
    input schema.

    ``state_ttl_ms`` (streaming only): evict a key's state after that
    many milliseconds of processing time without events.  Use it on
    continuously-triggered queries; on an ``availableNow`` drain leave
    it unset — ProcessingTimeTimeout makes the drain keep scheduling
    empty micro-batches until every pending timer fires, so a drain
    that should end in 3 batches runs for the TTL duration instead."""
    keys = list(keys)
    order_cols = list(order_cols)
    if not df.isStreaming:
        w = Window.partitionBy(*keys).orderBy(*order_cols)
        fp = F.col(fingerprint_col).cast("string")
        out = (
            df.withColumn("_prev_fp", F.lag(fp).over(w))
            .withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) | ~fp.eqNullSafe(F.col("_prev_fp")))
            .drop("_prev_fp", "_rn")
        )
        return out

    out_schema = df.schema
    # the state carries the last-seen order tuple in its REAL column
    # types (not stringified — "9" > "10" bites), so a cross-batch
    # straggler older than the state is detectable
    ord_fields = [
        T.StructField(f"ord_{i}", df.schema[c].dataType)
        for i, c in enumerate(order_cols)
    ]
    state_schema = T.StructType(
        [
            T.StructField("last_fp", T.StringType()),
            T.StructField("fp_is_null", T.BooleanType()),
            *ord_fields,
        ]
    )
    col_names = [f.name for f in out_schema.fields]

    def dedup_fn(key: tuple, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        if state.hasTimedOut:
            # evicted for inactivity — next event for this key will
            # pass through unconditionally (safe: false pass only)
            state.remove()
            return
        chunks = [p for p in pdfs]
        pdf = pd.concat(chunks, ignore_index=True) if chunks else None
        if pdf is None or pdf.empty:
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
            return
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        if state.exists:
            got = state.get
            last_fp, fp_null, last_ord = got[0], got[1], tuple(got[2:])
            has_prev = True
        else:
            last_fp, fp_null, last_ord, has_prev = None, True, None, False
        keep = []
        for _, row in pdf.iterrows():
            row_ord = tuple(row[c] for c in order_cols)
            if has_prev and last_ord is not None and row_ord < last_ord:
                # cross-batch straggler older than the state: we cannot
                # know the fingerprint it truly followed, so PASS it
                # through without touching state — a false pass (MERGE
                # re-classifies downstream), never a false suppress.
                keep.append(True)
                continue
            v = row[fingerprint_col]
            is_null = pd.isna(v)
            fp = None if is_null else str(v)
            changed = (
                not has_prev
                or is_null != fp_null
                or (not is_null and fp != last_fp)
            )
            keep.append(changed)
            last_fp, fp_null, last_ord, has_prev = fp, is_null, row_ord, True
        state.update((last_fp, fp_null, *(last_ord or (None,) * len(order_cols))))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        emitted = pdf[pd.Series(keep, index=pdf.index)]
        if not emitted.empty:
            yield emitted[col_names]

    timeout = "ProcessingTimeTimeout" if state_ttl_ms else "NoTimeout"
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .applyInPandasWithState(
            dedup_fn, out_schema, state_schema, "append", timeout
        )
    )
