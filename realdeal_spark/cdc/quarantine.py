"""Dead-letter routing for malformed change events.

A production binlog tail always contains some garbage: an op code the
decoder doesn't know, a null key from an upstream bug, a null order
column that would silently vanish in the light conflation (``F.max``
skips nulls — the same hazard ``LakeTable.append`` validates against).
Failing the whole epoch on one bad row stalls ingest; silently
applying it corrupts state (an unknown op falls through to "upsert" in
the MERGE action chain).  The production answer is a dead-letter
queue: route invalid rows to a quarantine sink, apply the rest, count
both.

Shape at scale: validity is one deterministic CASE expression — the
split is two pushdown-filtered passes over the epoch scan (no shuffle,
no UDF), and the quarantine write observes its row count on the same
job (no extra count scan).  Quarantined files are parquet under
``<quarantine_dir>/<epoch_id>/`` with a ``_reason`` column, so they
are replayable after a fix: read, repair, feed back through a normal
epoch.

Reason precedence is fixed (unknown op → null key → null order),
first match wins — deterministic and oracle-expressible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realdeal_spark.lake.merge import OP_COL, OP_DELETE, OP_INSERT, OP_UPDATE

KNOWN_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)
REASON_COL = "_reason"


def invalidity_expr(
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    known_ops: Sequence[str] = KNOWN_OPS,
    checks: dict[str, str] | None = None,
) -> Column:
    """String reason the row is invalid, or NULL for a valid row.
    Precedence: unknown/null op, then null key columns in order, then
    null order columns in order, then CHECK constraints in name
    order (reason ``check:<name>``; tombstones exempt, NULL passes —
    the same semantics the MERGE's fail-fast path enforces)."""
    expr = F.when(
        F.col(OP_COL).isNull() | ~F.col(OP_COL).isin(*known_ops),
        F.lit("unknown_op"),
    )
    for c in key_cols:
        expr = expr.when(F.col(c).isNull(), F.lit(f"null_key:{c}"))
    for c in order_cols:
        expr = expr.when(F.col(c).isNull(), F.lit(f"null_order:{c}"))
    if checks:
        from realdeal_spark.lake.merge import check_violation_expr

        for name in sorted(checks):
            expr = expr.when(
                check_violation_expr(checks[name]), F.lit(f"check:{name}")
            )
    return expr  # no otherwise → NULL = valid


def split_quarantine(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    known_ops: Sequence[str] = KNOWN_OPS,
    checks: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid): ``valid`` has the input schema; ``invalid``
    carries the extra ``_reason`` column.  Two filters over the same
    source — both inherit the scan's pushdown, neither shuffles."""
    reason = invalidity_expr(key_cols, order_cols, known_ops, checks)
    tagged = df.withColumn(REASON_COL, reason)
    good = tagged.where(F.col(REASON_COL).isNull()).drop(REASON_COL)
    bad = tagged.where(F.col(REASON_COL).isNotNull())
    return good, bad


def write_quarantine(
    bad: DataFrame, quarantine_dir: str, epoch_id: str
) -> int:
    """Write the invalid rows for one epoch; returns how many.

    ``mode=overwrite`` + the epoch-id path makes the write idempotent
    under crash-replay: a re-run of the same epoch overwrites its own
    quarantine output before the snapshot commit, never duplicates it.
    The count rides the write job as an Observation — no extra scan.
    """
    from pyspark.sql import Observation

    safe = epoch_id.replace(":", "_").replace("/", "_")
    obs = Observation(f"quarantine-{safe}")
    observed = bad.observe(obs, F.count(F.lit(1)).alias("n"))
    observed.write.mode("overwrite").parquet(f"{quarantine_dir}/{safe}")
    try:
        return int(obs.get["n"])
    except Exception:
        return 0  # empty frame: observed node emitted nothing
