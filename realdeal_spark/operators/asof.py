"""As-of (temporal) join — match each left row to the most recent
right row at or before its timestamp, per key.

The classic CDC/feature-store lookup ("the price in effect when the
order landed", "the user's last profile update before the click") is
an inequality join Spark's optimizer can only plan as a broadcast
nested loop or an exploded range join — both wrong at 100 TB.  This
module plans it as a UNION + ordered window: tag both sides, sort
each key's timeline once, and carry the last-seen right row forward
with ``last(..., ignorenulls=True)``.  One shuffle on the key, no
cartesian anywhere, and the matched payload rides a single struct
column so the window tracks one value regardless of how many right
columns are projected.

Skew: a plain window sorts each key's entire timeline in one reducer
— a hot key (one url with 10^8 revisions) serializes.  With
``bucket_width`` the timeline splits into contiguous time buckets:
phase 1 computes each (key, bucket)'s last right row on a small
``max_by`` aggregate (partial map-side), a narrow window over that
small table plans every bucket's carry-in (the last right row of any
earlier bucket), and phase 2's heavy window partitions by
(key, bucket) — no reducer ever sorts a whole key, and the result is
row-identical to the plain window (tested).  The same
distributed-prefix trick as ``operators/sampling.py`` — there over
hash ranks, here over event time.

Reference parity: the reference resolves "current state at scrape
time" by re-fetching per record (properties_scrapy/pipelines.py) — a
per-row RPC this operator replaces with one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SRC = "__asof_src"
_PAYLOAD = "__asof_r"
_BUCKET = "__asof_b"
_CARRY = "__asof_carry"
_ORD = "__asof_ord"
_JKEY = "__asof_k"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    how: str = "left",
    bucket_width: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (backward; inclusive) sharing ``on`` —
    DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics.

    ``direction='forward'`` flips to the smallest ``right_ts >=
    left_ts``.  ``tolerance`` (seconds for timestamp columns, plain
    units otherwise) voids matches farther than the band.  ``how`` is
    ``left`` (unmatched left rows keep NULL payload) or ``inner``.
    Ties: a right row AT the left row's timestamp matches (inclusive);
    among right duplicates at the same (key, ts) the carried row is
    the last in union order — dedup the right side first if that
    ambiguity matters (the contract query does).

    ``bucket_width`` (same units as the ordered domain: seconds for
    timestamps) enables the two-phase skew-safe plan described in the
    module docstring; the result is row-identical.  Choose it so a
    hot key spans many buckets (e.g. one day for year-long timelines).
    """
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward, got {direction!r}"
        )
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    # validate the join keys on BOTH sides: a typo'd `on` column that
    # exists only on the right would otherwise be null-filled by the
    # tagged union and return all-NULL payloads instead of raising
    absent_l = [c for c in on if c not in left.columns]
    absent_r = [c for c in on if c not in right.columns]
    if absent_l or absent_r:
        raise ValueError(
            f"asof_join `on` columns missing: left={absent_l}, "
            f"right={absent_r}"
        )
    rcols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    missing = [c for c in rcols if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right side: {missing}")
    clash = [c for c in rcols if c in left.columns]
    if clash:
        raise ValueError(
            f"right_cols collide with left columns: {clash} — alias them"
        )

    # forward = backward over the negated timeline; negation keeps one
    # code path and preserves total order.  Timestamps order through
    # fractional epoch seconds so tolerance is in seconds either way.
    def _ord_expr(col: str, df: DataFrame):
        t = df.schema[col].dataType.simpleString()
        e = F.col(col)
        if t.startswith("timestamp"):
            # explicit _ltz: unix_micros accepts only TIMESTAMP, and
            # under spark.sql.timestampType=TIMESTAMP_NTZ the bare
            # "timestamp" name resolves to NTZ; both sides convert
            # identically so ordering and gaps are unaffected
            e = F.unix_micros(F.col(col).cast("timestamp_ltz")) / F.lit(
                1_000_000.0
            )
        else:
            e = e.cast("double")
        return (-e) if direction == "forward" else e

    payload = F.struct(
        _ord_expr(right_ts, right).alias(_ORD),
        *[F.col(c) for c in rcols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        _ord_expr(right_ts, right).alias(_TS),
        F.lit(0).alias(_SRC),
        payload.alias(_PAYLOAD),
    )
    l = left.select(
        *left.columns,
        _ord_expr(left_ts, left).alias(_TS),
        F.lit(1).alias(_SRC),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    left_columns = list(left.columns)

    if bucket_width is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_TS), F.col(_SRC))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            _CARRY, F.last(_PAYLOAD, ignorenulls=True).over(w)
        )
    else:
        if bucket_width <= 0:
            raise ValueError("bucket_width must be positive")
        u = u.withColumn(
            _BUCKET, F.floor(F.col(_TS) / F.lit(float(bucket_width)))
        )
        # join the carry through a STRUCT of the keys: struct equality
        # is null-safe per field, so NULL join keys group together
        # exactly like the plain path's Window.partitionBy — raw-column
        # equi-joins would silently drop NULL-key matches (the same
        # reason sampling's prefix-sum carry join uses eqNullSafe)
        u = u.withColumn(
            _JKEY, F.struct(*on) if on else F.lit(0)
        )
        # Phase 1 — per-(key, bucket) last right row: max_by over the
        # right rows only, partial-aggregated map-side.  Output is one
        # row per (key, bucket) the RIGHT side touches; left-only
        # buckets are unioned in empty so the carry window below plans
        # every bucket any left row will probe.  Both tables are
        # bucket-granular — small relative to the data.
        tiebreak = F.struct(F.col(_TS), F.col(_SRC))
        lasts = (
            u.where(F.col(_SRC) == 0)
            .groupBy(_JKEY, _BUCKET)
            .agg(F.max_by(F.col(_PAYLOAD), tiebreak).alias("_last"))
        )
        lonly = (
            u.where(F.col(_SRC) == 1)
            .select(_JKEY, _BUCKET)
            .distinct()
            .join(
                lasts.select(_JKEY, _BUCKET),
                on=[_JKEY, _BUCKET],
                how="left_anti",
            )
            .withColumn("_last", F.lit(None).cast(lasts.schema["_last"].dataType))
        )
        wprev = (
            Window.partitionBy(_JKEY)
            .orderBy(F.col(_BUCKET))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = lasts.unionByName(lonly).select(
            _JKEY,
            F.col(_BUCKET),
            F.last("_last", ignorenulls=True).over(wprev).alias("_carry_in"),
        )
        # Phase 2 — heavy window partitions by (key, bucket), seeded
        # by the bucket's carry-in.
        wb = (
            Window.partitionBy(_JKEY, _BUCKET)
            .orderBy(F.col(_TS), F.col(_SRC))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.join(carry, on=[_JKEY, _BUCKET], how="left").withColumn(
            _CARRY,
            F.coalesce(
                F.last(_PAYLOAD, ignorenulls=True).over(wb),
                F.col("_carry_in"),
            ),
        )

    m = F.col(_CARRY)
    if tolerance is not None:
        # _TS and the payload's _ORD both carry the direction sign, so
        # the gap is (left point - matched right point) in the ordered
        # domain: >= 0 by construction, bounded by the band.
        m = F.when(F.col(_TS) - m[_ORD] <= F.lit(float(tolerance)), m)
    keep = F.col(_SRC) == 1
    if how == "inner":
        keep = keep & m.isNotNull()
    return matched.where(keep).select(
        *[F.col(c) for c in left_columns],
        *[m[c].alias(c) for c in rcols],
    )
