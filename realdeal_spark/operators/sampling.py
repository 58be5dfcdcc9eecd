"""Deterministic, reproducible sampling for training-data curation.

`df.sample()` is seed-dependent *per partition layout*: the same seed
over the same data returns different rows if the file splits change —
useless for a curation pipeline that must be re-runnable bit-for-bit
at 100 TB and auditable afterwards.  These operators derive the
sampling decision from a hash of the row's own id, so membership is a
pure function of the data:

- :func:`hash_sample` — keep a deterministic ~fraction of rows:
  ``md5(salt || id) mod D < D·fraction``.  Same row set on any
  cluster, any partitioning, any engine (md5 is bit-identical across
  Spark / DuckDB / Python — the same trick the text fingerprint and
  LSH planes use).  Changing ``salt`` draws an independent sample;
  fractions are exact in expectation and hash-uniform in realization.
- :func:`stratified_sample` — cap each stratum (e.g. language) at
  ``per_stratum`` rows, choosing *which* rows by hash rank so the
  selection is again layout-independent: ``row_number() over
  (partition by stratum order by md5(salt || id), id)``.

Scale shape: ``hash_sample`` is a pure map-side filter (pushes to the
scan, no shuffle).  ``stratified_sample`` and
:func:`token_budget_sample` need a per-stratum PREFIX (hash-order
rank, or running token sum) — inherently sequential per stratum, so
the naive single window serializes a giant stratum (one language
being 50% of the web) on one reducer.  The skew guard
(``skew_buckets``, on by default) computes the exact same prefix as a
DISTRIBUTED PREFIX SUM over contiguous ranges of the hash order:

1. bucket = ``hash // ceil(D / skew_buckets)`` — contiguous hash-
   order ranges, so every row of bucket b sorts before every row of
   bucket b+1 within its stratum;
2. one narrow groupBy computes each (stratum, bucket)'s row count /
   token total — ≤ ``skew_buckets`` rows per stratum;
3. a window over that tiny table gives each bucket its carry-in (the
   aggregate of all earlier buckets);
4. the carry joins back on (stratum, bucket) and the heavy window
   runs partitioned by (stratum, bucket) — a giant stratum spreads
   over ``skew_buckets`` independent window groups — with
   ``global prefix = carry + within-bucket prefix``.

The decomposition is exact (not a superset-then-refine), so the
result is row-identical to the single-window plan for any bucket
count; the only serial work left per stratum is the ≤``skew_buckets``-
row carry window.  Set ``skew_buckets=0`` to force the plain single
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash-space denominator: md5's first 15 hex digits, taken mod this.
#: 10^6 gives ppm-resolution fractions while staying far from the
#: 60-bit hash range (no modulo bias worth measuring).
_DENOM = 1_000_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform int in [0, _DENOM) from md5(salt || id) — the same
    conv(substr(md5 ...)) construction the oracle replays in SQL."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % _DENOM


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``id_col``.

    Membership is a pure function of (salt, id): re-runs, other
    engines, and other partitionings select the identical rows.
    Disjoint salts give independent samples; the same salt with a
    larger fraction gives a superset (nested samples — grow a training
    set without resampling what you already curated)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * _DENOM)
    return df.where(_hash_bucket(F.col(id_col), salt) < F.lit(threshold))


def _with_stratum_prefix(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    salt: str,
    skew_buckets: int,
    val_col: str | None = None,
    carry_lt: int | None = None,
    order_tail: list[str] | None = None,
) -> DataFrame:
    """Attach ``_prefix``: the exact per-stratum prefix aggregate in
    hash order — row count up to and including this row when
    ``val_col`` is None (i.e. the hash rank), else the running sum of
    ``val_col``.  Shared core of :func:`stratified_sample` and
    :func:`token_budget_sample`.

    ``skew_buckets > 1`` computes it as a distributed prefix sum over
    contiguous hash-order range buckets (module docstring): the heavy
    window is partitioned by (stratum, bucket) so no single reducer
    ever sorts a whole stratum; exactness comes from
    ``global prefix = carry-in + within-bucket prefix`` where the
    carry-ins are planned on a ≤``skew_buckets``-row-per-stratum
    bucket table.  The (stratum, bucket) carry join is null-safe on
    the stratum columns so null strata group exactly as the window
    does.

    ``carry_lt`` prunes whole buckets whose carry-in already meets the
    caller's cut (``_carry >= carry_lt`` ⇒ every row in the bucket
    fails ``_prefix <= carry_lt - 1``, for non-negative per-row
    contributions): the bucket table is filtered BEFORE the join, so
    with AQE broadcasting the tiny carry side, rows past the cut are
    dropped map-side and never enter the window shuffle — the shuffle
    then moves only ~cut + one bucket's rows per stratum."""
    hb = _hash_bucket(F.col(id_col), salt)
    # order_tail extends the total order below the id for callers
    # whose rows are finer-grained than the hashed id (sequence
    # packing orders a document's chunks by chunk index, keeping them
    # adjacent under the document's hash position)
    order = [hb, F.col(id_col), *[F.col(c) for c in (order_tail or [])]]

    def within(w):
        # row_number ≡ count(*) over the running rows frame under a
        # total order (id tiebreak), but row_number admits no frame
        # and keeps the WindowGroupLimit rank-limit pushdown alive in
        # the single-window fallback
        if val_col is None:
            return F.row_number().over(w)
        return F.sum(val_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    agg_one = F.count(F.lit(1)) if val_col is None else F.sum(val_col)
    if skew_buckets and skew_buckets > 1:
        width = -(-_DENOM // skew_buckets)  # ceil: bucket in [0, skew_buckets)
        bucket = F.floor(hb / F.lit(width))
        per = (
            df.groupBy(*stratum_cols, bucket.alias("_rb"))
            .agg(agg_one.alias("_bt"))
        )
        wb = (
            Window.partitionBy(*stratum_cols)
            .orderBy("_rb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        per = per.select(
            *stratum_cols,
            "_rb",
            F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_carry"),
        )
        if carry_lt is not None:
            per = per.where(F.col("_carry") < F.lit(carry_lt))
        left = df.withColumn("_rb", bucket).alias("L")
        right = per.alias("R")
        cond = F.col("L._rb") == F.col("R._rb")
        for c in stratum_cols:
            cond = cond & F.col(f"L.{c}").eqNullSafe(F.col(f"R.{c}"))
        w = Window.partitionBy(
            *[F.col(f"L.{c}") for c in stratum_cols], "L._rb"
        ).orderBy(*order)
        return (
            left.join(right, cond, "inner")
            .withColumn("_prefix", F.col("R._carry") + within(w))
            .select("L.*", "_prefix")
            .drop("_rb")
        )
    w = Window.partitionBy(*stratum_cols).orderBy(*order)
    return df.withColumn("_prefix", within(w))


def stratified_sample(
    df: DataFrame,
    per_stratum: int,
    stratum_cols: list[str],
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    skew_buckets: int = 1024,
) -> DataFrame:
    """At most ``per_stratum`` rows per distinct ``stratum_cols``
    tuple, selected by hash rank (deterministic, layout-independent,
    id tiebreak).  The balanced-corpus primitive: equal per-language
    document budgets regardless of raw-language skew.

    Skew-safe by default: the range-bucket prefix decomposition
    (module docstring) keeps a stratum holding half the corpus from
    serializing on one reducer, and buckets wholly past the cap are
    pruned before the window shuffle; ``skew_buckets=0`` forces the
    plain single window.  Both plans return identical rows."""
    if per_stratum < 1:
        raise ValueError(f"per_stratum must be >= 1, got {per_stratum}")
    return (
        _with_stratum_prefix(
            df, stratum_cols, id_col, salt, skew_buckets,
            carry_lt=per_stratum,
        )
        .where(F.col("_prefix") <= per_stratum)
        .drop("_prefix")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    stratum_cols: list[str],
    token_col: str,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    skew_buckets: int = 1024,
) -> DataFrame:
    """Fill each stratum up to a TOKEN budget, not a document count —
    the unit training runs are actually specified in.  ``token_col``
    must be non-negative (it's a count).

    Documents are taken in hash order (deterministic,
    layout-independent, same ordering as :func:`stratified_sample`)
    while the running token total stays ≤ ``budget``; the first
    document that would overflow the budget stops the stratum (and a
    single document larger than the whole budget is skipped with the
    rest, by the same rule).

    The cumulative sum is an inherently sequential prefix per
    stratum, so the skew guard is the range-bucket prefix
    decomposition (module docstring): per-bucket token totals give
    each bucket a carry-in, the heavy cumsum window runs per
    (stratum, bucket), and buckets whose carry-in alone exceeds the
    budget are pruned before the window shuffle (sound because token
    counts are non-negative, so a row's cumsum is at least its
    bucket's carry-in).  ``skew_buckets=0`` forces the plain single
    window; both plans return identical rows."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    return (
        _with_stratum_prefix(
            df, stratum_cols, id_col, salt, skew_buckets,
            val_col=token_col, carry_lt=budget + 1,
        )
        .where(F.col("_prefix") <= budget)
        .drop("_prefix")
    )
