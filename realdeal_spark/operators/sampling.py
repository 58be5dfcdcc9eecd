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
:func:`token_budget_sample` are built on a two-phase hash-rank prefix
(``salt_shards``, on by default): phase 1 ranks within (stratum,
shard) so a giant stratum — one language being 50% of the web — is
spread over ``salt_shards`` reducers instead of serializing on one;
phase 2 ranks exactly over the per-shard survivors, whose count is
bounded by ``salt_shards × n`` per stratum.  The union of per-shard
top-n provably contains the global top-n for ANY disjoint sharding,
so the two-phase result is row-identical to the single-window plan
(same pattern as cdc/conflate.py's salted window).  Set
``salt_shards=0`` to force the plain single window.
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


def _hash_rank_prefix(
    df: DataFrame,
    n: int,
    stratum_cols: list[str],
    id_col: str,
    salt: str,
    salt_shards: int,
    exact: bool = True,
) -> DataFrame:
    """Rows whose hash rank within their stratum is ≤ ``n`` — the
    shared core of :func:`stratified_sample` and the token-budget
    pre-cap.

    ``salt_shards > 1`` runs it two-phase (the skew guard): phase 1
    takes the per-(stratum, shard) top-n — the giant stratum's rows
    spread over ``salt_shards`` reducers — and phase 2 takes the
    exact top-n over the ≤ ``salt_shards × n`` survivors per stratum.
    Correct for any disjoint sharding: a row in the global top-n is in
    the top-n of whichever shard holds it, so phase 1 never drops it.
    Output is row-identical to the single-window plan.

    ``exact=False`` skips phase 2 and returns the phase-1 superset
    (global top-n ⊆ result ⊆ top-(shards×n)) — for callers that apply
    their own exact cut downstream, like the token-budget cumsum,
    where a second rank window would be a redundant sort."""
    order = [_hash_bucket(F.col(id_col), salt), F.col(id_col)]
    if salt_shards > 1:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_shards))
        w1 = Window.partitionBy(
            *([F.col(c) for c in stratum_cols] + [shard])
        ).orderBy(*order)
        df = (
            df.withColumn("_hr1", F.row_number().over(w1))
            .where(F.col("_hr1") <= n)
            .drop("_hr1")
        )
        if not exact:
            return df
    w = Window.partitionBy(*stratum_cols).orderBy(*order)
    return (
        df.withColumn("_hr", F.row_number().over(w))
        .where(F.col("_hr") <= n)
        .drop("_hr")
    )


def stratified_sample(
    df: DataFrame,
    per_stratum: int,
    stratum_cols: list[str],
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    salt_shards: int = 32,
) -> DataFrame:
    """At most ``per_stratum`` rows per distinct ``stratum_cols``
    tuple, selected by hash rank (deterministic, layout-independent,
    id tiebreak).  The balanced-corpus primitive: equal per-language
    document budgets regardless of raw-language skew.

    Skew-safe by default: the two-phase hash-rank prefix (module
    docstring) keeps a stratum holding half the corpus from
    serializing on one reducer; ``salt_shards=0`` forces the plain
    single window.  Both plans return identical rows."""
    if per_stratum < 1:
        raise ValueError(f"per_stratum must be >= 1, got {per_stratum}")
    return _hash_rank_prefix(
        df, per_stratum, stratum_cols, id_col, salt, salt_shards
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    stratum_cols: list[str],
    token_col: str,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    salt_shards: int = 32,
    assume_min_tokens: int = 1,
) -> DataFrame:
    """Fill each stratum up to a TOKEN budget, not a document count —
    the unit training runs are actually specified in.

    Documents are taken in hash order (deterministic,
    layout-independent, same ordering as :func:`stratified_sample`)
    while the running token total stays ≤ ``budget``; the first
    document that would overflow the budget stops the stratum (and a
    single document larger than the whole budget is skipped with the
    rest, by the same rule).

    The cumulative sum is an inherently sequential prefix per stratum,
    so the skew guard here is a PRE-CAP: only the first
    ``budget // assume_min_tokens + 1`` documents in hash order can
    possibly fit (each kept doc contributes ≥ ``assume_min_tokens``
    tokens, and the cumsum of a row depends only on rows before it),
    and that prefix is computed with the two-phase skew-safe
    :func:`_hash_rank_prefix`.  With the default
    ``assume_min_tokens=1`` the cap is exact for any positive token
    counts; raise it to your corpus' true minimum doc length to
    tighten the cap (exact as long as every ``token_col`` ≥ it).
    ``salt_shards=0`` disables the pre-cap entirely (plain window).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if assume_min_tokens < 1:
        raise ValueError(f"assume_min_tokens must be >= 1, got {assume_min_tokens}")
    if salt_shards:
        # phase-1 superset only (exact=False): the cumsum filter below
        # is itself the exact cut.  Any phase-1-dropped row has ≥ cap
        # same-shard rows before it, hence global hash rank > cap, and
        # every row ranked > cap has true cumsum ≥ cap·assume_min_tokens
        # > budget — so dropped rows could never have been kept, and no
        # surviving row's cumsum is understated within the kept range.
        cap = budget // assume_min_tokens + 1
        df = _hash_rank_prefix(
            df, cap, stratum_cols, id_col, salt, salt_shards, exact=False
        )
    w = (
        Window.partitionBy(*stratum_cols)
        .orderBy(_hash_bucket(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum", F.sum(F.col(token_col)).over(w))
        .where(F.col("_cum") <= budget)
        .drop("_cum")
    )
