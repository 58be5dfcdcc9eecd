"""Z-order (Morton) clustering for multi-column data skipping.

The lake's base files already carry a single-column write sort
(``compact(sort_by=...)``), which makes row groups monotone in one
dimension: a pushed parquet predicate on that column prunes row
groups, but a predicate on any *other* column still reads the whole
file.  Z-ordering interleaves the bits of several columns' ranks so
row groups are tight in every z-ordered dimension at once — the same
trade Delta Lake's ``OPTIMIZE ZORDER BY`` and Iceberg's z-order
rewrite make (each column's individual clustering loosens a little,
all columns become prunable).

Scope note: this table is hash-bucketed by key, so *file-level*
min/max over a bucket spans the full value range no matter how rows
are ordered inside the file — z-order's win here is row-group-level
pruning via the pushed parquet predicate (footer min/max per row
group), not manifest-level file skipping.  That is exactly where it
matters at 100 TB: a 1 GB base file has ~8 row groups at the default
128 MB block, and a 2-D z-order lets a selective predicate on either
dimension skip ~sqrt-fraction of them instead of none.

Mechanics (all JVM-side expressions, no UDFs, no extra shuffle):

1. :func:`zorder_boundaries` — one sampling pass (``approxQuantile``)
   collects ``2^bits - 1`` equi-depth cut points per column to the
   driver.  Equi-depth (not min/max equi-width) keeps skewed columns
   from collapsing into a handful of cells — the same reason Spark's
   own RangePartitioner samples.
2. :func:`zorder_expr` — per row: rank each column against its cut
   points (a compact ``F.aggregate`` fold over a literal array — the
   same bounded-expression-tree pattern as the LSH planes), then
   interleave the rank bits into one long.  Nulls rank 0 (sort
   first), matching the null-first semantics of a plain sort.
3. The z value is passed to the writer as a *sort expression only*
   (``sortWithinPartitions`` accepts Columns) — it is never
   materialized into the parquet files or the schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: orderable-to-double types we can rank; strings are excluded for the
#: same reason file stats exclude them (truncated parquet stats, and
#: collation pitfalls), binary/arrays are not meaningfully orderable.
_ZORDER_CASTABLE = ("int", "bigint", "smallint", "tinyint", "float", "double",
                    "date", "timestamp", "timestamp_ntz", "decimal")


def _zorder_eligible(type_str: str) -> bool:
    return type_str.startswith(_ZORDER_CASTABLE)


def zorder_boundaries(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    relative_error: float = 0.001,
) -> dict[str, list[float]]:
    """Equi-depth cut points (``2^bits - 1`` per column) in one
    sampling pass over ``df``.

    All columns are quantiled together (one job); timestamps/dates are
    ranked through their epoch-seconds double cast, which preserves
    order.  The driver holds ``len(cols) * (2^bits - 1)`` floats —
    constants folded into the rank expression, never a join."""
    if not 1 <= bits <= 12:
        raise ValueError(f"bits must be in 1..12, got {bits}")
    for c in cols:
        t = dict(df.dtypes).get(c)
        if t is None:
            raise ValueError(f"no such column: {c}")
        if not _zorder_eligible(t):
            raise ValueError(f"cannot z-order column {c} of type {t}")
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    cast = df.select(
        *[F.col(c).cast("double").alias(f"_z_{i}") for i, c in enumerate(cols)]
    )
    qs = cast.approxQuantile(
        [f"_z_{i}" for i in range(len(cols))], probs, relative_error
    )
    # dedupe repeated cut points (low-cardinality columns) — the rank
    # expression is monotone either way, dedupe just shrinks the fold
    out: dict[str, list[float]] = {}
    for c, q in zip(cols, qs):
        seen: list[float] = []
        for v in q:
            if not seen or v > seen[-1]:
                seen.append(v)
        out[c] = seen
    return out


def _rank_expr(col: Column, cuts: list[float]) -> Column:
    """Equi-depth rank: how many cut points the value exceeds.
    Null → 0 (nulls first, like a plain ascending sort)."""
    bnd = F.array(*[F.lit(float(b)) for b in cuts])
    v = col.cast("double")
    return F.aggregate(
        bnd,
        F.lit(0),
        lambda acc, b: acc + F.when(v > b, 1).otherwise(0),
    )


def zorder_expr(
    cols: list[str], boundaries: dict[str, list[float]], bits: int = 8
) -> Column:
    """Morton code of the columns' equi-depth ranks — one long, built
    from shifts/ands on the rank ints; sort by it to z-cluster."""
    n = len(cols)
    if bits * n > 63:
        # JVM shiftleft wraps the shift count mod 64, so bit positions
        # ≥63 would silently corrupt the Morton code (63 is the sign
        # bit).  Clamp the per-column bit depth so the code stays
        # inside a positive long; clustering quality degrades
        # gracefully instead of silently breaking.
        bits = 63 // n
        if bits < 1:
            raise ValueError(
                f"zorder_expr: {n} columns cannot share a 63-bit Morton "
                "code; reduce the column list"
            )
    ranks = [_rank_expr(F.col(c), boundaries[c]) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, b * n + i)
    return z
