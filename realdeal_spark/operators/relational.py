"""Set-based relational operators from the reference's inventory.

Each function is a thin, well-typed composition of DataFrame
primitives — Catalyst plans them (broadcast vs shuffle, pushdown)
so there is deliberately no hand-scheduling here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def find_new(
    incoming: DataFrame,
    existing: DataFrame,
    key_columns: list[str],
    broadcast_existing: bool = False,
) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing``.

    The reference loads *every* existing key into a driver-side set
    and probes per record (find_new_properties.py:20-52 — O(table)
    driver memory).  Set-based it is a left-anti join; with
    ``broadcast_existing`` the key projection is broadcast (what the
    reference's in-memory set actually was), otherwise AQE decides.
    """
    keys = existing.select(*key_columns).distinct()
    if broadcast_existing:
        keys = F.broadcast(keys)
    return incoming.join(keys, on=key_columns, how="left_anti")


def latest_per_key(
    df: DataFrame,
    key_columns: list[str],
    order_columns: list[str],
) -> DataFrame:
    """The max-order-tuple row per key (A1 ordered dedup,
    dedupe_properties.py:11-27).  max_by aggregation → partial
    aggregation map-side, no full-sort window."""
    ordert = F.struct(*[F.col(c) for c in order_columns])
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*key_columns)
        .agg(F.max_by(row, ordert).alias("_row"))
        .select("_row.*")
    )


def top_k_per_key(
    df: DataFrame,
    key_columns: list[str],
    order_columns: list[str],
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per key by the order tuple (rank window).

    For k=1 prefer :func:`latest_per_key` (agg beats window).  The
    window shuffles by key; at scale with heavy skew, pre-aggregate
    or salt before calling.
    """
    order = [F.desc(c) if descending else F.asc(c) for c in order_columns]
    w = Window.partitionBy(*key_columns).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
