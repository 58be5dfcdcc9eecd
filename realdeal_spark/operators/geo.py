"""Geo enrichment operators (SURVEY §2.3 J5/J6).

The reference reverse-geocodes each row against Nominatim, one HTTP
call per record with retries (realdeal/luigi/update_address_data.py:
16-24,38-71), and point-in-polygon-matches zip polygons with shapely
(scrape_craigslist_rentals.ipynb, ``ZipGeoCoder.zip_code``).  In the
engine both become network-free, deterministic, set-based joins:

- :func:`grid_geocode_join` — reverse geocode as a **broadcast
  lookup join** against a region grid table: each point maps to a
  grid cell (pure column arithmetic), the cell joins to region
  attributes.  This is the general shape of any geo enrichment at
  scale — precompute a cell→attributes table once, broadcast it,
  never call per row.
- :func:`point_in_polygon_join` — exact polygon containment, planned
  as broadcast-grid candidate pruning + a vectorized ray-casting
  pandas UDF for the exact test (shapely isn't in this container; the
  even-odd rule over Arrow batches is dependency-free and
  deterministic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


def grid_cell_expr(lat, lon, cell_deg: float = 0.1):
    """Deterministic grid-cell id for a (lat, lon) — the join key of
    the broadcast geocode lookup."""
    la = F.floor(lat / F.lit(cell_deg)).cast("long")
    lo = F.floor(lon / F.lit(cell_deg)).cast("long")
    return la * 100000 + lo


def grid_geocode_join(
    points: DataFrame,
    grid: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str = "cell_id",
    cell_deg: float = 0.1,
) -> DataFrame:
    """Left-join each point to its grid cell's attributes (J5).

    ``grid`` is the small side by construction (cells, not points) —
    broadcast explicitly so 10^10 points never shuffle."""
    keyed = points.withColumn(
        cell_col, grid_cell_expr(F.col(lat_col), F.col(lon_col), cell_deg)
    )
    return keyed.join(F.broadcast(grid), on=cell_col, how="left")


def _ray_cast(px: float, py: float, xs: list, ys: list) -> bool:
    """Even-odd rule point-in-polygon (pure, deterministic)."""
    inside = False
    n = len(xs)
    j = n - 1
    for i in range(n):
        if (ys[i] > py) != (ys[j] > py):
            x_at = xs[i] + (py - ys[i]) * (xs[j] - xs[i]) / (ys[j] - ys[i])
            if px < x_at:
                inside = not inside
        j = i
    return inside


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    poly_id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
    cell_deg: float = 1.0,
) -> DataFrame:
    """Points → containing polygon id (J6), exact.

    Plan shape: polygons (small side: thousands per deployment,
    points are billions) are exploded to the grid cells covering
    their bounding box, broadcast, and **equi-joined** on the point's
    cell id — a BroadcastHashJoin, so each point is tested only
    against polygons whose bbox overlaps its cell instead of every
    polygon (the bbox-θ-join alternative is a
    BroadcastNestedLoopJoin: ~1000× more candidate pairs at 1000s of
    polygons).  The bbox predicate then prunes within-cell
    candidates JVM-side, and the exact even-odd ray cast runs as an
    Arrow-batched pandas UDF on the survivors only.

    ``cell_deg`` trades broadcast size for candidate selectivity:
    each polygon produces ``O((bbox/cell_deg)²)`` cell rows; pick it
    near the typical polygon bbox edge so most polygons cover O(1)
    cells and most cells hold O(1) polygons.
    """
    polys = polygons.select(
        poly_id_col,
        F.col(xs_col).cast("array<double>").alias("_xs"),
        F.col(ys_col).cast("array<double>").alias("_ys"),
        F.array_min(xs_col).alias("_xmin"),
        F.array_max(xs_col).alias("_xmax"),
        F.array_min(ys_col).alias("_ymin"),
        F.array_max(ys_col).alias("_ymax"),
    )
    # explode each polygon to its covering cells; a point joins via its
    # single cell, so every (point, polygon) pair matches at most once
    cells = (
        polys.withColumn(
            "_cla",
            F.explode(
                F.sequence(
                    F.floor(F.col("_ymin") / F.lit(cell_deg)).cast("long"),
                    F.floor(F.col("_ymax") / F.lit(cell_deg)).cast("long"),
                )
            ),
        )
        .withColumn(
            "_clo",
            F.explode(
                F.sequence(
                    F.floor(F.col("_xmin") / F.lit(cell_deg)).cast("long"),
                    F.floor(F.col("_xmax") / F.lit(cell_deg)).cast("long"),
                )
            ),
        )
        .withColumn("_cell", F.col("_cla") * 100000 + F.col("_clo"))
        .drop("_cla", "_clo")
    )

    @pandas_udf(BooleanType())
    def contains(
        batches: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        for px, py, xs, ys in batches:
            yield pd.Series(
                [
                    _ray_cast(px.iloc[i], py.iloc[i], xs.iloc[i], ys.iloc[i])
                    for i in range(len(px))
                ]
            )

    keyed = points.withColumn(
        "_cell", grid_cell_expr(F.col(lat_col), F.col(lon_col), cell_deg)
    )
    cand = keyed.join(F.broadcast(cells), on="_cell", how="inner").where(
        (F.col(lon_col) >= F.col("_xmin"))
        & (F.col(lon_col) <= F.col("_xmax"))
        & (F.col(lat_col) >= F.col("_ymin"))
        & (F.col(lat_col) <= F.col("_ymax"))
    )
    return (
        cand.where(contains(F.col(lon_col), F.col(lat_col), F.col("_xs"), F.col("_ys")))
        .drop("_cell", "_xs", "_ys", "_xmin", "_xmax", "_ymin", "_ymax")
    )
