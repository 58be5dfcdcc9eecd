"""Geo joins (J5/J6) and the driver-side HTML report (S12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realdeal_spark.operators.geo import (
    grid_geocode_join,
    point_in_polygon_join,
)
from realdeal_spark.report import render_html_report


def test_grid_geocode_join(spark):
    points = spark.createDataFrame(
        [(1, 37.75, -122.45), (2, 37.85, -122.25), (3, 0.0, 0.0)],
        "id bigint, lat double, lon double",
    )
    # grid cells for SF-ish and Oakland-ish coords at 0.1°
    grid = spark.createDataFrame(
        [
            (377 * 100000 + -1225, "San Francisco", "94114"),
            (378 * 100000 + -1223, "Oakland", "94607"),
        ],
        "cell_id bigint, city string, zipcode string",
    )
    out = {r["id"]: r for r in grid_geocode_join(points, grid).collect()}
    assert out[1]["city"] == "San Francisco"
    assert out[2]["city"] == "Oakland"
    assert out[3]["city"] is None  # cell with no region → left-join null


def test_point_in_polygon_join(spark):
    points = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 2.5, 0.5), (3, 10.0, 10.0), (4, 0.5, 0.99)],
        "id bigint, lon double, lat double",
    )
    # unit square and a triangle
    polys = spark.createDataFrame(
        [
            ("sq", [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
            ("tri", [2.0, 3.0, 2.5], [0.0, 0.0, 1.0]),
        ],
        "poly_id string, xs array<double>, ys array<double>",
    )
    out = point_in_polygon_join(
        points, polys, lat_col="lat", lon_col="lon"
    ).select("id", "poly_id")
    got = {(r["id"], r["poly_id"]) for r in out.collect()}
    assert got == {(1, "sq"), (4, "sq"), (2, "tri")}


def test_point_in_polygon_plan_is_cell_equi_join(spark):
    """The candidate join must be a BroadcastHashJoin on the grid
    cell id, not a BroadcastNestedLoopJoin over every polygon bbox
    (VERDICT r2 'What's wrong' #5)."""
    points = spark.createDataFrame(
        [(1, 0.5, 0.5)], "id bigint, lon double, lat double"
    )
    polys = spark.createDataFrame(
        [("sq", [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])],
        "poly_id string, xs array<double>, ys array<double>",
    )
    out = point_in_polygon_join(points, polys, lat_col="lat", lon_col="lon")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_point_in_polygon_cell_spanning(spark):
    """Polygons spanning multiple cells (and negative coords) still
    match points in every covered cell exactly once."""
    points = spark.createDataFrame(
        [(1, 0.2, 0.2), (2, 2.7, 1.9), (3, -1.5, -0.5), (4, 5.0, 5.0)],
        "id bigint, lon double, lat double",
    )
    # big rect spans cells (-2..3)×(-1..2) at cell_deg=1
    polys = spark.createDataFrame(
        [("big", [-2.0, 3.0, 3.0, -2.0], [-1.0, -1.0, 2.0, 2.0])],
        "poly_id string, xs array<double>, ys array<double>",
    )
    out = point_in_polygon_join(
        points, polys, lat_col="lat", lon_col="lon"
    ).select("id", "poly_id")
    got = sorted((r["id"], r["poly_id"]) for r in out.collect())
    assert got == [(1, "big"), (2, "big"), (3, "big")]


def test_render_html_report(spark):
    df = spark.createDataFrame(
        [(1, "a b", 1234.5, "http://x/1")],
        "id bigint, addr string, price double, link string",
    )
    h = render_html_report(
        df,
        columns={"price": "dollar", "link": "link", "id": "int"},
        title="Deals <today>",
    )
    assert "<h2>Deals &lt;today&gt;</h2>" in h
    assert "<td>$1,234.50</td>" in h
    assert '<a href="http://x/1">' in h
    assert "<th>addr</th>" in h
