"""Zonal statistics and grid-density hotspot clustering.

Two classic geospatial rollups the reference's heatmap family
(pkg/validation verdicts -> tiles) stops short of:

* :func:`zonal_stats` — aggregate a point table per containing polygon
  (count / sum / avg of a value column). Containment is the ray-cast
  PIP operator (spatial/pip.py), so the join is cell-cover candidates
  -> exact crossing test, never point × polygon cartesian.

* :func:`hotspot_clusters` — density clustering of points on the grid
  (DBSCAN with eps = one cell, minPts = min_count, on cell granularity):
  cells with at least ``min_count`` points are "core"; core cells that
  touch (8-neighborhood) merge into one cluster via the iterative
  min-label connected-components operator (operators/clusters.py).
  100 TB shape: the corpus collapses to the hot-cell table in ONE
  map-side-combining aggregation; everything after runs on cells, whose
  cardinality is bounded by the grid, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.geo import (
    DEFAULT_RES,
    cell,
    haversine_m,
    kring_cells,
)
from osm_pt_validator_spark.operators.clusters import connected_components
from osm_pt_validator_spark.spatial.pip import points_in_polygons


def zonal_stats(
    points: DataFrame,
    polygons: DataFrame,
    value_col: str | None = None,
    res: int = DEFAULT_RES,
    point_id: str = "point_id",
    broadcast_polygons: bool = True,
) -> DataFrame:
    """Per-polygon aggregate of the contained points.

    Output: polygon_id, n_points, and (when ``value_col`` given)
    value_sum / value_avg. Polygons with zero contained points do not
    appear (inner containment semantics).
    """
    assigned = points_in_polygons(
        points, polygons, res=res, point_id=point_id,
        broadcast_polygons=broadcast_polygons,
    ).select("polygon_id", "point_id")
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if value_col is not None:
        assigned = assigned.join(
            points.select(F.col(point_id).alias("point_id"), value_col), "point_id"
        )
        aggs += [
            F.sum(value_col).alias("value_sum"),
            F.avg(value_col).alias("value_avg"),
        ]
    return assigned.groupBy("polygon_id").agg(*aggs)


def hotspot_clusters(
    points: DataFrame,
    res: int = DEFAULT_RES,
    min_count: int = 2,
    lat: str = "lat",
    lon: str = "lon",
    max_iter: int = 50,
) -> DataFrame:
    """Grid-DBSCAN: clusters of 8-neighbor-adjacent cells that each
    hold >= ``min_count`` points.

    Output: (cluster_id, n_cells, n_points) — cluster_id is the
    minimum member cell id (deterministic; a recursive-CTE oracle
    computes the same fixpoint). Isolated hot cells are their own
    singleton cluster.
    """
    hot = (
        points.select(cell(F.col(lat), F.col(lon), res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .persist()  # reused: both edge endpoints + the stats join below
    )
    nbrs = hot.select(
        "cell", F.explode(kring_cells(F.col("cell"), 1, res)).alias("nbr")
    ).filter(F.col("nbr") != F.col("cell"))
    edges = nbrs.join(
        hot.select(F.col("cell").alias("nbr")), "nbr", "left_semi"
    )
    # min-label CC converges in graph-DIAMETER hops; grid blobs can be
    # long and thin, so the ceiling is higher than doc-dedup's default
    labels = connected_components(edges, src="cell", dst="nbr", max_iter=max_iter)
    out = (
        hot.join(labels, hot["cell"] == labels["node"], "left")
        .select(
            F.coalesce(F.col("component"), F.col("cell")).alias("cluster_id"),
            "cell",
            "n",
        )
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_cells"), F.sum("n").alias("n_points"))
    )
    return out


def zone_geometry(
    polygons: DataFrame,
    polygon_id: str = "polygon_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """Per-polygon geometry profile — vertex count, shoelace area,
    haversine perimeter, vertex centroid — the vector-side rollup that
    pairs with zonal_stats (points per zone) and tile_bounds (raster ->
    vector): zone density = n_points / area needs this table.

    Determinism contract: vertices are quantized to integer
    micro-degrees FIRST, so the shoelace cross terms and their sum are
    exact int64 arithmetic (order-independent — a float shoelace sum
    would depend on vertex order of evaluation across engines). The
    perimeter quantizes each edge's haversine to mm before summing, so
    the total is again an integer sum. area2_udeg2 is TWICE the planar
    signed area, absolute value, in (micro-degree)^2 — callers scale by
    cos(lat) for meters; keeping the raw integer avoids baking a
    projection choice into the operator.

    Pure column algebra over the vertex arrays (zip of shifted slices)
    — no explode, no shuffle: one projection per polygon row.
    """
    n = F.size(F.col(xs_col))
    xi = F.transform(F.col(xs_col), lambda x: F.round(x * 1e6).cast("long"))
    yi = F.transform(F.col(ys_col), lambda y: F.round(y * 1e6).cast("long"))
    # next-vertex arrays: rotate left by one (edge a -> a+1, last -> 0)
    rot = lambda a: F.concat(F.slice(a, 2, n - 1), F.slice(a, 1, 1))  # noqa: E731
    quads = F.arrays_zip(
        xi.alias("x"), yi.alias("y"), rot(xi).alias("xn"), rot(yi).alias("yn")
    )
    cross = F.aggregate(
        quads,
        F.lit(0).cast("long"),
        lambda acc, t: acc + (t["x"] * t["yn"] - t["xn"] * t["y"]),
    )
    edges = F.arrays_zip(
        F.col(ys_col).alias("y1"),
        F.col(xs_col).alias("x1"),
        rot(F.col(ys_col)).alias("y2"),
        rot(F.col(xs_col)).alias("x2"),
    )
    per_mm = F.aggregate(
        edges,
        F.lit(0).cast("long"),
        lambda acc, e: acc
        + F.round(
            haversine_m(e["y1"], e["x1"], e["y2"], e["x2"]) * 1000.0
        ).cast("long"),
    )
    sum_long = lambda a: F.aggregate(  # noqa: E731
        a, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    # integer division truncating toward zero — matches DuckDB's `//`
    # and Spark SQL's `div` (Column API has no integer-div operator);
    # (a - a%b) is exactly divisible, so the double division is exact
    tdiv = lambda a, b: ((a - a % b) / b).cast("long")  # noqa: E731
    return polygons.select(
        F.col(polygon_id),
        n.cast("int").alias("n_vertices"),
        F.abs(cross).alias("area2_udeg2"),
        per_mm.alias("perimeter_mm"),
        tdiv(sum_long(xi), n).alias("centroid_lon_udeg"),
        tdiv(sum_long(yi), n).alias("centroid_lat_udeg"),
    )
