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

from osm_pt_validator_spark.functions.geo import DEFAULT_RES, cell, kring_cells
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
