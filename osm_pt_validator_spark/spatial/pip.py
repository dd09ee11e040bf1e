"""G6: point-in-polygon (ray casting) for route-corridor containment.

Polygons table: (polygon_id LONG, xs ARRAY<DOUBLE> (lon), ys
ARRAY<DOUBLE> (lat)) — open rings (last vertex != first; closing edge
implied).

Plan: candidate pairs come from a coarse cell join against each
polygon's bbox cell cover (set algebra, pushdown-friendly), then the
exact even-odd crossing test runs vectorized (numpy, points × edges)
inside one applyInPandas pass grouped by polygon. Shuffle key =
polygon_id; parallelism = number of polygons × cell-limited candidate
sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.geo import DEFAULT_RES, cell_i, cell_j


def polygon_cell_cover(polygons: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """(polygon_id, cell) for every grid cell intersecting the
    polygon's bbox — coarse but safe cover, pure column algebra."""
    i_min = cell_i(F.array_min("ys"), res)
    i_max = cell_i(F.array_max("ys"), res)
    j_min = cell_j(F.array_min("xs"), res)
    j_max = cell_j(F.array_max("xs"), res)
    cells = F.flatten(
        F.transform(
            F.sequence(i_min, i_max),
            lambda i: F.transform(
                F.sequence(j_min, j_max),
                lambda j: F.shiftleft(i, 32).bitwiseOR(j),
            ),
        )
    )
    return polygons.select("polygon_id", F.explode(cells).alias("cell"))


def _ray_cast(pdf: pd.DataFrame) -> pd.DataFrame:
    """Even-odd crossing count, numpy over (points, edges)."""
    xs = np.asarray(pdf["xs"].iloc[0], dtype=np.float64)
    ys = np.asarray(pdf["ys"].iloc[0], dtype=np.float64)
    px = pdf["lon"].to_numpy(dtype=np.float64)
    py = pdf["lat"].to_numpy(dtype=np.float64)

    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    # edge straddles the horizontal ray through py?
    py_b = py[:, None]
    straddle = (y1[None, :] > py_b) != (y2[None, :] > py_b)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at_y = x1[None, :] + (py_b - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
            x2[None, :] - x1[None, :]
        )
    crossings = (straddle & (px[:, None] < x_at_y)).sum(axis=1)
    inside = (crossings % 2) == 1

    out = pdf[["polygon_id", "point_id", "lat", "lon"]].copy()
    out["inside"] = inside
    return out[out["inside"]].drop(columns=["inside"])


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    res: int = DEFAULT_RES,
    point_id: str = "point_id",
) -> DataFrame:
    """(polygon_id, point_id, lat, lon) for contained points."""
    from osm_pt_validator_spark.functions.geo import cell

    cover = polygon_cell_cover(polygons, res)
    candidates = (
        points.withColumn("cell", cell(F.col("lat"), F.col("lon"), res))
        .join(cover, "cell", "inner")
        .select("polygon_id", F.col(point_id).alias("point_id"), "lat", "lon")
        .join(polygons.select("polygon_id", "xs", "ys"), "polygon_id")
    )
    return candidates.groupBy("polygon_id").applyInPandas(
        _ray_cast, schema="polygon_id long, point_id long, lat double, lon double"
    )
