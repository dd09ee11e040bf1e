"""G8: raster<->vector tile assignment + failure heatmap.

Web-mercator (slippy) z/x/y tile math is pure column algebra
(functions/geo.py tile_x/tile_y); the heatmap is a plain
groupBy(z, x, y) count — partial aggregation (map-side combine) makes
this scale linearly, and the output is tiny (bounded by 4^z).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.geo import tile_x, tile_y


def assign_tiles(df: DataFrame, z: int, lat: str = "lat", lon: str = "lon") -> DataFrame:
    return df.withColumn("tile_z", F.lit(z)).withColumn(
        "tile_x", tile_x(F.col(lon), z)
    ).withColumn("tile_y", tile_y(F.col(lat), z))


def failure_heatmap(points: DataFrame, z: int, lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Tile-bucketed counts — e.g. of validation failures located at
    their stop coordinates."""
    return (
        assign_tiles(points, z, lat, lon)
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def verdict_failure_heatmap(
    verdicts: DataFrame, nodes: DataFrame, z: int
) -> DataFrame:
    """North-star heatmap: validation failures located at the stop
    coordinates embedded in their verdict URLs.

    Verdict messages carry the canonical element URL
    (https://www.openstreetmap.org/node/<id>); node-shaped URLs are
    parsed back to ids, joined to the nodes dim (broadcast when small),
    and tiled. Way-shaped verdicts have no point geometry and are
    excluded (corridor-level rollups use PIP, spatial/pip.py).
    """
    node_id = F.regexp_extract(
        F.col("url"), r"https://www\.openstreetmap\.org/node/(\d+)", 1
    )
    located = (
        verdicts.filter(node_id != "")
        .withColumn("node_id", node_id.cast("long"))
        .join(nodes.select("node_id", "lat", "lon"), "node_id")
    )
    return failure_heatmap(located, z)
