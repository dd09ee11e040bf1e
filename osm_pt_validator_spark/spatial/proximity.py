"""Stop-to-route proximity: point-to-polyline distance, set-based.

The north-star check the reference implies but never computes directly
(it infers proximity violations from ordering): is every stop/platform
member within ``max_m`` meters of the polyline formed by its route's
way members?  (Reference context: pkg/validation/route_relation.go
orders stops against way geometry; this operator answers the metric
question those orderings presuppose.)

Shape for 100 TB:

* ``segments_from_polylines`` — posexplode + one window ``lead`` per
  polyline key: one shuffle keyed by the polyline id, output one row
  per segment.  No Python.
* ``point_to_segment_m`` — closed-form equirectangular projection
  (exact enough at stop-to-route scales, < 0.1% error under 10 km)
  entirely in column algebra: codegen, vectorized, SQL-replayable.
* ``stop_route_proximity`` — equi-join stops x segments on the route
  key (shuffle hash join on route_id; per-route blowup is bounded by
  members-per-route, the same bound the validation automaton already
  carries), partial-agg ``min`` map-side, one row per stop.

The join is never all-pairs: stops only meet segments of their OWN
route.  Skewed mega-routes can reuse spatial/joins.py salting, but a
route's member count is bounded (OSM caps relation size in practice),
so the default plan is the right one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_R_M = 6371000.0


def segments_from_polylines(
    points: DataFrame,
    line_key: str,
    seq_col: str,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(line_key, seq, lat, lon) vertex rows -> one row per segment
    (line_key, seg_idx, lat1, lon1, lat2, lon2).

    ONE shuffle (the window partition by line_key); the trailing
    vertex of each line drops out via the lead-null filter.
    """
    w = Window.partitionBy(line_key).orderBy(seq_col)
    return (
        points.select(
            line_key,
            F.col(seq_col).alias("seg_idx"),
            F.col(lat).alias("lat1"),
            F.col(lon).alias("lon1"),
            F.lead(lat).over(w).alias("lat2"),
            F.lead(lon).over(w).alias("lon2"),
        )
        .filter(F.col("lat2").isNotNull())
    )


def point_to_segment_m(
    plat: Column, plon: Column,
    lat1: Column, lon1: Column,
    lat2: Column, lon2: Column,
) -> Column:
    """Meters from point P to segment AB, equirectangular projection
    centered on A's latitude.  Pure column algebra (no UDF): project
    to a local tangent plane, clamp the parametric foot t to [0, 1],
    return the Euclidean distance to the clamped foot.  Degenerate
    segments (A == B) fall out naturally via the t=0 clamp guard.
    """
    coslat = F.cos(F.radians(lat1))
    ax = F.lit(0.0)
    ay = F.lit(0.0)
    bx = F.radians(lon2 - lon1) * coslat * EARTH_R_M
    by = F.radians(lat2 - lat1) * EARTH_R_M
    px = F.radians(plon - lon1) * coslat * EARTH_R_M
    py = F.radians(plat - lat1) * EARTH_R_M
    seg2 = bx * bx + by * by
    t_raw = F.when(seg2 > 0.0, (px * bx + py * by) / seg2).otherwise(F.lit(0.0))
    t = F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    dx = px - (ax + t * bx)
    dy = py - (ay + t * by)
    return F.sqrt(dx * dx + dy * dy)


def stop_route_proximity(
    stops: DataFrame,
    segments: DataFrame,
    route_key: str,
    stop_key: str,
    max_m: float,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Min distance from each stop to its route's polyline + verdict.

    stops:    (route_key, stop_key, lat, lon)
    segments: (route_key, seg_idx, lat1, lon1, lat2, lon2)
    Output:   (route_key, stop_key, dist_m, too_far)

    Equi-join on route_key only (never cartesian across routes); the
    min() aggregates map-side before the final shuffle, so the
    exchange carries one row per (route, stop), not per candidate
    segment pair.
    """
    d = point_to_segment_m(
        F.col("__plat"), F.col("__plon"),
        F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"),
    )
    pairs = (
        stops.select(
            route_key,
            stop_key,
            F.col(lat).alias("__plat"),
            F.col(lon).alias("__plon"),
        )
        .join(segments, route_key)
        .select(route_key, stop_key, d.alias("__d"))
    )
    return (
        pairs.groupBy(route_key, stop_key)
        .agg(F.min("__d").alias("dist_m"))
        .withColumn("too_far", F.col("dist_m") > F.lit(max_m))
    )
