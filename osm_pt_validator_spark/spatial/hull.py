"""Per-group convex hull (service-area polygon of a stop/point set).

Pairs with zone_geometry (area/perimeter of the hull ring) and
cell_polyfill (rasterize the hull): given each route's stops, the hull
is the service-area polygon map products and coverage QA draw.

Engine class: Andrew's monotone chain is a data-dependent stack
algorithm (each accepted vertex can pop arbitrarily many predecessors)
— NOT expressible as a bounded column-algebra fold, which puts it with
the frontier automaton (way_order.py) and Douglas-Peucker
(simplify.py): Python at the GROUP level, numpy-sorted input, Arrow
batches. One shuffle (groupBy collect_list); per-group cost is bounded
by points-per-group, the same bound those operators carry.

Determinism: coordinates quantize to integer micro-degrees FIRST; the
chain sorts lexicographically by (x, y) and pops on integer cross
products with `<= 0` (strictly convex hull — collinear edge interiors
are NOT vertices), so the hull is unique and identical under any
partitioning or input order. Output starts at the lexicographically
smallest vertex and winds counter-clockwise.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.geo import udeg


def monotone_chain(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Strict convex hull of integer (x, y) points, CCW from the
    lexicographic minimum. Duplicates tolerated. len<=2 inputs return
    their distinct sorted points."""
    p = sorted(set(pts))
    if len(p) <= 2:
        return p

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[tuple[int, int]] = []
    for q in p:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], q) <= 0:
            lower.pop()
        lower.append(q)
    upper: list[tuple[int, int]] = []
    for q in reversed(p):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], q) <= 0:
            upper.pop()
        upper.append(q)
    return lower[:-1] + upper[:-1]


def convex_hull(
    points: DataFrame,
    group_key: str,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(group_key, hull_seq, x_udeg, y_udeg) — the CCW hull vertices of
    each group's point set, exploded one row per vertex."""
    slim = points.select(
        group_key,
        udeg(F.col(lon)).alias("__x"),
        udeg(F.col(lat)).alias("__y"),
    )
    grouped = slim.groupBy(group_key).agg(
        F.collect_list(F.struct("__x", "__y")).alias("__pts")
    )
    # the key keeps its INPUT type (string route ids work, matching
    # simplify_polylines' contract) — derive it, don't hardcode long
    key_type = points.schema[group_key].dataType.simpleString()
    out_schema = (
        f"{group_key} {key_type}, hull_seq int, x_udeg long, y_udeg long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g, pts in zip(pdf[group_key], pdf["__pts"]):
                hull = monotone_chain(
                    [(int(s["__x"]), int(s["__y"])) for s in pts]
                )
                rows.extend(
                    (g, i, x, y) for i, (x, y) in enumerate(hull)
                )
            yield pd.DataFrame(
                rows, columns=[group_key, "hull_seq", "x_udeg", "y_udeg"]
            )

    return grouped.mapInPandas(run, schema=out_schema)
