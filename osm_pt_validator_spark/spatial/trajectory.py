"""Trajectory operators: co-traversed segment detection and per-path
turn/tortuosity profiles.

The reference validates ONE route's geometry at a time (way ordering,
pkg/validation/route_relation.go; oneway traversal, way_order.go). A
fleet-scale engine also needs the cross-trajectory questions: which
street segments do many routes/users traverse (corridor detection — the
set version of the reference's shared-way checks), and which paths
zigzag or double back (the geometric smell its ordering verdicts
surface one relation at a time).

Both operators share one physical shape:

  points --(ONE map-side-combined shuffle on traj_id)--> sorted
  per-trajectory vertex array --> pure array algebra (folds / zips /
  slices, all whole-stage codegen) --> per-segment or per-trajectory
  rollup.

Vertices are quantized to integer micro-degrees at collection time, so
segment identity, cross products, and dot products are EXACT int64
arithmetic — no float comparison anywhere in the hot path.

100 TB shape: the traj_id shuffle is the only data-volume shuffle and
partial-aggregates map-side (collect_list combiner); the segment rollup
of :func:`shared_segments` is a map-side-combining count on the
segment key, so hot corridors (skewed keys) reduce before the exchange.
If the corpus is already bucketed by traj_id (spatial/layout.py), the
first shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.geo import haversine_m, udeg

_UD = 1e6  # micro-degrees per degree


def _paths(
    points: DataFrame,
    traj_id: str,
    order_cols: list[str],
    lat: str,
    lon: str,
) -> DataFrame:
    """(traj_id, p) — p the time-sorted array of (order..., la, lo)
    structs with µdeg integer coordinates. One shuffle."""
    slim = points.select(
        F.col(traj_id),
        F.struct(
            *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
            udeg(F.col(lat)).alias("la"),
            udeg(F.col(lon)).alias("lo"),
        ).alias("__pt"),
    )
    return slim.groupBy(traj_id).agg(
        F.array_sort(F.collect_list("__pt")).alias("p")
    )


def shared_segments(
    points: DataFrame,
    traj_id: str,
    order_cols: list[str],
    lat: str = "lat",
    lon: str = "lon",
    min_trajs: int = 2,
) -> DataFrame:
    """Segments (consecutive vertex pairs) traversed by at least
    ``min_trajs`` distinct trajectories.

    Segment identity is direction-agnostic: endpoints are sorted
    lexicographically by (la, lo), so A->B and B->A are the same
    corridor. Zero-length segments (consecutive identical vertices)
    are dropped; a trajectory traversing one segment many times
    counts ONCE (array_distinct before the explode — the distinct runs
    inside the row, so the segment rollup needs no count-distinct
    shuffle, a plain map-side-combining count is exact).

    Output: (la1, lo1, la2, lo2, n_trajs) with µdeg integer endpoints.
    """
    paths = _paths(points, traj_id, order_cols, lat, lon)
    m = F.size(F.col("p"))
    cur = F.slice(F.col("p"), 1, F.greatest(F.lit(0), m - 1))
    nxt = F.slice(F.col("p"), 2, F.greatest(F.lit(0), m - 1))

    def canon(a: Column, b: Column) -> Column:
        fwd = (a["la"] < b["la"]) | ((a["la"] == b["la"]) & (a["lo"] <= b["lo"]))
        return F.when(
            fwd,
            F.struct(
                a["la"].alias("la1"), a["lo"].alias("lo1"),
                b["la"].alias("la2"), b["lo"].alias("lo2"),
            ),
        ).otherwise(
            F.struct(
                b["la"].alias("la1"), b["lo"].alias("lo1"),
                a["la"].alias("la2"), a["lo"].alias("lo2"),
            )
        )

    segs = F.array_distinct(
        F.filter(
            F.zip_with(cur, nxt, canon),
            lambda s: (s["la1"] != s["la2"]) | (s["lo1"] != s["lo2"]),
        )
    )
    return (
        paths.select(F.explode(segs).alias("s"))
        .select("s.la1", "s.lo1", "s.la2", "s.lo2")
        .groupBy("la1", "lo1", "la2", "lo2")
        .agg(F.count(F.lit(1)).alias("n_trajs"))
        .filter(F.col("n_trajs") >= min_trajs)
    )


def turn_profile(
    points: DataFrame,
    traj_id: str,
    order_cols: list[str],
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-trajectory geometric profile: turn counts (exact integer
    cross/dot products on µdeg vectors), path length vs straight-line
    chord (mm-quantized haversine — same determinism contract as
    zone_geometry's perimeter).

    Consecutive duplicate vertices are collapsed first (a stationary
    ping is not a turn). For each interior vertex of the collapsed
    path, cross = dx1*dy2 - dy1*dx2 classifies the turn: >0 left, <0
    right, =0 with dot<0 a full reversal (the zigzag/doubling-back
    smell the reference's ordering verdicts surface per-relation),
    =0 with dot>0 straight-on.

    Output: (traj_id, n_points, n_left, n_right, n_straight,
    n_reversals, path_mm, chord_mm).
    """
    paths = _paths(points, traj_id, order_cols, lat, lon)
    pt_t = "struct<la:bigint,lo:bigint>"
    # collapse consecutive duplicates (compare COORDS only, not order
    # fields) — fold rebuilding the array
    ded = F.aggregate(
        F.col("p"),
        F.array().cast(f"array<{pt_t}>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1)["la"] == x["la"])
            & (F.element_at(acc, -1)["lo"] == x["lo"]),
            acc,
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(x["la"].alias("la"), x["lo"].alias("lo"))),
            )
        ),
    )
    d = paths.select(F.col(traj_id), ded.alias("d"))
    m = F.size(F.col("d"))
    seg_len = F.greatest(F.lit(0), m - 1)
    vecs = F.zip_with(
        F.slice(F.col("d"), 1, seg_len),
        F.slice(F.col("d"), 2, seg_len),
        lambda a, b: F.struct(
            (b["la"] - a["la"]).alias("dy"),
            (b["lo"] - a["lo"]).alias("dx"),
            a["la"].alias("la"), a["lo"].alias("lo"),
            b["la"].alias("la2"), b["lo"].alias("lo2"),
        ),
    )
    k = F.size(vecs)
    turns = F.zip_with(
        F.slice(vecs, 1, F.greatest(F.lit(0), k - 1)),
        F.slice(vecs, 2, F.greatest(F.lit(0), k - 1)),
        lambda u, w: F.struct(
            (u["dx"] * w["dy"] - u["dy"] * w["dx"]).alias("cross"),
            (u["dx"] * w["dx"] + u["dy"] * w["dy"]).alias("dot"),
        ),
    )
    nof = lambda pred: F.size(F.filter(turns, pred)).alias  # noqa: E731
    mm = lambda y1, x1, y2, x2: F.round(  # noqa: E731
        haversine_m(y1 / _UD, x1 / _UD, y2 / _UD, x2 / _UD) * 1000.0
    ).cast("long")
    path_mm = F.aggregate(
        vecs,
        F.lit(0).cast("long"),
        lambda acc, v: acc + mm(v["la"], v["lo"], v["la2"], v["lo2"]),
    )
    first, last = F.element_at(F.col("d"), 1), F.element_at(F.col("d"), -1)
    return d.select(
        F.col(traj_id),
        m.cast("int").alias("n_points"),
        nof(lambda t: t["cross"] > 0)("n_left"),
        nof(lambda t: t["cross"] < 0)("n_right"),
        nof(lambda t: (t["cross"] == 0) & (t["dot"] > 0))("n_straight"),
        nof(lambda t: (t["cross"] == 0) & (t["dot"] < 0))("n_reversals"),
        path_mm.alias("path_mm"),
        mm(first["la"], first["lo"], last["la"], last["lo"]).alias("chord_mm"),
    )


def od_flows(
    points: DataFrame,
    traj_id: str,
    order_cols: list[str],
    res: int = 16,
    lat: str = "lat",
    lon: str = "lon",
    min_moves: int = 1,
) -> DataFrame:
    """Origin-destination flow matrix at cell granularity: every
    consecutive point pair that CHANGES cell contributes one move —
    the aggregate movement picture (commuter flows, demand modeling)
    that individual trajectories feed.

    Directional (A->B and B->A are different flows — unlike
    shared_segments, which is corridor identity). Same physical shape
    as the other trajectory operators: one traj_id shuffle into sorted
    arrays, per-row zip for moves, map-side-combining count on the
    (from, to) key. Output: (cell_from, cell_to, n_moves).
    """
    from osm_pt_validator_spark.functions.geo import cell

    slim = points.select(
        F.col(traj_id),
        F.struct(
            *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
            cell(F.col(lat), F.col(lon), res).alias("c"),
        ).alias("__pt"),
    )
    paths = slim.groupBy(traj_id).agg(
        F.array_sort(F.collect_list("__pt")).alias("p")
    )
    m = F.size(F.col("p"))
    cur = F.slice(F.col("p"), 1, F.greatest(F.lit(0), m - 1))
    nxt = F.slice(F.col("p"), 2, F.greatest(F.lit(0), m - 1))
    moves = F.filter(
        F.zip_with(
            cur, nxt,
            lambda a, b: F.struct(
                a["c"].alias("cell_from"), b["c"].alias("cell_to")
            ),
        ),
        lambda s: s["cell_from"] != s["cell_to"],
    )
    return (
        paths.select(F.explode(moves).alias("mv"))
        .groupBy(F.col("mv.cell_from").alias("cell_from"), F.col("mv.cell_to").alias("cell_to"))
        .agg(F.count(F.lit(1)).alias("n_moves"))
        .filter(F.col("n_moves") >= min_moves)
    )
