"""G7: kNN stop matching — k-ring candidate generation + exact
haversine re-rank.

Plan shape: the probe side explodes its cell's k-ring (array algebra,
no shuffle), equi-joins the build side on cell (one shuffle; broadcast
when the build dim is small), computes exact haversine (JVM trig), and
keeps the top-k per probe row via a ranking window partitioned by the
probe key. Ties break on build id for determinism.

Recall note: a k-ring of radius r at resolution `res` guarantees all
neighbours within (r) cells; callers pick (res, ring) so the ring
covers their distance budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from osm_pt_validator_spark.functions.geo import (
    DEFAULT_RES,
    cell,
    haversine_m,
    kring_cells,
)


def knn_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str | list[str],
    build_key: str,
    k: int = 1,
    ring: int = 1,
    res: int = DEFAULT_RES,
    probe_lat: str = "lat",
    probe_lon: str = "lon",
    build_lat: str = "lat",
    build_lon: str = "lon",
    broadcast_build: bool = True,
    hot_threshold: int = 1_000_000,
    probe_partitions: int | None = None,
) -> DataFrame:
    """Top-k nearest build rows per probe row.

    probe_key must uniquely identify a probe ROW (pass a list for
    composite keys, e.g. ["url", "mention_idx"] for mentions —
    partitioning the rank window by a non-unique key silently keeps
    top-k per key group instead of per row).

    With ``broadcast_build=False`` (a build side too large for the
    broadcast threshold) the cell equi-join routes through
    :func:`~osm_pt_validator_spark.spatial.joins.salted_equi_join`:
    urban cells are Zipfian, so a raw shuffle on cell would pile a hot
    cell's candidates onto one reducer — the salted path spreads probe
    rows of measured-hot cells (> ``hot_threshold``, estimated from a
    seeded sample) across ``salt_factor`` reducers and replicates only
    the hot build cells.

    ``probe_partitions``: optionally repartition the probe side BEFORE
    the k-ring explosion. The explode (×(2r+1)²) and the candidate join
    (×cell density) multiply work downstream of the probe scan within
    the same stage, so when the scan's effective parallelism is coarser
    than the cluster — a small dim in one parquet row group yields ONE
    non-empty scan partition regardless of byte-range splits — the whole
    candidate computation serializes onto one core. A cheap pre-explosion
    round-robin exchange of the (still narrow) probe rows fixes that.
    Leave None (default) for large probe tables, whose natural split
    count already matches the cluster.

    Output: all probe columns + build_key + distance_m + knn_rank.
    """
    probe_keys = [probe_key] if isinstance(probe_key, str) else list(probe_key)
    if probe_partitions:
        probe = probe.repartition(probe_partitions)
    p = probe.withColumn(
        "__ring", kring_cells(cell(F.col(probe_lat), F.col(probe_lon), res), ring, res)
    ).withColumn("__cell", F.explode("__ring")).drop("__ring")

    b = build.select(
        F.col(build_key),
        F.col(build_lat).alias("__blat"),
        F.col(build_lon).alias("__blon"),
        cell(F.col(build_lat), F.col(build_lon), res).alias("__cell"),
    )
    if broadcast_build:
        joined = p.join(broadcast(b), "__cell", "inner")
    else:
        from osm_pt_validator_spark.spatial.joins import salted_equi_join

        joined = salted_equi_join(p, b, "__cell", hot_threshold=hot_threshold)
    joined = joined.withColumn(
        "distance_m",
        haversine_m(F.col(probe_lat), F.col(probe_lon), F.col("__blat"), F.col("__blon")),
    )

    if k == 1:
        # Nearest-one fast path (the flagship stop-to-mention match):
        # min(struct(distance, id)) is lexicographic — identical
        # ordering contract to the rank window (distance asc, id asc) —
        # but it PARTIALLY AGGREGATES map-side, so the shuffle carries
        # one row per probe row instead of every k-ring candidate
        # (~9×candidate-density fewer rows at 100 TB). The rank window
        # below can never partial-reduce: it must see all candidates.
        # Group by probe_keys ONLY (the documented unique row key):
        # grouping by every probe column would throw on ungroupable
        # column types (MapType) that the window path handles fine.
        # first() of the other columns is deterministic because
        # probe_key uniquely identifies the row — every candidate in a
        # group carries identical probe-column values.
        other_cols = [c for c in probe.columns if c not in probe_keys]
        return (
            joined.groupBy(*[F.col(c) for c in probe_keys])
            .agg(
                *[F.first(F.col(c)).alias(c) for c in other_cols],
                F.min(F.struct(F.col("distance_m"), F.col(build_key))).alias("__best"),
            )
            .select(
                *probe.columns,
                F.col(f"__best.{build_key}").alias(build_key),
                F.col("__best.distance_m").alias("distance_m"),
                F.lit(1).alias("knn_rank"),
            )
        )

    w = Window.partitionBy(*probe_keys).orderBy(
        F.col("distance_m").asc(), F.col(build_key).asc()
    )
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .drop("__cell", "__blat", "__blon")
    )
