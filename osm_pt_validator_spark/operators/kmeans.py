"""Engine-exact k-means (Lloyd) — the "train the IVF index" step.

operators/similarity.py's IVF search partitions by centroid but derives
its centroids from md5 (deterministic, not data-adaptive). This module
supplies real Lloyd iterations with a twist that matters for a
verifiable engine: ALL arithmetic is integer-exact, so the result is
bit-reproducible across engines, partitionings, and runs — a DuckDB
oracle replays every iteration to the same centroids.

* embeddings quantize to fixed-point int64 (``round(x * scale)``);
* squared distance is a sum of int64 products (64 dims at |q| <= 2e6
  keeps |v-c|^2 <= 2.6e14, far inside int64 — and inside double's 2^53
  exact-integer range, so even a dot-product-based replay is exact);
* assignment is argmin with ties broken on centroid id (min(struct));
* the new centroid is floor(sum / count) per dimension — exact integer
  division, no float summation order to disagree about.

Scale shape per iteration: assignment is a broadcast join (k centroids
are always a dim table) followed by the same min(struct) partial
aggregation as the kNN k=1 fast path — the shuffle carries ONE row per
vector, not k. Recompute is posexplode -> map-side-combining sum/count
on (cid, dim) — shuffle bounded by k x dim, not the corpus. Float
k-means would need the same plan; fixed-point costs nothing extra and
buys exactness.

Empty clusters (possible in Lloyd) simply drop out of the next round —
the standard behaviour; callers wanting constant k re-seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def quantize(vec_col, scale: float = 1e6):
    """array<float> -> array<long> fixed-point (round half away from
    zero — the rounding both Spark and DuckDB apply)."""
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long")
    )


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_fixed_point(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1e6,
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) after ``iters`` Lloyd rounds.

    centroids: (cid, cv array<long>, n) — n the member count of the
    round that produced the centroid. assignments: (id, cid) for every
    input vector. Init: the k smallest ids, cid in id order.
    """
    q = vectors.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col), scale).alias("qv")
    )
    from pyspark.sql import Window

    w = Window.orderBy("id")
    centroids = (
        q.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select((F.col("__rn") - 1).alias("cid"), F.col("qv").alias("cv"))
    )

    assigned = None
    for _ in range(iters):
        scored = q.join(broadcast(centroids.select("cid", "cv")), how="cross")
        assigned = (
            scored.withColumn("__d", _sq_dist(F.col("qv"), F.col("cv")))
            .groupBy("id")
            .agg(F.min(F.struct("__d", "cid", "qv")).alias("__best"))
            .select("id", F.col("__best.cid").alias("cid"), F.col("__best.qv").alias("qv"))
        )
        dims = assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
        centroids = (
            dims.groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn(
                "cval",
                F.floor(F.col("s").cast("double") / F.col("n")).cast("long"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cval"))),
                    lambda st: st["cval"],
                ).alias("cv"),
                F.first("n").alias("n"),
            )
        )
    return centroids, assigned.select("id", "cid")


def centroids_for_ivf(centroids: DataFrame, scale: float = 1e6) -> DataFrame:
    """Bridge to the IVF search path: de-quantize trained centroids to
    the (centroid_id, centroid_vec array<double>) shape
    operators/similarity.py:ivf_assign consumes."""
    return centroids.select(
        F.col("cid").alias("centroid_id"),
        F.transform(
            F.col("cv"), lambda x: x.cast("double") / F.lit(scale)
        ).alias("centroid_vec"),
    )
