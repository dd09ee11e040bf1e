"""Similarity search over embedding columns (ARRAY<FLOAT>):

  * brute-force cosine top-k — the exactness baseline. Dot products via
    zip_with + aggregate (JVM fold, deterministic left-to-right order
    => bit-stable across engines after float64 cast), queries broadcast.
  * LSH-bucketed ANN — random-hyperplane signatures from DETERMINISTIC
    pseudo-planes plane[m][d] = sin(m*8191 + d*131) (reproducible in
    any engine, no RNG state), bucket equi-join + exact re-rank. The
    scale path: candidate set shrinks by ~2^num_planes.
  * embedding-cosine near-dup pairs for dedup pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast
from pyspark.sql.pandas.functions import pandas_udf


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left fold — same summation order as the oracle."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query. queries is small => broadcast;
    the probe side streams — no shuffle until the rank window on
    query_id (tiny). Output: (query_id, vec_id, sim, rank)."""
    q = broadcast(queries.select(query_id_col, query_vec_col))
    joined = embeddings.select(id_col, vec_col).crossJoin(q)
    sim = F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.select(query_id_col, id_col, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH ANN
# ---------------------------------------------------------------------------


def make_hyperplane_bucket_udf(dim: int, num_planes: int = 8):
    """Signature bucket via deterministic pseudo-random hyperplanes."""
    m = np.arange(num_planes)[:, None]
    d = np.arange(dim)[None, :]
    planes = np.sin(m * 8191.0 + d * 131.0)  # (num_planes, dim)

    @pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) if v is not None else np.zeros(dim) for v in vecs]
        )
        signs = (mat @ planes.T) > 0  # (rows, num_planes)
        vals = (signs.astype(np.int64) << np.arange(num_planes)).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: same-bucket candidates, exact cosine re-rank.
    Output: (query_id, vec_id, sim, rank) — rank within candidates."""
    bucket = make_hyperplane_bucket_udf(dim, num_planes)
    e = embeddings.select(id_col, vec_col).withColumn("__b", bucket(F.col(vec_col)))
    q = broadcast(
        queries.select(query_id_col, query_vec_col).withColumn(
            "__b", bucket(F.col(query_vec_col))
        )
    )
    joined = e.join(q, "__b", "inner")
    sim = F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.select(query_id_col, id_col, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 32,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: bucket self-join + exact verify.
    Output: (vec_a, vec_b, sim)."""
    bucket = make_hyperplane_bucket_udf(dim, num_planes)
    e = embeddings.select(id_col, vec_col).withColumn("__b", bucket(F.col(vec_col)))
    a = e.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"), "__b")
    b = e.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"), "__b")
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "__b")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF ANN (inverted-file index) — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine).

    centroids: (centroid_id, centroid_vec) — small, broadcast. One
    pass: broadcast cross join + rank window on the vector id, so the
    big side never shuffles on data volume (only on the tiny per-vector
    candidate set for the window). Output: (id, vec, centroid_id).
    """
    c = broadcast(centroids.select("centroid_id", "centroid_vec"))
    sim = cosine(F.col(vec_col), F.col("centroid_vec"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("__csim").desc(), F.col("centroid_id").asc()
    )
    return (
        embeddings.select(id_col, vec_col)
        .crossJoin(c)
        .withColumn("__csim", sim)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def deterministic_centroids(
    embeddings: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantizer without iterative k-means: centroid c = the
    element-wise mean of the vectors whose xxhash64(id) lands in
    residue class c. Deterministic, one aggregation pass, and at scale
    a perfectly serviceable IVF quantizer (k-means would sharpen the
    cells but not change the plan shape). Output: (centroid_id,
    centroid_vec ARRAY<DOUBLE>)."""
    cls = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_centroids)).alias("centroid_id")
    exploded = embeddings.select(
        cls, F.posexplode(F.col(vec_col)).alias("dim", "x")
    )
    return (
        exploded.groupBy("centroid_id", "dim")
        .agg(F.avg("x").alias("mx"))
        .groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mx"))).alias("dm"))
        .select(
            "centroid_id",
            F.transform(F.col("dm"), lambda s: s["mx"]).alias("centroid_vec"),
        )
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF search: probe the `nprobe` nearest centroid cells per query,
    exact cosine re-rank within them.

    Scale shape: the index side is partitioned by centroid_id (the
    inverted lists); each query touches nprobe/num_centroids of the
    data. The centroid table is tiny and broadcast twice (assignment +
    probe selection). Output: (query_id, vec_id, sim, rank).
    """
    cents = deterministic_centroids(embeddings, num_centroids, id_col, vec_col)
    indexed = ivf_assign(embeddings, cents, id_col, vec_col)

    qsim = cosine(F.col(query_vec_col), F.col("centroid_vec"))
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("__csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        queries.select(query_id_col, query_vec_col)
        .crossJoin(broadcast(cents))
        .withColumn("__csim", qsim)
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select(query_id_col, query_vec_col, "centroid_id")
    )

    joined = indexed.join(broadcast(probes), "centroid_id")
    sim = F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.select(query_id_col, id_col, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
