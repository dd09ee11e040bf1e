"""Z-order-clustered parquet layout — data placement for spatial scans.

At 100 TB, tile/bbox queries live or die on FILE pruning: if every
parquet file covers the whole globe, a bbox scan reads everything; if
files hold contiguous Morton (Z-order) ranges, the scan touches only
files whose [min, max] morton statistics intersect the query window,
and parquet row-group statistics prune further inside each file.

``write_spatial_clustered`` produces that layout with the two built-in
primitives that matter:

  * ``repartitionByRange(morton)`` — a RANGE exchange: Spark samples
    the morton distribution and assigns contiguous, roughly equal-sized
    key ranges to output files (data-skew-adaptive, unlike fixed
    grid sharding);
  * ``sortWithinPartitions(morton)`` — makes row groups internally
    monotone so parquet min/max chunk stats are tight.

``morton_ranges`` reads back the per-file min/max from the parquet
footers (no data scan) — the test asserts the ranges are pairwise
disjoint, which is the formal property file pruning relies on.

``read_morton_window`` expresses a bbox query as a morton-prefix range
predicate over the clustered table; the binary comparison reaches the
scan as a parquet PushedFilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.geo import make_morton_udf


def with_morton(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon", res: int = 15
) -> DataFrame:
    enc = make_morton_udf(res)
    return df.withColumn("morton", enc(F.col(lat_col), F.col(lon_col)))


def write_spatial_clustered(
    df: DataFrame,
    path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    res: int = 15,
    files: int = 8,
) -> None:
    out = with_morton(df, lat_col, lon_col, res)
    (
        out.repartitionByRange(files, F.col("morton"))
        .sortWithinPartitions("morton")
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_ranges(path: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of the morton column from parquet FOOTERS
    only — the statistics the scan's file pruning consults."""
    import glob
    import os

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema == "morton" and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    return sorted(ranges)


def read_morton_window(
    spark: SparkSession, path: str, lo: int, hi: int
) -> DataFrame:
    """Scan the clustered table for morton in [lo, hi) — a plain range
    predicate, pushed to parquet (file skip via footer stats + row-group
    skip via chunk stats)."""
    return spark.read.parquet(path).filter(
        (F.col("morton") >= lo) & (F.col("morton") < hi)
    )
