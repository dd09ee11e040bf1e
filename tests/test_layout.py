"""Z-order-clustered layout: the on-disk property (pairwise-disjoint
per-file morton ranges from footer stats alone) plus pushdown and
round-trip correctness."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _points(spark, n=5000):
    # deterministic scatter over a lat/lon box
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (40.0 + (F.col("id") * 37 % 1000) * 0.01).alias("lat"),
        (-5.0 + (F.col("id") * 53 % 1000) * 0.01).alias("lon"),
    )


def test_clustered_files_have_disjoint_morton_ranges(spark, tmp_path):
    from osm_pt_validator_spark.spatial.layout import (
        morton_ranges,
        write_spatial_clustered,
    )

    path = os.path.join(str(tmp_path), "pts")
    write_spatial_clustered(_points(spark), path, files=8)
    ranges = morton_ranges(path)
    assert len(ranges) >= 4  # range partitioner actually fanned out
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2  # pairwise disjoint AND ordered


def test_morton_window_scan_prunes_and_matches(spark, tmp_path):
    from osm_pt_validator_spark.spatial.layout import (
        morton_ranges,
        read_morton_window,
        with_morton,
        write_spatial_clustered,
    )

    path = os.path.join(str(tmp_path), "pts2")
    pts = _points(spark)
    write_spatial_clustered(pts, path, files=8)
    ranges = morton_ranges(path)
    # query exactly the first file's range: result must equal the
    # brute-force recompute over the raw points
    lo, hi = ranges[0][0], ranges[0][1] + 1
    got = sorted(r.pid for r in read_morton_window(spark, path, lo, hi).collect())
    want = sorted(
        r.pid
        for r in with_morton(pts)
        .filter((F.col("morton") >= lo) & (F.col("morton") < hi))
        .collect()
    )
    assert got == want and len(got) > 0
    # and the predicate reaches the parquet scan
    plan = read_morton_window(spark, path, lo, hi)._sc._jvm.PythonSQLUtils.explainString(
        read_morton_window(spark, path, lo, hi)._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(morton" in plan, plan
