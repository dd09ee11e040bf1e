"""Scaling-efficiency evidence (BASELINE.md protocol).

Runs ONE compute-dominated end-to-end job — synthesize N pages ->
G1 text extraction -> G2 mention parse -> cell assignment -> salted
cell join vs a stops dim -> tile heatmap, PLUS validator pipeline over
M synthetic relations — at the parallelism given by SPARK_GRAFT_CPUS,
and prints one JSON line. Sized so wall-clock >= 60 s at local[32]
(scheduling overhead must not dominate the efficiency measurement).

Protocol:
    SPARK_GRAFT_CPUS=8  python scaling_bench.py   # N
    SPARK_GRAFT_CPUS=32 python scaling_bench.py   # 4N
    E = (T_8 / T_32) / 4      (target >= 0.8)

The workload is deterministic (seeded range arithmetic — identical
input at both parallelism levels) and embarrassingly parallel by
construction: Arrow-batched Python (extraction, automaton) and
JVM-side joins/aggregations, no driver-side loops.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", 4_000_000))
N_RELS = int(os.environ.get("SPARK_GRAFT_SCALE_RELS", 400_000))
N_POINTS = int(os.environ.get("SPARK_GRAFT_SCALE_POINTS", 8_000_000))


def synth_pages(spark, n):
    pid = F.col("id")
    return spark.range(0, n, 1).select(
        F.format_string("https://pages.example.org/p/%d", pid).alias("url"),
        F.encode(
            F.format_string(
                "<html><head><title>page %d</title></head><body>"
                "<p>Lorem ipsum dolor sit amet %d consectetur adipiscing elit %d "
                "sed do eiusmod tempor incididunt ut labore page body text.</p>"
                "<p>STOP:%d@%.4f,%.4f ROUTE:%d and STOP:%d@%.4f,%.4f</p></body></html>",
                pid,
                pid * 7919 % 104729,
                pid * 104729 % 7919,
                pid % 50000 + 100,
                55.0 + ((pid % 50000) + 100) * 3e-4,
                -3.9 + ((pid % 50000) + 100) * 3e-4,
                pid % 9000,
                (pid * 3) % 50000 + 100,
                55.0 + (((pid * 3) % 50000) + 100) * 3e-4,
                -3.9 + (((pid * 3) % 50000) + 100) * 3e-4,
            ),
            "utf-8",
        ).alias("html"),
    )


def job_extract_and_join(spark):
    """pages -> G1 -> G2 -> cell -> salted join vs stops -> heatmap."""
    from osm_pt_validator_spark.functions.geo import cell
    from osm_pt_validator_spark.sources.pages import extract_mentions
    from osm_pt_validator_spark.spatial.joins import salted_equi_join
    from osm_pt_validator_spark.spatial.tiles import failure_heatmap

    pages = synth_pages(spark, N_PAGES).withColumn(
        "warc_ts", F.to_timestamp(F.lit("2026-01-01"))
    ).withColumn("text", F.lit(None).cast("string")).withColumn(
        "lang", F.lit("en")
    )
    mentions = extract_mentions(pages, from_html=True).filter(F.col("kind") == "stop")
    m = mentions.select(
        "url", "mention_idx", "lat", "lon",
        cell(F.col("lat"), F.col("lon"), 16).alias("cell"),
    )
    sid = F.col("id")
    stops = spark.range(0, 50_000).select(
        sid.alias("stop_id"),
        cell(55.0 + (sid + 100) * 3e-4, -3.9 + (sid + 100) * 3e-4, 16).alias("cell"),
    )
    hot = m.groupBy("cell").count().filter(F.col("count") > 200_000).select("cell")
    joined = salted_equi_join(m, stops, "cell", salt_factor=8, hot=hot, probe_salt_col="url")
    hm = failure_heatmap(joined, z=12)
    rows = hm.agg(F.sum("n").alias("n"), F.count(F.lit(1)).alias("tiles")).collect()[0]
    return {"pages": N_PAGES, "join_rows": int(rows.n), "tiles": int(rows.tiles)}


def job_validation(spark):
    import bench

    bench._N_RELS = N_RELS
    return bench.bench_validation(spark, "")


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from osm_pt_validator_spark.session import ensure_py_files, get_spark

    spark = get_spark("scaling-bench", cores=cpus, shuffle_partitions=max(2 * cpus, 16))
    ensure_py_files(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()  # warm

    t0 = time.time()
    extract_stats = job_extract_and_join(spark)
    t_extract = time.time() - t0

    t1 = time.time()
    val_stats = job_validation(spark)
    t_val = time.time() - t1

    total = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "scaling job wall-clock (extract+join+heatmap, validation)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {
                    "extract_join_heatmap": round(t_extract, 3),
                    "validation": round(t_val, 3),
                },
                "cpus": cpus,
                "docs_per_min": round(N_PAGES / t_extract * 60.0, 1),
                "join_rows_per_sec": round(extract_stats["join_rows"] / t_extract, 1),
                "relations_per_sec": round(N_RELS / t_val, 1),
                "counters": {"extract": extract_stats, "validation": val_stats},
            }
        )
    )


if __name__ == "__main__":
    main()
