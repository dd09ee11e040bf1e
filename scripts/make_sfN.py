"""Deterministic scale-up replica generator for scaling evidence.

Produces an N-times-larger copy of a driver-generated sf directory by
replicating each fact table N times with disjoint key ranges (FK
relationships preserved: orders.o_custkey shifts with customer,
lineitem's three FKs shift with their dimensions). Payload columns are
de-correlated per copy so the WORKLOAD CHARACTER matches the source:

  * documents.text — every token is prefixed with the copy index, so a
    copy shares NO shingles with the original: the near-dup rate per
    document stays that of the source corpus instead of every document
    acquiring 9 artificial near-twins (which would inflate LSH bucket
    sizes 10x and measure a different workload, not a bigger one);
  * embeddings.embedding — rotated by copy index (norm-preserving
    de-correlation, keeps top-k candidate sets copy-local);
  * events.user_id/event_id — shifted per copy (key cardinality scales
    with data; keeping user_id fixed would turn per-user groupBys into
    10x-hotter keys, again a different workload).

Dimension tables region/nation keep their real-world cardinality (a
bigger corpus does not mean more nations).

Usage:
    python scripts/make_sfN.py [--factor 10] [--src /root/testdata/sf0.1]
                               [--out /root/repo/testdata_sf1]

Output is plain parquet per table, same file-per-table layout as the
driver's testdata dirs, so SPARK_GRAFT_SF_DIR / queries(sf_dir) accept
it directly.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: key columns shifted per copy: table -> {column: domain_table_of_key}
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def _domains(spark: SparkSession, src: str) -> dict[str, int]:
    """Max key per domain, +1 => the per-copy shift stride."""
    out: dict[str, int] = {}
    pairs = [
        ("customer", "customer", "c_custkey"),
        ("supplier", "supplier", "s_suppkey"),
        ("part", "part", "p_partkey"),
        ("orders", "orders", "o_orderkey"),
        ("events", "events", "event_id"),
        ("events_user", "events", "user_id"),
        ("documents", "documents", "doc_id"),
        ("embeddings", "embeddings", "vec_id"),
    ]
    for dom, table, col in pairs:
        row = (
            spark.read.parquet(f"{src}/{table}.parquet")
            .agg(F.max(col).alias("m"))
            .collect()[0]
        )
        out[dom] = int(row.m) + 1
    return out


def _one_copy(df: DataFrame, table: str, i: int, dom: dict[str, int]) -> DataFrame:
    out = df
    for col, d in SHIFTS.get(table, {}).items():
        out = out.withColumn(col, F.col(col) + F.lit(i * dom[d]))
    if table == "documents" and i > 0:
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(F.lit(f"c{i}"), t),
                ),
                " ",
            ),
        )
    if table == "embeddings" and i > 0:
        n = F.size(F.col("embedding"))
        rot = F.lit(i) % n
        out = out.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), rot + 1, n - rot),
                F.slice(F.col("embedding"), 1, rot),
            ),
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(_REPO, "testdata_sf1"))
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from osm_pt_validator_spark.session import get_spark

    spark = get_spark("make-sfN", cores=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    dom = _domains(spark, args.src)
    os.makedirs(args.out, exist_ok=True)
    for table in TABLES:
        src_df = spark.read.parquet(f"{args.src}/{table}.parquet")
        if table in ("region", "nation"):
            copies = src_df
        else:
            parts = [
                _one_copy(src_df, table, i, dom) for i in range(args.factor)
            ]
            copies = parts[0]
            for p in parts[1:]:
                copies = copies.unionByName(p)
        dest = f"{args.out}/{table}.parquet"
        copies.write.mode("overwrite").parquet(dest)
        print(f"{table}: {spark.read.parquet(dest).count()} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
