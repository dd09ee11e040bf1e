"""Curated-corpus sink/source: the layout a training-data consumer
reads.

Layout contract (100 TB rationale):
  * partitioned by (lang, shard) — language is the consumer's coarse
    filter (partition pruning eliminates whole directories); shard is
    a deterministic md5 hash of the doc id (functions/hashing.py), so
    shard counts bound task size, re-runs are stable, and any shard
    subset is a valid reproducible sample (same property as
    curation.hash_sample).
  * repartition(lang, shard) before the write — ONE file per output
    directory instead of one per (input task x directory), the
    difference between 10^3 and 10^7 files at corpus scale.
  * sortWithinPartitions(doc_id) — parquet gets monotone doc_id pages,
    so min/max row-group stats make doc_id range scans cheap without
    a global (all-shuffle) sort.

Read-back pruning is plan-asserted in tests/test_plans.py: a
lang+shard filter must reach PartitionFilters, a doc_id predicate the
PushedFilters line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.hashing import md5_i64


def shard_of(id_col: str, shards: int) -> "F.Column":
    return (md5_i64(F.col(id_col).cast("string"), "shard") % shards).cast("int")


def write_curated_corpus(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    shards: int = 16,
) -> None:
    out = df.withColumn("shard", shard_of(id_col, shards))
    (
        out.repartition(F.col(lang_col), F.col("shard"))
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy(lang_col, "shard")
        .parquet(path)
    )


def read_curated_corpus(
    spark: SparkSession,
    path: str,
    lang: str | None = None,
    shard: int | None = None,
) -> DataFrame:
    """Read back with the coarse filters expressed as column
    predicates — Spark turns them into partition pruning (directory
    skip), never a data scan."""
    df = spark.read.parquet(path)
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    if shard is not None:
        df = df.filter(F.col("shard") == shard)
    return df
