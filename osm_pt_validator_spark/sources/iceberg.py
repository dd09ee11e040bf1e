"""Iceberg table source — the north-rule deployment substrate for the
10^12-document pages table.

The engine's operators take DataFrames, so Iceberg support is purely a
session/reader concern: configure a Spark catalog backed by
`org.apache.iceberg.spark.SparkCatalog` and read tables through it.
At scale this buys (vs raw parquet dirs):

  * snapshot-isolated incremental reads (the streaming pipeline resumes
    from a snapshot id rather than directory listing),
  * partition evolution + hidden partitioning (pages partitioned by
    days(warc_ts) without the column leaking into queries),
  * metadata-pruned scans — partition stats live in manifests, so a
    cell/time predicate prunes files without listing 10^6 objects.

This container ships no Iceberg runtime jar, so everything here is
import/config-gated: `iceberg_available(spark)` probes the JVM for the
catalog class, conf builders are pure dicts (testable without the jar),
and `read_pages` falls back to the parquet-dir layout the rest of the
repo uses. On a real cluster, submit with
``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``
(or bake the jar into the image) and pass
``extra_conf=iceberg_session_conf(warehouse)`` to `get_spark`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CATALOG = "pt"


def iceberg_session_conf(
    warehouse: str, catalog: str = DEFAULT_CATALOG
) -> dict[str, str]:
    """Spark conf for a Hadoop-warehouse Iceberg catalog. Pure config —
    merge into SparkSession.builder (get_spark's extra_conf)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def table_ref(table: str, catalog: str = DEFAULT_CATALOG, db: str = "db") -> str:
    return f"{catalog}.{db}.{table}"


def read_pages(
    spark: SparkSession,
    location: str,
    table: str = "pages",
    catalog: str = DEFAULT_CATALOG,
) -> DataFrame:
    """Read the pages table (url, warc_ts, html, text, lang).

    `location` is an Iceberg warehouse when the runtime is present,
    else a directory of `<table>.parquet` (the repo's test layout).
    Either way the result is a plain DataFrame — every downstream
    operator is source-agnostic.
    """
    if iceberg_available(spark):
        return spark.read.table(table_ref(table, catalog))
    return spark.read.parquet(os.path.join(location, f"{table}.parquet"))


def write_pages_partitioned(
    df: DataFrame,
    location: str,
    table: str = "pages",
    catalog: str = DEFAULT_CATALOG,
) -> None:
    """Write pages with the scale partition spec: days(warc_ts) hidden
    partitioning under Iceberg; parquet fallback partitions by a
    derived date column (the visible-column approximation)."""
    from pyspark.sql import functions as F

    if iceberg_available(df.sparkSession):
        (
            df.writeTo(table_ref(table, catalog))
            .partitionedBy(F.days(F.col("warc_ts")))
            .createOrReplace()
        )
        return
    (
        df.withColumn("warc_date", F.to_date("warc_ts"))
        .write.mode("overwrite")
        .partitionBy("warc_date")
        .parquet(os.path.join(location, f"{table}.parquet"))
    )
