"""Iceberg runtime smoke — the CI-form run of the path that is
config-gated (and pytest-skipped) in containers without the Iceberg
Spark runtime jar.

Run on any machine with network (or a pre-fetched jar):

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --py-files .osm_pt_validator_spark.zip \
      scripts/iceberg_smoke.py /tmp/iceberg_wh

    # or with a local jar, no network:
    spark-submit --jars iceberg-spark-runtime-4.0_2.13-1.10.0.jar ...

Exercises, against a local Hadoop-catalog warehouse:
  1. session conf wiring (iceberg_session_conf -> SparkCatalog)
  2. hidden days(warc_ts) partitioning on write_pages_partitioned
  3. read_pages through the catalog (no parquet fallback)
  4. snapshot isolation: read as-of the pre-append snapshot id
  5. incremental read between two snapshots

Exit code 0 iff every check passes.
"""

from __future__ import annotations

import sys
import tempfile


def main() -> int:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="iceberg_wh_")

    from osm_pt_validator_spark.fixtures import pages_df
    from osm_pt_validator_spark.session import ensure_py_files, get_spark
    from osm_pt_validator_spark.sources.iceberg import (
        iceberg_available,
        iceberg_session_conf,
        read_pages,
        table_ref,
        write_pages_partitioned,
    )

    spark = get_spark(
        "iceberg-smoke", cores=4, extra_conf=iceberg_session_conf(warehouse)
    )
    ensure_py_files(spark)
    spark.sparkContext.setLogLevel("ERROR")

    assert iceberg_available(spark), (
        "Iceberg runtime not on the classpath — submit with --packages "
        "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> (see module docstring)"
    )

    # 1+2: write with hidden days(warc_ts) partitioning
    pages = pages_df(spark, [(1, [100, 102]), (2, [103, 104])])
    write_pages_partitioned(pages, warehouse)

    # 3: catalog read, not parquet fallback
    got = read_pages(spark, warehouse)
    n0 = got.count()
    assert n0 == pages.count(), (n0, pages.count())
    assert set(got.columns) == set(pages.columns), got.columns

    ref = table_ref("pages")
    snap0 = spark.sql(
        f"SELECT snapshot_id FROM {ref}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]

    # append a second batch -> new snapshot
    more = pages_df(spark, [(3, [105])])
    more.writeTo(ref).append()
    n1 = spark.read.table(ref).count()
    assert n1 == n0 + more.count(), (n0, n1)

    # 4: snapshot-isolated read of the PRE-append state
    as_of = spark.read.option("snapshot-id", snap0).table(ref)
    assert as_of.count() == n0, (as_of.count(), n0)

    # 5: incremental read = only the appended rows
    snap1 = spark.sql(
        f"SELECT snapshot_id FROM {ref}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]
    inc = (
        spark.read.option("start-snapshot-id", snap0)
        .option("end-snapshot-id", snap1)
        .table(ref)
    )
    assert inc.count() == more.count(), (inc.count(), more.count())

    # hidden partitioning actually happened: the files metadata table
    # carries the days(warc_ts) partition value without a visible column
    parts = spark.sql(f"SELECT DISTINCT partition FROM {ref}.files").count()
    assert parts >= 1, parts
    assert "warc_date" not in spark.read.table(ref).columns

    print("ICEBERG SMOKE OK:", {"rows": n1, "snapshots": [snap0, snap1]})
    return 0


if __name__ == "__main__":
    sys.exit(main())
