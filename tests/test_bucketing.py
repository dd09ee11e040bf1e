"""Bucketed-table co-located join — the pre-shuffled layout contract.

At 100 TB the single biggest recurring cost is re-shuffling the same
fact table on the same key for every join. Writing both sides bucketed
on the join key (bucketBy + sortBy at write time) pre-pays that shuffle
ONCE: every later equi-join on the key reads co-located buckets and
plans with ZERO Exchange. This is the persisted-layout counterpart of
spatial/layout.py's Z-order clustering (which pre-pays range pruning).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_colocated_join_has_zero_exchanges(
    spark, tmp_path, no_broadcast
):
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    # option("path", ...) keeps the data in the test tmp dir; the table
    # metadata lives in the session's in-memory catalog
    (
        a.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "ta"))
        .saveAsTable("bkt_a")
    )
    (
        b.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "tb"))
        .saveAsTable("bkt_b")
    )
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        rows = joined.count()
        assert rows == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the join consumes the written layout —
        # no shuffle on either side, no broadcast
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan

        # ...and the same join WITHOUT the bucketed layout shuffles
        # both sides (the cost the layout pre-paid)
        plain = a.join(b, "k")
        plain.count()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange hashpartitioning") >= 2

        # correctness: identical result set either way
        got = {(r["k"], r["va"], r["vb"]) for r in joined.collect()}
        want = {(r["k"], r["va"], r["vb"]) for r in plain.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
