"""Sketch operators: KMV distinct, Bloom digest/prune, inverted index.

Correctness properties (not just row counts): KMV is exact below k and
within sketch tolerance above it; Bloom never yields a false negative;
the inverted index carries exact df with capped, sorted postings. Plus
the scale property that makes KMV viable at 100 TB: the dense_rank<=k
bound is pushed below the shuffle as a WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_kmv_exact_below_k(spark):
    from osm_pt_validator_spark.operators.sketches import kmv_distinct

    df = spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 30).cast("string").alias("v"),  # 10 distinct per g
    )
    out = kmv_distinct(df, ["g"], F.col("v"), k=64).collect()
    assert len(out) == 3
    for r in out:
        assert r.k_actual == 10
        assert r.est_distinct == 10  # below k => exact


def test_kmv_estimate_within_tolerance(spark):
    from osm_pt_validator_spark.operators.sketches import kmv_distinct

    n_distinct = 2000
    df = spark.range(n_distinct * 2).select(
        F.lit("g").alias("g"), (F.col("id") % n_distinct).cast("string").alias("v")
    )
    r = kmv_distinct(df, ["g"], F.col("v"), k=64).collect()[0]
    assert r.k_actual == 64
    # KMV relative error ~ 1/sqrt(k-1) = 12.6%; allow 4 sigma
    assert abs(r.est_distinct - n_distinct) / n_distinct < 0.5


def test_kmv_window_limit_pushed_below_shuffle(spark):
    from osm_pt_validator_spark.operators.sketches import kmv_distinct

    df = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("g"), F.col("id").cast("string").alias("v")
    )
    plan = _explain(kmv_distinct(df, ["g"], F.col("v"), k=8))
    assert "WindowGroupLimit" in plan, plan


def test_bloom_no_false_negatives_and_prunes(spark):
    from osm_pt_validator_spark.operators.sketches import (
        bloom_digest,
        bloom_prune,
    )

    build = spark.range(200).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    digest = bloom_digest(build, ["g"], F.col("v"), words=2, hashes=2)
    # every build value must pass its own group's digest (no false negatives)
    self_pass = bloom_prune(build, digest, ["g"], F.col("v"), words=2, hashes=2)
    assert self_pass.count() == 200
    # values far outside the build set should mostly be pruned; with
    # 100 values per group in 126 bits the filter is saturated-ish, so
    # only assert it prunes SOMETHING and passes a subset
    probe = spark.range(10_000, 12_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    n_pass = bloom_prune(probe, digest, ["g"], F.col("v"), words=2, hashes=2).count()
    assert n_pass < 2000


def test_bloom_empty_group_drops_probe_rows(spark):
    from osm_pt_validator_spark.operators.sketches import (
        bloom_digest,
        bloom_prune,
    )

    build = spark.range(10).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("v")
    )
    probe = spark.range(10).select(
        F.lit("b").alias("g"), F.col("id").cast("string").alias("v")
    )
    digest = bloom_digest(build, ["g"], F.col("v"))
    assert bloom_prune(probe, digest, ["g"], F.col("v")).count() == 0


def test_bloom_digest_is_broadcast_in_prune(spark):
    from osm_pt_validator_spark.operators.sketches import (
        bloom_digest,
        bloom_prune,
    )

    build = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    digest = bloom_digest(build, ["g"], F.col("v"))
    plan = _explain(bloom_prune(build, digest, ["g"], F.col("v")))
    assert "BroadcastHashJoin" in plan, plan


def test_log_binned_quantiles_bounds(spark):
    from osm_pt_validator_spark.operators.sketches import log_binned_quantiles

    # uniform 1..1000: p50 bin must contain ~500 within 12.5% rel width
    df = spark.range(1, 1001).select(
        F.lit("g").alias("g"), (F.col("id")).alias("v")
    )
    r = log_binned_quantiles(df, ["g"], F.col("v")).collect()[0]
    # estimate is the LOWER bound of the covering bin
    assert r.p5 <= 500 < r.p5 * 1.125 + 1, r
    assert r.p9 <= 900 < r.p9 * 1.125 + 1, r
    assert r.p99 <= 990 < r.p99 * 1.125 + 1, r


def test_log_binned_quantiles_exact_small_values(spark):
    from osm_pt_validator_spark.operators.sketches import log_binned_quantiles

    # values < 2**sub_bits fall in width-1 bins => quantiles are exact
    rows = [("g", v) for v in [1, 1, 2, 3, 3, 3, 4]]
    df = spark.createDataFrame(rows, "g string, v long")
    r = log_binned_quantiles(df, ["g"], F.col("v"), quantiles=(0.5,)).collect()[0]
    assert r.p5 == 3


def test_skew_profile_hot_key_first(spark):
    from osm_pt_validator_spark.operators.sketches import skew_profile

    # key 0 carries half the rows
    df = spark.range(1000).select(
        F.when(F.col("id") < 500, F.lit(0)).otherwise(F.col("id") % 50).alias("k")
    )
    rows = skew_profile(df, ["k"], top=3).orderBy("rank").collect()
    assert rows[0].k == 0 and rows[0].rank == 1
    assert rows[0].n == 500 + 10  # ids 500..999 with id%50==0 add 10
    assert rows[0].share_ppm == (510 * 1_000_000) // 1000
    assert rows[0].n_keys == 50


def test_skew_profile_uses_take_ordered(spark):
    from osm_pt_validator_spark.operators.sketches import skew_profile

    df = spark.range(1000).select((F.col("id") % 50).alias("k"))
    plan = _explain(skew_profile(df, ["k"], top=5))
    assert "TakeOrderedAndProject" in plan, plan


def test_inverted_index_df_exact_postings_capped(spark):
    from osm_pt_validator_spark.operators.sketches import inverted_index

    rows = [(i, "alpha beta" if i < 15 else "alpha") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.token: r for r in inverted_index(docs, max_postings=5, min_df=1).collect()
    }
    assert out["alpha"].df == 20  # df exact even though postings capped
    assert out["alpha"].postings == "0,1,2,3,4"  # capped, sorted asc
    assert out["beta"].df == 15
    assert out["beta"].postings == "0,1,2,3,4"


def test_inverted_index_single_shuffle(spark):
    from osm_pt_validator_spark.operators.sketches import inverted_index

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    import re

    plan = _explain(inverted_index(docs))
    # window + groupBy share the token partitioning: exactly one Exchange
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan


def test_exact_group_median_odd_even_and_ties(spark):
    from osm_pt_validator_spark.operators.sketches import exact_group_median

    rows = (
        [("odd", v) for v in (5, 1, 9, 3, 7)]        # median 5
        + [("even", v) for v in (10, 40, 20, 30)]    # middles 20,30
        + [("tied", v) for v in (2, 2, 2, 8)]        # middles 2,2
        + [("one", 42)]                              # single row
    )
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: (r["n"], r["median_x2"])
        for r in exact_group_median(df, ["k"], F.col("v")).collect()
    }
    assert got == {
        "odd": (5, 10),
        "even": (4, 50),
        "tied": (4, 4),
        "one": (1, 84),
    }


def test_exact_group_median_excludes_nulls(spark):
    from osm_pt_validator_spark.operators.sketches import exact_group_median

    df = spark.createDataFrame(
        [("g", None), ("g", 1), ("g", 2), ("empty", None)],
        "k string, v long",
    )
    got = {
        r["k"]: (r["n"], r["median_x2"])
        for r in exact_group_median(df, ["k"], F.col("v")).collect()
    }
    # NULLs excluded: median of {1,2} is 1.5 -> median_x2 = 3, n = 2;
    # an all-NULL group disappears (no non-null values to rank)
    assert got == {"g": (2, 3)}


def test_hll_estimate_within_tolerance(spark):
    from osm_pt_validator_spark.operators.sketches import hll_distinct

    df = spark.range(6000).select(
        F.when(F.col("id") < 100, "small").otherwise("big").alias("g"),
        F.when(F.col("id") < 100, (F.col("id") % 40))
        .otherwise(F.col("id") % 2500)
        .cast("string")
        .alias("v"),
    )
    out = {r.g: r for r in hll_distinct(df, ["g"], F.col("v"), p=10).collect()}
    # small group rides the linear-counting correction (many zero regs)
    assert abs(out["small"].hll_est_x100 / 100.0 - 40) / 40 < 0.15
    assert out["small"].n_zero > 900
    # big group: standard error 1.04/sqrt(1024) = 3.3%; allow 4 sigma
    assert abs(out["big"].hll_est_x100 / 100.0 - 2500) / 2500 < 0.14


def test_hll_matches_duckdb_replay(spark, tmp_path):
    import duckdb

    from osm_pt_validator_spark.operators.sketches import (
        hll_distinct,
        hll_distinct_sql,
    )

    df = spark.range(3000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 700).cast("string").alias("v"),
    )
    pq = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        (r.g, r.n_zero, r.hll_est_x100)
        for r in hll_distinct(df, ["g"], F.col("v"), p=10).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = sorted(tuple(r) for r in con.sql(hll_distinct_sql("t", "g", "v", p=10)).fetchall())
    assert got == want


def test_hll_registers_merge_by_max(spark):
    """Mergeability: the sketch of A UNION B equals folding the union —
    computing on two halves and max-merging registers gives the same
    estimate as one pass (here asserted end-to-end: estimate over the
    union is identical whichever partitioning produced the registers)."""
    from osm_pt_validator_spark.operators.sketches import hll_distinct

    a = spark.range(0, 1500).select(F.lit("g").alias("g"), (F.col("id") % 900).cast("string").alias("v"))
    b = spark.range(700, 2400).select(F.lit("g").alias("g"), (F.col("id") % 900).cast("string").alias("v"))
    whole = hll_distinct(a.union(b), ["g"], F.col("v"), p=8).collect()[0]
    repart = hll_distinct(a.union(b).repartition(13), ["g"], F.col("v"), p=8).collect()[0]
    assert (whole.n_zero, whole.hll_est_x100) == (repart.n_zero, repart.hll_est_x100)


def test_cms_never_undercounts_and_is_mergeable(spark):
    from osm_pt_validator_spark.operators.sketches import cms_digest, cms_lookup

    # zipf-ish: value v appears v times; width 64 forces collisions so
    # some estimates genuinely overshoot — the one-sided guarantee
    rows = [(f"v{v}",) for v in range(1, 120) for _ in range(v)]
    df = spark.createDataFrame(rows, "v string").withColumn("g", F.lit("g"))
    dig = cms_digest(df, ["g"], F.col("v"), depth=3, width=64)
    probes = spark.createDataFrame(
        [(f"v{v}",) for v in range(1, 120)] + [("absent",)], "v string"
    ).withColumn("g", F.lit("g"))
    out = {
        r.probe: r.est_count
        for r in cms_lookup(dig, probes, ["g"], F.col("v"), depth=3, width=64).collect()
    }
    total = sum(range(1, 120))
    overshoots = 0
    for v in range(1, 120):
        est, truth = out[f"v{v}"], v
        assert est >= truth  # NEVER undercounts
        assert est - truth <= total  # trivially bounded
        overshoots += est > truth
    assert overshoots > 0  # width 64 must actually collide
    # mergeability: digest(A ∪ B) == digest(A) + digest(B) counter-wise
    a = spark.createDataFrame(rows[: len(rows) // 2], "v string").withColumn("g", F.lit("g"))
    b = spark.createDataFrame(rows[len(rows) // 2 :], "v string").withColumn("g", F.lit("g"))
    da = cms_digest(a, ["g"], F.col("v"), depth=3, width=64)
    db = cms_digest(b, ["g"], F.col("v"), depth=3, width=64)
    merged = (
        da.unionByName(db)
        .groupBy("g", "d", "idx")
        .agg(F.sum("counter").alias("counter"))
    )
    whole = {(r.d, r.idx): r.counter for r in dig.collect()}
    got = {(r.d, r.idx): r.counter for r in merged.collect()}
    assert got == whole


def test_exact_group_mad_hand_case(spark):
    from osm_pt_validator_spark.operators.sketches import exact_group_mad

    # g=a: values 1..7 plus outlier 1000 -> median_x2 = 4+5 = 9,
    # devs_x2 = |2v-9| = 7,5,3,1,1,3,5,1991 -> sorted 1,1,3,3,5,5,7,1991
    # -> mad_x4 = 3+5 = 8 (i.e. MAD = 2.0, immune to the outlier)
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 1000]] + [("b", 42)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in exact_group_mad(df, ["g"], F.col("v")).collect()}
    assert (out["a"].n, out["a"].median_x2, out["a"].mad_x4) == (8, 9, 8)
    # singleton: median = value, MAD = 0
    assert (out["b"].n, out["b"].median_x2, out["b"].mad_x4) == (1, 84, 0)


def test_hll_and_cms_ignore_null_values_and_mad_keeps_null_groups(spark):
    from osm_pt_validator_spark.operators.sketches import (
        cms_digest,
        exact_group_mad,
        hll_distinct,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("h", None)], "g string, v string"
    )
    out = {r.g: r for r in hll_distinct(df, ["g"], F.col("v"), p=8).collect()}
    # NULL is not a value: {a, NULL} counts 1; {NULL} counts 0
    assert out["g"].hll_est_x100 == 100
    assert "h" not in out or out["h"].hll_est_x100 == 0
    dig = cms_digest(df, ["g"], F.col("v"), depth=2, width=16).collect()
    assert sum(r.counter for r in dig) == 2  # one value x two rows(d)

    mdf = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 9), ("a", 5)], "g string, v long"
    )
    mout = {r.g: r for r in exact_group_mad(mdf, ["g"], F.col("v")).collect()}
    # the NULL-key group is a real SQL group and must keep its MAD
    assert (mout[None].n, mout[None].median_x2, mout[None].mad_x4) == (3, 4, 4)
    assert (mout["a"].n, mout["a"].mad_x4) == (1, 0)
