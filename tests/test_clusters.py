"""Connected-components / canonical-keep cluster stage
(operators/clusters.py) — the pair->cluster->keep-one tail of the
dedup pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pt_validator_spark.operators.clusters import (
    connected_components,
    keep_canonical,
    near_dup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df).collect()
    return {r.node: r.component for r in rows}


def test_chain_propagates_beyond_one_hop(spark):
    # 1-2-3-4-5: the min label needs 4 hops to reach node 5
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_and_unordered_pairs(spark):
    # pair order (a>b) must not matter; two separate components
    got = _cc(spark, [(7, 3), (3, 9), (20, 30), (40, 30)])
    assert got == {3: 3, 7: 3, 9: 3, 20: 20, 30: 20, 40: 20}


def test_cycle_and_bridge(spark):
    # cycle 1-2-3-1 bridged to chain 3-10-11
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11)])
    assert set(got.values()) == {1}
    assert len(got) == 5


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_max_iter_caps_propagation(spark):
    # one round = one propagation hop + two pointer halvings: the min
    # label travels at most 4 links along a chain, so node 10 of a
    # 10-chain cannot have seen label 1 after max_iter=1
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "doc_a long, doc_b long"
    )
    got = {r.node: r.component for r in connected_components(df, max_iter=1).collect()}
    assert got[2] == 1 and got[10] != 1
    full = {r.node: r.component for r in connected_components(df).collect()}
    assert all(v == 1 for v in full.values())


def test_long_chain_converges_in_log_rounds(spark):
    # adversarial chain-shaped component (10k nodes in a line — the
    # template-chain worst case for plain min-label propagation, which
    # needs diameter=10^4 rounds). Pointer halving must resolve it
    # within max_iter=15 (~log-many rounds); if it silently hit the
    # cap, far-end nodes would keep intermediate labels and the
    # assertion below fails.
    n = 10_000
    df = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    comps = connected_components(df, max_iter=15)
    distinct = comps.select("component").distinct().collect()
    assert [r.component for r in distinct] == [0]
    assert comps.count() == n


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4), (5, 4)], "doc_id long, cluster_id long"
    )
    kept = sorted(r.doc_id for r in keep_canonical(docs, clusters).collect())
    # canonical members 1 and 4 survive; dups 2 and 5 drop; isolated
    # docs 3 and 6 survive untouched
    assert kept == [1, 3, 4, 6]


def test_edges_persisted_pre_partitioned_on_join_key(spark):
    """The per-iteration join must not re-shuffle the edge table: the
    persisted edges carry HashPartitioning(a) so only the label side
    exchanges each round (at scale the label table is every clustered
    node — not broadcastable — and the edge table is the largest input
    in the loop)."""
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .repartition("a")
        .persist()
    )
    try:
        edges.count()
        labels = (
            edges.select(F.col("a").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint(eager=True)
        )
        with _no_broadcast(spark):
            nb = edges.join(labels, edges["a"] == labels["node"], "inner").select(
                F.col("b").alias("node"), "label"
            )
            plan = nb._sc._jvm.PythonSQLUtils.explainString(
                nb._jdf.queryExecution(), "formatted"
            )
        # the streamed (edges) side reads straight from cache: between
        # the join and the InMemoryTableScan there may be Sort/Filter
        # but NO Exchange
        final = plan.split("== Initial Plan ==")[0]
        join_block = final.split("InMemoryTableScan")[0]
        assert "Join" in join_block, final
        assert "Exchange" not in join_block.split("Join", 1)[1], final
    finally:
        edges.unpersist()


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_near_dup_clusters_end_to_end(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd watches in silence tonight"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, base + " extra words"),    # near-dup of 1 and 2
            (4, "completely different content about spark physical plans "
                "and shuffle exchanges in distributed execution engines"),
            (5, "yet another unrelated document mentioning parquet row "
                "groups column pruning and predicate pushdown at scan"),
        ],
        "doc_id long, text string",
    )
    clusters = near_dup_clusters(docs, threshold=0.5)
    got = {r.doc_id: r.cluster_id for r in clusters.collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    kept = sorted(r.doc_id for r in keep_canonical(docs, clusters).collect())
    assert kept == [1, 4, 5]
