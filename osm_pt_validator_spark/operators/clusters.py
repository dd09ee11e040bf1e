"""Duplicate-cluster resolution — the stage after pair generation in a
web-scale dedup pipeline.

The LSH paths (operators/dedup.py, operators/similarity.py) emit
near-dup PAIRS; a real corpus curation run must then group pairs into
connected components and keep ONE document per component (cf. the
cluster-then-keep-one step of published corpus-dedup pipelines).
Spark has no built-in connected components, so this implements the
classic iterative min-label propagation as a DataFrame loop:

    label(v)  <-  min(label(v), min over neighbours u of label(u))

repeated until a fixpoint. The driver loop runs one ACTION per
iteration (a 1-row convergence probe) — legitimate for an iterative
algorithm, and nothing row-sized ever reaches the driver.

Scale shape (100 TB corpus, ~10^9 near-dup edges):
  * each iteration is one shuffle join (edges x labels, both hashed on
    the node id) + one map-side-combining min aggregation + two
    POINTER-HALVING self-joins of the (node, label) table — no
    all-pairs step anywhere;
  * pointer halving (label(v) <- label(label(v)), applied twice per
    round) bounds the round count at O(log n) instead of O(component
    diameter): each application composes label chains, so the distance
    a minimum id travels per round grows geometrically (~3x measured
    on a path graph) rather than by one hop. Near-dup components are
    shallow (2-5 rounds either way), but a pathological 10k-long
    template CHAIN converges in ~9 rounds instead of silently hitting
    max_iter at 25 (see test_clusters.py's chain fixture). The label
    table is node-sized — orders of magnitude smaller than the edge
    table — so the extra self-joins are cheap relative to the edge
    join they eliminate rounds of;
  * per-iteration `localCheckpoint(eager=True)` truncates the lineage
    — without it the plan doubles every round and the final job
    replays every prior iteration per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in `pairs`, where component is
    the MINIMUM node id reachable through the undirected pair graph —
    deterministic, engine-reproducible (a recursive-CTE oracle computes
    the same fixpoint).

    Isolated documents (no pair) do not appear; callers treat absent
    as "its own singleton cluster" (see keep_canonical).
    """
    # persist the undirected edge table PRE-PARTITIONED on the join
    # key: the InMemoryRelation keeps HashPartitioning(a), so when the
    # per-iteration join is a shuffle join (the at-scale case — the
    # label table is every clustered node, far beyond broadcast), only
    # the label side exchanges each round; the edge table — the largest
    # input in the loop — shuffles exactly once, here.
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition("a")
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    def halve(lab: DataFrame) -> DataFrame:
        # label(v) <- label(label(v)). Invariant-preserving: label(v)
        # is always a node id in v's component, and label is monotone
        # non-increasing, so the composition stays in-component and
        # can only move labels closer to the component minimum. The
        # left join covers labels pointing at nodes already at their
        # own minimum (label(u) == u rows are present, so it always
        # hits, but coalesce keeps the op total).
        ptr = lab.select(
            F.col("node").alias("__pn"), F.col("label").alias("__pl")
        )
        return (
            lab.join(ptr, lab["label"] == ptr["__pn"], "left")
            .select(
                "node",
                F.coalesce(F.col("__pl"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(max_iter):
        # labels reaching each node through one hop; groupBy-min folds
        # them with the node's own label (map-side combine applies)
        neighbour = edges.join(
            labels, edges["a"] == labels["node"], "inner"
        ).select(F.col("b").alias("node"), "label")
        prop = (
            labels.unionByName(neighbour)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # convergence test BEFORE the halvings: stability under one
        # propagation is a valid fixpoint test — if no label changed,
        # every edge (u, v) has label(u) >= label(v) and vice versa, so
        # labels are constant per component, and since the component's
        # minimum node m always keeps label(m) = m (labels are monotone
        # non-increasing node ids in-component), that constant IS the
        # minimum. Skipping the two halvings on the final (no-change)
        # round saves 2 of its 4 jobs — meaningful at small scale where
        # per-job fixed cost dominates, free at 100 TB.
        changed = (
            prop.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        if changed == 0:
            break
        # two halvings per round: distance-to-minimum shrinks ~3x per
        # round on chain graphs => O(log n) rounds total
        labels = halve(halve(prop))
    edges.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def near_dup_clusters(
    documents: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for documents in a near-dup cluster:
    MinHash-LSH candidates -> exact-Jaccard verify -> connected
    components. cluster_id = min doc_id in the cluster."""
    from osm_pt_validator_spark.operators.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(
        documents, threshold, num_hashes, bands, shingle_n
    )
    return connected_components(pairs, max_iter=max_iter).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def keep_canonical(
    documents: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per cluster (its minimum-id member) plus every
    unclustered document — the post-dedup corpus.

    clusters: (doc_id, cluster_id) as from near_dup_clusters. One scan
    of documents, one join; the cluster table is orders of magnitude
    smaller than the corpus (only docs WITH a near-dup), so at scale
    AQE turns this into a broadcast join on its own.
    """
    c = clusters.select(
        F.col("doc_id").alias("__cid"), F.col("cluster_id").alias("__cluster")
    )
    return (
        documents.join(c, documents[id_col] == c["__cid"], "left")
        .filter(
            F.col("__cluster").isNull() | (F.col(id_col) == F.col("__cluster"))
        )
        .drop("__cid", "__cluster")
    )
