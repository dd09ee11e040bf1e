"""Fixed-iteration PageRank as a DataFrame loop — link-graph authority
scoring for crawl prioritization and domain weighting.

Everything is INTEGER-SCALED (rank mass in millionths): float PageRank
is not reproducible on Spark because shuffle reduce order varies and
double addition does not commute bitwise, whereas 64-bit integer sums
are order-independent. With `div` (exact integer division) for the
contribution split and the damping multiply, the whole computation
replays bit-for-bit in a SQL oracle — same contract as the md5-derived
sketch family.

Scale shape (mirrors clusters.connected_components, the other iterative
operator in this repo):
  * the edge table — the largest input — is persisted PRE-PARTITIONED
    on src and joined to the (node-partitioned) rank table each round:
    only the small rank side exchanges per iteration, edges shuffle
    exactly once;
  * per-round contribution sums are map-side-combining long aggregates;
  * `localCheckpoint(eager=True)` per iteration truncates lineage so
    the plan does not double every round;
  * iteration count is FIXED (the classic 100 TB deployment runs a
    budgeted number of rounds rather than testing convergence — each
    convergence probe would be an extra action over the full graph).

Dangling nodes (no out-edges) absorb mass and re-emit only the
teleport term — the "leaky" PageRank variant; acceptable for ranking
(relative order of connected nodes is preserved) and kept because
redistribution would add an all-nodes broadcast per round. Documented
so the oracle replays the same variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def page_rank(
    edge_df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank) after `iterations` rounds; rank is in millionths
    (every node starts at SCALE = 1,000,000).

    rank'(v) = base + damping_pct%% * sum over in-edges (u,v) of
               rank(u) div outdeg(u)
    with base = (100 - damping_pct)%% of SCALE — all integer ops.
    """
    base = (100 - damping_pct) * SCALE // 100
    edges = (
        edge_df.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
        .persist()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # src-partitioned x src-partitioned: no extra exchange
    contrib_edges = edges.join(outdeg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(iterations):
        contribs = contrib_edges.join(
            ranks, contrib_edges["src"] == ranks["node"], "inner"
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank div outdeg").alias("__c"),
        )
        sums = contribs.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"{damping_pct} * coalesce(__s, 0L) div 100")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    contrib_edges.unpersist()
    nodes.unpersist()
    return ranks


def page_rank_sql(
    edges_select: str, iterations: int = 3, damping_pct: int = 85
) -> str:
    """DuckDB replay of :func:`page_rank` as a chained-CTE oracle.

    `edges_select` must yield columns (src, dst), duplicates allowed.
    """
    base = (100 - damping_pct) * SCALE // 100
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_select}))",
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"r0 AS (SELECT node, {SCALE}::BIGINT AS rank FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS s "
            f"FROM edges e JOIN outdeg o USING (src) "
            f"JOIN r{i - 1} r ON r.node = e.src GROUP BY 1)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, "
            f"CAST({base} + ({damping_pct} * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN c{i} c USING (node))"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iterations}"
    )
