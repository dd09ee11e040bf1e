"""PageRank: exact parity with a pure-python integer replay of the same
recurrence (the operator's determinism claim), plus structural cases."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

SCALE = 1_000_000


def _python_pagerank(edges, iterations=3, damping_pct=85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    base = (100 - damping_pct) * SCALE // 100
    rank = {n: SCALE for n in nodes}
    for _ in range(iterations):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {n: base + damping_pct * s[n] // 100 for n in nodes}
    return rank


def _run(spark, edges, **kw):
    from osm_pt_validator_spark.operators.pagerank import page_rank

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in page_rank(df, **kw).collect()}


def test_pagerank_matches_integer_replay(spark):
    # two hubs, a chain, a cycle, duplicate edges (deduped), fan-in
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1),
        (6, 7), (7, 8), (8, 6), (1, 2),
    ]
    got = _run(spark, edges, iterations=3)
    want = _python_pagerank(edges, iterations=3)
    assert got == want


def test_pagerank_dangling_node_keeps_teleport_only(spark):
    # 2 has no out-edges: after round 1 its in-flow still arrives, but
    # it emits nothing (leaky variant, documented)
    edges = [(1, 2)]
    got = _run(spark, edges, iterations=2)
    want = _python_pagerank(edges, iterations=2)
    assert got == want
    assert got[1] == (100 - 85) * SCALE // 100  # no in-edges: teleport only


def test_pagerank_symmetric_cycle_is_uniform(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    got = _run(spark, edges, iterations=4)
    assert len(set(got.values())) == 1  # symmetry preserved exactly
    assert got[1] == SCALE  # cycle with outdeg 1 conserves mass exactly


def test_pagerank_over_comention_graph_end_to_end(spark):
    """Webtext composition: pages -> G2 mention extraction -> co-mention
    edges (routes named on the same page) -> PageRank. Route 1 is
    co-mentioned on every page, so it must out-rank every spoke, and
    the whole run must equal the integer replay."""
    from osm_pt_validator_spark.operators.pagerank import page_rank
    from osm_pt_validator_spark.sources.pages import extract_mentions

    rows = [
        (f"https://x.example/p{i}", f"see ROUTE:1 and also ROUTE:{i + 2} today")
        for i in range(6)
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    m = extract_mentions(pages).filter(F.col("kind") == "route").select(
        "url", F.col("entity_id").alias("route")
    )
    a, b = m.alias("a"), m.alias("b")
    edges_df = (
        a.join(b, "url")
        .filter(F.col("a.route") != F.col("b.route"))
        .select(F.col("a.route").alias("src"), F.col("b.route").alias("dst"))
    )
    got = {r.node: r.rank for r in page_rank(edges_df, iterations=3).collect()}
    want_edges = []
    for i in range(6):
        want_edges += [(1, i + 2), (i + 2, 1)]
    want = _python_pagerank(want_edges, iterations=3)
    assert got == want
    assert got[1] == max(got.values())


def test_pagerank_oracle_sql_matches_spark(spark):
    import duckdb

    from osm_pt_validator_spark.operators.pagerank import page_rank_sql

    edges = [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7]
    got = _run(spark, edges, iterations=3)
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = page_rank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iterations=3
    )
    want = {int(n): int(r) for n, r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_shortest_paths_vs_python_bellman_ford(spark):
    from osm_pt_validator_spark.operators.graph import shortest_paths

    # weighted digraph with a shorter multi-hop alternative to a direct
    # edge, an unreachable node, and two sources
    E = [
        (1, 2, 100), (2, 3, 100), (1, 3, 500),  # 1->3 direct loses
        (3, 4, 50), (10, 11, 7),  # second component from source 10
        (5, 1, 1),  # edge INTO a source (only matters undirected)
    ]
    edges = spark.createDataFrame(E, "src long, dst long, w_mm long")
    sources = spark.createDataFrame([(1,), (10,)], "node long")
    got = {
        r.node: r.dist_mm
        for r in shortest_paths(edges, sources, rounds=4).collect()
    }

    import itertools

    dist = {1: 0, 10: 0}
    for _ in range(4):
        for s, d, w in E:
            if s in dist and dist[s] + w < dist.get(d, 1 << 60):
                dist[d] = dist[s] + w
    assert got == dist
    assert got[3] == 200 and got[4] == 250 and got[11] == 7
    assert 5 not in got  # unreachable in the directed graph
    # undirected: node 5 is one reverse edge from source 1
    und = {
        r.node: r.dist_mm
        for r in shortest_paths(edges, sources, rounds=4, directed=False).collect()
    }
    assert und[5] == 1
    # K-hop semantics: with rounds=1 only direct neighbors are reached
    one = {
        r.node: r.dist_mm
        for r in shortest_paths(edges, sources, rounds=1).collect()
    }
    assert one == {1: 0, 10: 0, 2: 100, 3: 500, 11: 7}
