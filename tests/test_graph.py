"""Graph analytics: integer fixed-point PageRank (Tier X)."""

from __future__ import annotations

from cl_data_frame_spark.operators import graph as G


def _mirror_pagerank(edges, n_iter=3, damping_pct=85, scale=10 ** 12):
    """Driver-side mirror of the exact integer recurrence."""
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    ranks = {a: scale for a in deg}
    teleport = (100 - damping_pct) * scale // 100
    for _ in range(n_iter):
        nxt = {}
        for a, b in und:
            nxt[b] = nxt.get(b, 0) + ranks[a] // deg[a]
        ranks = {v: teleport + (s * damping_pct) // 100
                 for v, s in nxt.items()}
    return ranks


def test_pagerank_matches_integer_mirror(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r["node"]: r["rank"]
           for r in G.pagerank(df, n_iter=3).spark_df.collect()}
    assert out == _mirror_pagerank(edges, n_iter=3)


def test_pagerank_star_center_ranks_highest(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r["node"]: r["rank"]
           for r in G.pagerank(df, n_iter=4).spark_df.collect()}
    assert out[0] == max(out.values())
    leaves = {out[i] for i in range(1, 6)}
    assert len(leaves) == 1  # symmetric leaves tie exactly


def test_pagerank_rank_scaled_and_validation(spark):
    import pytest
    df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    rows = G.pagerank(df, n_iter=2).spark_df.collect()
    for r in rows:
        assert abs(r["rank_scaled"] - r["rank"] / 1e12) < 1e-6
    with pytest.raises(ValueError):
        G.pagerank(df, damping_pct=0)


def test_triangle_counts_known_graph(spark):
    from cl_data_frame_spark.operators.graph import triangle_counts
    # 1-2-3 triangle + pendant 4 on node 3; reversed/dup edges collapse
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r.node: (r.degree, r.triangles)
           for r in triangle_counts(df).spark_df.collect()}
    assert got[1] == (2, 1)
    assert got[2] == (2, 1)
    assert got[3] == (3, 1)
    assert got[4] == (1, 0)


def test_triangle_counts_two_triangles_share_edge(spark):
    from cl_data_frame_spark.operators.graph import triangle_counts
    # triangles (1,2,3) and (2,3,4) share edge 2-3
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r.node: r.triangles for r in triangle_counts(df).spark_df.collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_bfs_distances_chain_and_multisource(spark):
    from cl_data_frame_spark.operators.graph import bfs_distances
    # chain 1-2-3-4-5 plus isolated pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        "id_a bigint, id_b bigint")
    # default source = min node (1)
    d = {r["node"]: r["dist"] for r in
         bfs_distances(pairs, max_hops=3).spark_df.collect()}
    assert d == {1: 0, 2: 1, 3: 2, 4: 3}      # 5 beyond 3 hops; 10/11 unreachable
    # multi-source: min over seeds
    d2 = {r["node"]: r["dist"] for r in
          bfs_distances(pairs, sources=[5, 10],
                        max_hops=2).spark_df.collect()}
    assert d2 == {5: 0, 10: 0, 4: 1, 11: 1, 3: 2}
    # early exit when the frontier drains (hops > diameter)
    d3 = {r["node"]: r["dist"] for r in
          bfs_distances(pairs, sources=[10],
                        max_hops=99).spark_df.collect()}
    assert d3 == {10: 0, 11: 1}
