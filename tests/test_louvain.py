"""Gates for the deterministic two-level Louvain (operators/louvain.py):
closed-form convergence on literal graphs, oscillation-schedule sanity,
modularity quality, and DuckDB oracle parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
    modularity,
)
from personalized_pagerank_algorithms_on_neo4j_spark.graph import PropertyGraph
from personalized_pagerank_algorithms_on_neo4j_spark.operators.louvain import (
    louvain,
    louvain_oracle_sql,
)
from tests.graphfixtures import edges_df as _edges_df
from tests.graphfixtures import edges_sql as _edges_sql

TWO_TRI = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]


def _graph_of(spark, pairs, n):
    nodes = spark.createDataFrame(
        [(i, f"n{i}") for i in range(n)], "id long, name string"
    )
    return PropertyGraph(spark, nodes, _edges_df(spark, pairs))


def _nodes_sql(n):
    vals = ",".join(f"({i})" for i in range(n))
    return f"SELECT * FROM (VALUES {vals}) AS t(id)"


def test_louvain_finds_the_two_triangles(spark):
    # the textbook fixture: local moving must settle each triangle into one
    # community (the pure-synchronous variant oscillates here — this pins
    # the parity schedule actually breaking the swap)
    got = {
        r["node"]: r["label"]
        for r in louvain(_graph_of(spark, TWO_TRI, 6)).collect()
    }
    assert len(got) == 6
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_louvain_modularity_is_optimal_on_two_triangles(spark):
    # Q of the found partition == the known optimum 2 * (14*6-49)/196
    g = _graph_of(spark, TWO_TRI, 6)
    labels = louvain(g)
    q = sum(r["q_term"] for r in modularity(g.edges, labels).collect())
    assert abs(q - 2 * (14 * 6 - 49) / 196) < 5e-9  # two ROUND(_,9) terms


def test_louvain_pair_swap_settles(spark):
    # one edge between two odd-parity nodes: a fully synchronous schedule
    # swaps their labels forever; the parity schedule makes the move
    # one-sided and they must merge into a single community
    got = {
        r["node"]: r["label"]
        for r in louvain(_graph_of(spark, [(1, 2)], 3)).collect()
    }
    assert got[1] == got[2]
    assert got[0] != got[1]  # the isolated node stays its own community


def test_louvain_isolated_nodes_keep_their_own_community(spark):
    got = {
        r["node"]: r["label"]
        for r in louvain(_graph_of(spark, TWO_TRI, 8)).collect()
    }
    assert got[6] == 6 and got[7] == 7


def test_louvain_weighted_uniform_equals_unweighted(spark):
    """With unit weights the weighted recurrence degenerates to the
    unweighted one on edge-incident nodes, and weights must be able to
    flip a community choice (a heavy bridge pulls its endpoint across)."""
    import pytest as _pytest

    from personalized_pagerank_algorithms_on_neo4j_spark.operators.louvain import (
        louvain_weighted,
    )

    g = _graph_of(spark, TWO_TRI, 6)
    base = {r["node"]: r["label"] for r in louvain(g).collect()}
    ew = _edges_df(spark, TWO_TRI).select("src", "dst", F.lit(1).alias("weight"))
    uni = {r["node"]: r["label"] for r in louvain_weighted(ew).collect()}
    assert uni == {n: l for n, l in base.items() if n in uni} and len(uni) == 6
    # make the bridge 2-3 massively heavy: nodes 2 and 3 must co-locate
    heavy = _edges_df(spark, TWO_TRI).select(
        "src",
        "dst",
        F.when(
            (F.col("src") == 2) & (F.col("dst") == 3), F.lit(50)
        ).otherwise(F.lit(1)).alias("weight"),
    )
    hv = {r["node"]: r["label"] for r in louvain_weighted(heavy).collect()}
    assert hv[2] == hv[3]
    with _pytest.raises(ValueError):
        louvain_weighted(
            _edges_df(spark, TWO_TRI).select(
                "src", "dst", F.lit(0).alias("weight")
            )
        )


def test_louvain_weighted_oracle_parity(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.louvain import (
        louvain_weighted,
        louvain_weighted_oracle_sql,
    )

    ew = _edges_df(spark, TWO_TRI).select(
        "src", "dst", (F.col("src") + F.col("dst") + 1).alias("weight")
    )
    got = sorted((r["node"], r["label"]) for r in louvain_weighted(ew).collect())
    vals = ",".join(f"({a},{b},{a + b + 1})" for a, b in TWO_TRI)
    want = sorted(
        (int(a), int(b))
        for a, b in duckdb.sql(
            louvain_weighted_oracle_sql(
                f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
            )
        ).fetchall()
    )
    assert got == want and len(got) == 6


def test_louvain_oracle_parity(spark):
    got = sorted(
        (r["node"], r["label"])
        for r in louvain(_graph_of(spark, TWO_TRI, 6)).collect()
    )
    want = sorted(
        (int(a), int(b))
        for a, b in duckdb.sql(
            louvain_oracle_sql(_edges_sql(TWO_TRI), _nodes_sql(6))
        ).fetchall()
    )
    assert got == want


def test_louvain_refined_connectivity_guarantee(spark, tpch_graph):
    """The Leiden guarantee (Traag et al. 2019): every refined community
    is internally connected, the refinement is a strict refinement of
    the Louvain labels, and on this fixture it actually repairs
    something (plain Louvain emits disconnected communities here)."""
    from collections import defaultdict

    from personalized_pagerank_algorithms_on_neo4j_spark.operators.louvain import (
        louvain,
        louvain_refined,
    )

    g = tpch_graph
    base = {r.node: r.label for r in louvain(g).collect()}
    ref = {r.node: r.label for r in louvain_refined(g).collect()}
    assert set(base) == set(ref)
    # refinement: each refined community sits inside ONE louvain community
    inv = defaultdict(set)
    for v, l in ref.items():
        inv[l].add(base[v])
    assert all(len(s) == 1 for s in inv.values())
    # connectivity of every refined community (python BFS over intra edges)
    edges = [(r.src, r.dst) for r in g.edges.select("src", "dst").collect()]
    adj = defaultdict(set)
    for u, v in edges:
        if u != v and ref[u] == ref[v]:
            adj[u].add(v)
            adj[v].add(u)
    comms = defaultdict(set)
    for v, l in ref.items():
        comms[l].add(v)
    for members in comms.values():
        start = next(iter(members))
        seen, stack = {start}, [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y in members and y not in seen:
                    seen.add(y)
                    stack.append(y)
        assert seen == members
    # the repair must BITE on this fixture (Louvain emits disconnected
    # communities here — if testdata drift ever makes this vacuous, the
    # operator needs a harder fixture, not a weaker test)
    assert len(set(ref.values())) > len(set(base.values()))
