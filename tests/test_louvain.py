"""Gates for the deterministic two-level Louvain (operators/louvain.py):
closed-form convergence on literal graphs, oscillation-schedule sanity,
modularity quality, and DuckDB oracle parity."""

from __future__ import annotations

import duckdb

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
