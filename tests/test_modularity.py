"""Gates for modularity and degree assortativity
(functions/graphstats.py): hand-computed closed forms on literal graphs
plus DuckDB oracle parity — the same cross-engine discipline as every
other operator."""

from __future__ import annotations

import duckdb

from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
    assortativity_oracle_sql,
    conductance,
    conductance_oracle_sql,
    degree_assortativity,
    modularity,
    modularity_oracle_sql,
)
from tests.graphfixtures import edges_df as _edges_df
from tests.graphfixtures import edges_sql as _edges_sql
from tests.graphfixtures import labels_sql as _labels_sql

# two triangles joined by one bridge edge: the textbook modularity fixture
TWO_TRI = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
TWO_TRI_LABELS = [(0, 10), (1, 10), (2, 10), (3, 20), (4, 20), (5, 20)]


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------


def test_modularity_two_triangles_exact(spark):
    # m = 7, m2 = 14; each triangle community: w = 6 directed-within rows,
    # degree sum 7 (2+2+3) -> q = (14*6 - 49) / 196 = 35/196 = 0.178571429
    out = {
        r["label"]: r
        for r in modularity(
            _edges_df(spark, TWO_TRI),
            spark.createDataFrame(TWO_TRI_LABELS, "node long, label long"),
        ).collect()
    }
    assert set(out) == {10, 20}
    for lbl in (10, 20):
        r = out[lbl]
        assert r["n_nodes"] == 3
        assert r["inside_edges"] == 3
        assert r["degree_sum"] == 7
        assert r["q_term"] == round(35 / 196, 9)


def test_modularity_single_community_is_zero(spark):
    # everything in one community: Q = m/m - (2m/2m)^2 = 0 exactly
    labels = spark.createDataFrame(
        [(n, 1) for n in range(6)], "node long, label long"
    )
    rows = modularity(_edges_df(spark, TWO_TRI), labels).collect()
    assert len(rows) == 1
    assert rows[0]["inside_edges"] == 7 and rows[0]["degree_sum"] == 14
    assert rows[0]["q_term"] == 0.0


def test_modularity_edgeless_is_null(spark):
    labels = spark.createDataFrame([(0, 1), (1, 2)], "node long, label long")
    rows = modularity(
        spark.createDataFrame([], "src long, dst long"), labels
    ).collect()
    assert {r["label"] for r in rows} == {1, 2}
    assert all(r["q_term"] is None and r["degree_sum"] == 0 for r in rows)


def test_modularity_oracle_parity(spark):
    got = {
        tuple(r)
        for r in modularity(
            _edges_df(spark, TWO_TRI),
            spark.createDataFrame(TWO_TRI_LABELS, "node long, label long"),
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            modularity_oracle_sql(
                _edges_sql(TWO_TRI), _labels_sql(TWO_TRI_LABELS)
            )
        ).fetchall()
    }
    assert got == want and len(got) == 2


# ---------------------------------------------------------------------------
# conductance
# ---------------------------------------------------------------------------


def test_conductance_two_triangles_exact(spark):
    # m2 = 14; each triangle community: volume 7 (degrees 2+2+3), one
    # boundary edge -> phi = 1 / min(7, 7) = 1/7
    out = {
        r["label"]: r
        for r in conductance(
            _edges_df(spark, TWO_TRI),
            spark.createDataFrame(TWO_TRI_LABELS, "node long, label long"),
        ).collect()
    }
    assert set(out) == {10, 20}
    for lbl in (10, 20):
        r = out[lbl]
        assert r["n_nodes"] == 3
        assert r["cut_edges"] == 1
        assert r["volume"] == 7
        assert r["conductance"] == round(1 / 7, 9)


def test_conductance_single_community_is_null(spark):
    # the whole graph in one community: min(vol, m2 - vol) = 0 -> undefined
    labels = spark.createDataFrame(
        [(n, 1) for n in range(6)], "node long, label long"
    )
    rows = conductance(_edges_df(spark, TWO_TRI), labels).collect()
    assert len(rows) == 1
    assert rows[0]["cut_edges"] == 0 and rows[0]["volume"] == 14
    assert rows[0]["conductance"] is None


def test_conductance_isolated_community_is_null(spark):
    # a label whose nodes touch no edge: volume 0 -> NULL, n_nodes only
    labels = spark.createDataFrame(
        TWO_TRI_LABELS + [(99, 30)], "node long, label long"
    )
    out = {
        r["label"]: r
        for r in conductance(_edges_df(spark, TWO_TRI), labels).collect()
    }
    assert out[30]["n_nodes"] == 1 and out[30]["volume"] == 0
    assert out[30]["conductance"] is None
    assert out[10]["conductance"] == round(1 / 7, 9)


def test_conductance_oracle_parity(spark):
    got = {
        tuple(r)
        for r in conductance(
            _edges_df(spark, TWO_TRI),
            spark.createDataFrame(TWO_TRI_LABELS, "node long, label long"),
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            conductance_oracle_sql(
                _edges_sql(TWO_TRI), _labels_sql(TWO_TRI_LABELS)
            )
        ).fetchall()
    }
    assert got == want and len(got) == 2


# ---------------------------------------------------------------------------
# k-truss
# ---------------------------------------------------------------------------


def test_ktruss_peels_the_bridge(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        k_truss,
    )

    # each triangle edge closes exactly one triangle; the bridge closes
    # none -> the 3-truss is the two triangles, support 1 everywhere
    got = {
        (r["u"], r["v"]): r["support"]
        for r in k_truss(_edges_df(spark, TWO_TRI), k=3).collect()
    }
    assert got == {
        (0, 1): 1, (1, 2): 1, (0, 2): 1,
        (3, 4): 1, (4, 5): 1, (3, 5): 1,
    }


def test_ktruss_k4_on_clique(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        k_truss,
    )

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    # K4: every edge closes two triangles -> the 4-truss is all of K4;
    # the two-triangle graph has no edge with support >= 2 -> empty
    got = {
        (r["u"], r["v"]): r["support"]
        for r in k_truss(_edges_df(spark, k4), k=4).collect()
    }
    assert got == {(a, b): 2 for a, b in k4}
    assert k_truss(_edges_df(spark, TWO_TRI), k=4).count() == 0


def test_ktruss_oracle_parity(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        k_truss,
        k_truss_oracle_sql,
    )

    got = sorted(
        tuple(r) for r in k_truss(_edges_df(spark, TWO_TRI), k=3).collect()
    )
    want = sorted(
        tuple(int(x) for x in r)
        for r in duckdb.sql(
            k_truss_oracle_sql(_edges_sql(TWO_TRI), k=3, rounds=3)
        ).fetchall()
    )
    assert got == want and len(got) == 6


# ---------------------------------------------------------------------------
# degree assortativity
# ---------------------------------------------------------------------------


def test_assortativity_star_is_minus_one(spark):
    # K_{1,3}: every edge joins the hub (deg 3) to a leaf (deg 1) —
    # perfectly disassortative, r = -1 exactly
    rows = degree_assortativity(
        _edges_df(spark, [(0, 1), (0, 2), (0, 3)])
    ).collect()
    assert rows == [rows[0]]
    assert rows[0]["m_edges"] == 3 and rows[0]["assortativity"] == -1.0


def test_assortativity_regular_graph_is_null(spark):
    # a triangle is 2-regular: zero degree variance -> undefined (NULL)
    rows = degree_assortativity(
        _edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    ).collect()
    assert rows[0]["m_edges"] == 3 and rows[0]["assortativity"] is None


def test_assortativity_oracle_parity(spark):
    got = {tuple(r) for r in degree_assortativity(_edges_df(spark, TWO_TRI)).collect()}
    want = {
        tuple(r)
        for r in duckdb.sql(assortativity_oracle_sql(_edges_sql(TWO_TRI))).fetchall()
    }
    assert got == want and len(got) == 1


# ---------------------------------------------------------------------------
# landmark closeness centrality
# ---------------------------------------------------------------------------


def _graph_of(spark, pairs):
    from personalized_pagerank_algorithms_on_neo4j_spark.graph import PropertyGraph

    edges = spark.createDataFrame(pairs, "src long, dst long")
    nodes = (
        edges.selectExpr("src AS id")
        .unionAll(edges.selectExpr("dst AS id"))
        .distinct()
        .selectExpr("id", "CAST(id AS STRING) AS name")
    )
    return PropertyGraph(spark, nodes, edges, nodes_cover_edges=True)


def test_closeness_path_hand_computed(spark):
    # directed path 0->1->2 with landmarks {0, 1} (both out-degree 1):
    # node 1: reached by 0 at dist 1 -> 1/1 = 1.0
    # node 2: reached by 0 at 2 and 1 at 1 -> 2/3
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.bfs import (
        closeness_centrality,
    )

    g = _graph_of(spark, [(0, 1), (1, 2)])
    out = {r["node"]: r for r in
           closeness_centrality(g, n_landmarks=2, max_hops=5).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_reached"] == 1 and out[1]["total_dist"] == 1
    assert out[1]["closeness"] == 1.0
    assert out[2]["n_reached"] == 2 and out[2]["total_dist"] == 3
    assert out[2]["closeness"] == round(2 / 3, 6)


def test_closeness_oracle_parity(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.bfs import (
        closeness_centrality,
        closeness_oracle_sql,
    )

    got = {
        tuple(r)
        for r in closeness_centrality(
            _graph_of(spark, TWO_TRI), n_landmarks=3, max_hops=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            closeness_oracle_sql(_edges_sql(TWO_TRI), n_landmarks=3, max_hops=4)
        ).fetchall()
    }
    assert got == want and got
