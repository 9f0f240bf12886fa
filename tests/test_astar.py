"""A* single-pair shortest path (operators/astar): distance parity with
plain SSSP, the expanded-states bound, ALT admissibility, unreachable
pairs, and an oracle fuzz against pure-Python Dijkstra."""

from __future__ import annotations

import heapq

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.operators.astar import (
    alt_heuristic,
    astar_oracle_sql,
    astar_single_pair,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.sssp import (
    sssp_weighted,
    undirected_min_cost,
)


def _grid_edges(spark, w=6, h=6):
    """Undirected w x h grid with deterministic positive costs — long
    shortest paths, so the landmark heuristic has something to prune."""
    rows = []
    for y in range(h):
        for x in range(w):
            u = y * w + x
            if x + 1 < w:
                rows.append((u, u + 1, 1 + (x + y) % 3))
            if y + 1 < h:
                rows.append((u, u + w, 1 + (x * y) % 4))
    return undirected_min_cost(
        spark.createDataFrame(rows, "src long, dst long, w long")
    )


def test_distance_parity_with_sssp(spark):
    """A* with the ALT heuristic returns exactly the plain-SSSP distance
    for the corner-to-corner grid pair."""
    e = _grid_edges(spark).localCheckpoint(eager=True)
    n, src, dst = 36, 0, 35
    lm = spark.createDataFrame([(0,), (5,), (30,)], "source long")
    hx = alt_heuristic(spark, e, lm, target=dst, n_hint=n * 3)
    got = astar_single_pair(spark, e, src, dst, hx, n_hint=n).collect()
    want = {
        r.node: r.dist for r in sssp_weighted(spark, e, src, n_hint=n).collect()
    }
    assert len(got) == 1
    assert (got[0].src, got[0].dst, got[0].dist) == (src, dst, want[dst])


def test_expands_no_more_states_than_sssp(spark):
    """The branch-and-bound frontier never expands more states than the
    instrumented plain-SSSP baseline (heuristic=None degenerates to the
    sssp_weighted loop), and meaningfully fewer on the grid."""
    e = _grid_edges(spark).localCheckpoint(eager=True)
    n, src, dst = 36, 0, 35
    lm = spark.createDataFrame([(35,), (5,), (30,)], "source long")
    hx = alt_heuristic(spark, e, lm, target=dst, n_hint=n * 3)
    s_alt: dict = {}
    s_plain: dict = {}
    d_alt = astar_single_pair(
        spark, e, src, dst, hx, n_hint=n, _stats=s_alt
    ).collect()
    d_plain = astar_single_pair(
        spark, e, src, dst, None, n_hint=n, _stats=s_plain
    ).collect()
    assert d_alt[0].dist == d_plain[0].dist
    assert s_alt["expanded"] <= s_plain["expanded"], (s_alt, s_plain)
    # with a landmark AT the target the bound is exact along the far
    # side — the pruning must actually bite, not just tie
    assert s_alt["expanded"] < s_plain["expanded"], (s_alt, s_plain)


def test_alt_heuristic_admissible(spark):
    """h(v) <= d(v, target) for every node with a heuristic row (the
    triangle-inequality guarantee, checked exactly on the grid)."""
    e = _grid_edges(spark).localCheckpoint(eager=True)
    dst = 21
    lm = spark.createDataFrame([(0,), (35,)], "source long")
    hx = {r.node: r.h for r in alt_heuristic(spark, e, lm, target=dst).collect()}
    true_d = {
        r.node: r.dist for r in sssp_weighted(spark, e, dst, n_hint=36).collect()
    }
    assert hx
    for node, h in hx.items():
        assert node in true_d and h <= true_d[node], (node, h)


def test_unreachable_pair_is_empty(spark):
    """Two components: the result is an empty frame (matching the oracle,
    which also yields zero rows), not an error or a bogus distance."""
    e = undirected_min_cost(
        spark.createDataFrame(
            [(0, 1, 2), (2, 3, 5)], "src long, dst long, w long"
        )
    )
    lm = spark.createDataFrame([(0,)], "source long")
    hx = alt_heuristic(spark, e, lm, target=3)
    assert astar_single_pair(spark, e, 0, 3, hx, n_hint=4).count() == 0


def test_unconverged_raises(spark):
    """max_rounds too small for the diameter -> loud RuntimeError, never
    a silently wrong distance."""
    e = _grid_edges(spark).localCheckpoint(eager=True)
    lm = spark.createDataFrame([(35,)], "source long")
    hx = alt_heuristic(spark, e, lm, target=35)
    with pytest.raises(RuntimeError, match="not drained"):
        astar_single_pair(spark, e, 0, 35, hx, max_rounds=2, n_hint=36)


# --- oracle fuzz: DuckDB relaxation vs pure-Python Dijkstra -----------------

N = 8

wedges = st.lists(
    st.tuples(
        st.integers(0, N - 1), st.integers(0, N - 1), st.integers(1, 9)
    ),
    min_size=0,
    max_size=24,
).map(
    lambda es: sorted(
        {(min(u, v), max(u, v)): w for u, v, w in es if u != v}.items()
    )
)


def _py_dijkstra(edges, src):
    adj: dict[int, list[tuple[int, int]]] = {}
    for (u, v), w in edges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


@settings(max_examples=50, deadline=None)
@given(edges=wedges)
def test_oracle_matches_python_dijkstra(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE we(src BIGINT, dst BIGINT, w BIGINT)")
    rows = [(u, v, w) for (u, v), w in edges] + [
        (v, u, w) for (u, v), w in edges
    ]
    if rows:
        con.executemany("INSERT INTO we VALUES (?,?,?)", rows)
    sql = astar_oracle_sql(
        "SELECT src, dst, w FROM we",
        "SELECT CAST(0 AS BIGINT) AS s",
        f"SELECT CAST({N - 1} AS BIGINT) AS t",
        rounds=N,
    )
    got = con.execute(sql).fetchall()
    want = _py_dijkstra(edges, 0).get(N - 1)
    if want is None:
        assert got == []
    else:
        assert got == [(0, N - 1, want)]
    con.close()


def test_unconverged_heuristic_raises(spark):
    """Landmark distances that did not reach their fixed point would make
    the ALT bound inadmissible — alt_heuristic must refuse them loudly
    (review finding r10), never hand A* a silently wrong h."""
    e = _grid_edges(spark).localCheckpoint(eager=True)
    lm = spark.createDataFrame([(0,)], "source long")
    with pytest.raises(RuntimeError, match="not converged"):
        alt_heuristic(spark, e, lm, target=35, max_rounds=2, n_hint=36)
