"""Hypothesis property tests for the round-9 oracle builders: each
generated DuckDB oracle must equal an independent pure-Python replay on
random graphs (no Spark in the loop — this hardens the SQL generators
themselves, the half of every gate that has no pytest of its own)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

# ~2.5 min of DuckDB-side fuzzing (the unrolled coloring oracle plans a
# few hundred CTEs per example): CI tier, not the dev loop
pytestmark = pytest.mark.slow

from personalized_pagerank_algorithms_on_neo4j_spark.operators.kpaths import (
    kpaths_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.matching import (
    matching_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.mis import (
    coloring_oracle_sql,
    luby_mis_oracle_sql,
)

N = 9

edge_lists = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=0,
    max_size=30,
).map(lambda es: sorted({(u, v) for u, v in es if u != v}))


def _ph(x, seed):
    return int(hashlib.md5(f"{x}#{seed}".encode()).hexdigest()[:12], 16)


def _con(edges, with_nodes=True):
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO e VALUES (?,?)", edges)
    if with_nodes:
        con.execute("CREATE TABLE n(node BIGINT)")
        nodes = sorted({x for e in edges for x in e})
        if nodes:
            con.executemany("INSERT INTO n VALUES (?)", [(x,) for x in nodes])
    return con


def _adj(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _py_mis(nodes, edges, seed, max_rounds):
    adj = _adj(edges)
    active, mis = set(nodes), set()
    for r in range(max_rounds):
        if not active:
            break
        pri = {v: (_ph(v, seed * 1000 + r), v) for v in active}
        winners = {
            v
            for v in active
            if all(pri[v] < pri[w] for w in adj.get(v, ()) if w in active)
        }
        mis |= winners
        removed = set(winners)
        for w in winners:
            removed |= adj.get(w, set())
        active -= removed
    assert not active
    return {n: (n in mis) for n in nodes}


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists)
def test_mis_oracle_matches_python(edges):
    nodes = sorted({x for e in edges for x in e})
    con = _con(edges)
    got = {
        int(r[0]): bool(r[1])
        for r in con.execute(
            luby_mis_oracle_sql(
                "SELECT node FROM n", "SELECT src, dst FROM e", seed=29,
                max_rounds=12,
            )
        ).fetchall()
    }
    assert got == _py_mis(nodes, edges, 29, 12)
    con.close()


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists)
def test_matching_oracle_matches_python(edges):
    und = sorted({(min(u, v), max(u, v)) for u, v in edges})
    active, want = set(und), set()
    for r in range(12):
        if not active:
            break
        pri = {
            e: (_ph(f"{e[0]}_{e[1]}", 37 * 1000 + r), e[0], e[1])
            for e in active
        }
        node_min: dict[int, tuple] = {}
        for e, p in pri.items():
            for n in e:
                if n not in node_min or p < node_min[n]:
                    node_min[n] = p
        winners = {
            e for e, p in pri.items()
            if node_min[e[0]] == p and node_min[e[1]] == p
        }
        want |= winners
        matched = {n for e in winners for n in e}
        active = {
            e for e in active if e[0] not in matched and e[1] not in matched
        }
    assert not active
    con = _con(edges, with_nodes=False)
    got = {
        (int(a), int(b))
        for a, b in con.execute(
            matching_oracle_sql("SELECT src, dst FROM e", seed=37, max_rounds=12)
        ).fetchall()
    }
    assert got == want
    con.close()


@settings(max_examples=25, deadline=None)
@given(edges=edge_lists)
def test_coloring_oracle_matches_python_and_is_proper(edges):
    nodes = sorted({x for e in edges for x in e})
    adj = _adj(edges)
    active, want = set(nodes), {}
    for c in range(10):
        if not active:
            break
        layer = _py_mis(sorted(active), edges_restricted(edges, active), 31 * 100 + c, 12)
        mis = {n for n, w in layer.items() if w}
        for v in mis:
            want[v] = c
        active -= mis
    assert not active
    con = _con(edges)
    got = {
        int(r[0]): int(r[1])
        for r in con.execute(
            coloring_oracle_sql(
                "SELECT node FROM n", "SELECT src, dst FROM e", seed=31,
                max_colors=10, max_rounds=12,
            )
        ).fetchall()
    }
    assert got == want
    assert not any(got[u] == got[v] for u, v in edges)
    con.close()


def edges_restricted(edges, active):
    return [(u, v) for u, v in edges if u in active and v in active]


@settings(max_examples=25, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(1, 9)),
        min_size=0,
        max_size=25,
    ).map(lambda es: [(u, v, w) for u, v, w in es if u != v])
)
def test_kpaths_oracle_matches_brute_force(edges):
    # dedupe parallel edges by min weight (a weighted edge LIST would
    # multiply paths; the operator contract is a weighted simple graph)
    best: dict[tuple[int, int], int] = {}
    for u, v, w in edges:
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    simple = [(u, v, w) for (u, v), w in sorted(best.items())]
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in simple:
        adj.setdefault(u, []).append((v, w))
    out = []

    def dfs(node, path, cost):
        if node == 7:
            out.append((cost, tuple(path)))
        if len(path) == 5:
            return
        for v, w in adj.get(node, []):
            if v not in path:
                dfs(v, path + [v], cost + w)

    dfs(0, [0], 0)
    out.sort()
    want = [
        (i + 1, c, "->".join(map(str, p)))
        for i, (c, p) in enumerate(out[:4])
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT, w BIGINT)")
    if simple:
        con.executemany("INSERT INTO e VALUES (?,?,?)", simple)
    got = [
        (int(r[0]), int(r[1]), r[2])
        for r in con.execute(
            kpaths_oracle_sql("SELECT * FROM e", "0", "7", k=4, max_hops=4)
        ).fetchall()
    ]
    assert got == want
    con.close()
