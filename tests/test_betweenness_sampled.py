"""Pivot-sampled betweenness (round 9): exact degeneration at k == n,
seeded determinism, and DuckDB-oracle parity."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import duckdb

from personalized_pagerank_algorithms_on_neo4j_spark.graph import PropertyGraph
from personalized_pagerank_algorithms_on_neo4j_spark.operators.betweenness import (
    DELTA_SCALE,
    betweenness_landmarks,
    betweenness_sampled,
    betweenness_sampled_oracle_sql,
)


def _py_brandes_micros(edges, sources, max_hops):
    """Pure-Python replay of the quantized micro-unit Brandes recurrence."""
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    total = defaultdict(int)
    for s in sources:
        dist, sigma = {s: 0}, {s: 1}
        levels = defaultdict(list)
        levels[0].append(s)
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_hops:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    levels[dist[w]].append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[v]
        lmax = max(dist.values())
        if lmax == 0:
            continue
        delta = {v: 0 for v in levels[lmax]}
        for lvl in range(lmax - 1, 0, -1):
            nxt = {}
            for v in levels[lvl]:
                acc = 0
                for w in adj[v]:
                    if dist.get(w) == lvl + 1:
                        acc += round(
                            sigma[v] / sigma[w] * (DELTA_SCALE + delta[w])
                        )
                nxt[v] = acc
            for v, d in nxt.items():
                total[v] += d
            delta = nxt
    return dict(total)


def _graph_of(spark, edges):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ndf = spark.createDataFrame([(n, f"n{n}") for n in nodes], "id long, name string")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return PropertyGraph(spark, ndf, edf)


def test_sampled_equals_exact_when_all_pivots(spark):
    """k >= n_eligible makes the n_eligible/k scale 1 and the pivot set
    the FULL eligible set: the estimator must equal the full quantized
    Brandes sum."""
    rng = random.Random(5)
    edges = sorted({(rng.randrange(10), rng.randrange(10)) for _ in range(25)})
    edges = [(u, v) for u, v in edges if u != v]
    g = _graph_of(spark, edges)
    got = {
        r["node"]: r["bc_micros_est"]
        for r in betweenness_sampled(g, n_pivots=1000, seed=3, max_hops=8).collect()
    }
    eligible = sorted({u for u, _ in edges})
    want = _py_brandes_micros(edges, eligible, max_hops=8)
    want = {n: d for n, d in want.items()}
    assert {k: v for k, v in got.items() if v or want.get(k)} == {
        k: v for k, v in want.items() if v or got.get(k)
    }


def test_sampled_is_seed_deterministic(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (2, 4)]
    g = _graph_of(spark, edges)
    a = sorted(
        map(tuple, betweenness_sampled(g, n_pivots=2, seed=7).collect())
    )
    b = sorted(
        map(tuple, betweenness_sampled(g, n_pivots=2, seed=7).collect())
    )
    assert a == b and a
    c = sorted(
        map(tuple, betweenness_sampled(g, n_pivots=2, seed=8).collect())
    )
    # different seed -> (almost surely) different pivot set on this graph;
    # the guard is just that seed participates, so allow equality of
    # VALUES but require the call to succeed
    assert isinstance(c, list)


def test_sampled_matches_oracle(spark):
    rng = random.Random(11)
    edges = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(30)})
    edges = [(u, v) for u, v in edges if u != v]
    g = _graph_of(spark, edges)
    got = {
        r["node"]: r["bc_micros_est"]
        for r in betweenness_sampled(g, n_pivots=4, seed=9, max_hops=6).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE ed(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO ed VALUES (?, ?)", edges)
    orc = {
        int(r[0]): int(r[1])
        for r in con.execute(
            betweenness_sampled_oracle_sql(
                "SELECT src, dst FROM ed", n_pivots=4, seed=9, max_hops=6
            )
        ).fetchall()
    }
    assert got == orc


def test_landmark_variant_unchanged(spark):
    """The refactor must not move the top-degree landmark behavior."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)]
    g = _graph_of(spark, edges)
    got = {
        r["node"]: r["bc_micros"]
        for r in betweenness_landmarks(g, n_landmarks=2, max_hops=4).collect()
    }
    want = _py_brandes_micros(edges, [0, 2], max_hops=4)  # top out-degree: 0(3), 1/2 tie (2 by id... 1 has 1? out-degrees: 0->3, 1->1, 2->1) -> landmarks [0, 1]
    want = _py_brandes_micros(edges, [0, 1], max_hops=4)
    assert {k: v for k, v in got.items() if v} == {
        k: v for k, v in want.items() if v
    }
