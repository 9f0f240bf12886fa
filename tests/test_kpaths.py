"""Yen's K shortest paths (round 9): brute-force parity, deterministic
tie order, and the cross-algorithm DuckDB oracle."""

from __future__ import annotations

import random

import duckdb

from personalized_pagerank_algorithms_on_neo4j_spark.operators.kpaths import (
    kpaths_oracle_sql,
    yen_k_shortest,
)


def _brute(edges, s, t, k, max_hops):
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    out = []

    def dfs(node, path, cost):
        if node == t:
            out.append((cost, tuple(path)))
        if len(path) == max_hops + 1:
            return
        for v, w in adj.get(node, []):
            if v not in path:
                dfs(v, path + [v], cost + w)

    dfs(s, [s], 0)
    out.sort()
    return [
        (i + 1, c, "->".join(map(str, p))) for i, (c, p) in enumerate(out[:k])
    ]


def _rows(df):
    return [(r["rank"], r["cost"], r["path"]) for r in df.collect()]


def test_kpaths_hand_fixture_with_tie(spark):
    """0->1->3 and 0->2->3 tie at cost 2: (cost, path) order must rank
    the lexicographically-smaller node array first; the direct 0->3 edge
    (cost 3) ties the 3-hop 0->1->2->3 and sorts AFTER it ([0,1,..] <
    [0,3])."""
    edges = [(0, 1, 1), (1, 3, 1), (0, 2, 1), (2, 3, 1), (0, 3, 3), (1, 2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = _rows(yen_k_shortest(spark, df, 0, 3, k=4, max_hops=4))
    assert got == [
        (1, 2, "0->1->3"),
        (2, 2, "0->2->3"),
        (3, 3, "0->1->2->3"),
        (4, 3, "0->3"),
    ]


def test_kpaths_random_graphs_match_brute_and_oracle(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 12
        es = set()
        while len(es) < 30:
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                es.add((u, v))
        edges = [(u, v, rng.randint(1, 9)) for u, v in sorted(es)]
        df = spark.createDataFrame(edges, "src long, dst long, w long")
        got = _rows(yen_k_shortest(spark, df, 0, n - 1, k=5, max_hops=5))
        want = _brute(edges, 0, n - 1, 5, 5)
        assert got == want, seed  # seed 3 yields ZERO paths: both empty
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT, w BIGINT)")
        con.executemany("INSERT INTO e VALUES (?,?,?)", edges)
        orc = [
            (int(r[0]), int(r[1]), r[2])
            for r in con.execute(
                kpaths_oracle_sql(
                    "SELECT * FROM e", "0", str(n - 1), k=5, max_hops=5
                )
            ).fetchall()
        ]
        assert orc == want, seed


def test_kpaths_unreachable_target(spark):
    df = spark.createDataFrame([(0, 1, 1)], "src long, dst long, w long")
    assert yen_k_shortest(spark, df, 0, 99, k=3, max_hops=4).count() == 0


def test_kpaths_hop_budget_binds(spark):
    """A cheap long path must lose to an expensive short one when the
    budget excludes it."""
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 100)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = _rows(yen_k_shortest(spark, df, 0, 3, k=2, max_hops=1))
    assert got == [(1, 100, "0->3")]
