"""Borůvka spanning forest + single-linkage hierarchy (operators/mst.py).

Strategy mirrors test_scc: hand fixtures for the deterministic tie-break,
brute-force randoms against a pure-Python Kruskal with the IDENTICAL strict
total order (the forest is unique under a strict order, so two different
correct algorithms must agree edge-for-edge), and DuckDB-oracle parity so
the unrolled-rounds twin is exercised off the driver path too."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.operators.mst import (
    boruvka_msf,
    boruvka_oracle_sql,
    single_linkage_clusters,
    single_linkage_oracle_sql,
)


def _kruskal(edges, maximize):
    """Reference MST: same canonicalization, same strict (sw, u, v) order."""
    ce = {}
    for s, d, w in edges:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        if (u, v) in ce:
            ce[(u, v)] = (max if maximize else min)(ce[(u, v)], w)
        else:
            ce[(u, v)] = w
    order = sorted(((-w if maximize else w), u, v) for (u, v), w in ce.items())
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for _, u, v in order:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.append((u, v, ce[(u, v)]))
    return sorted(out)


def _edges_con(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT, weight BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    return con


def test_boruvka_tie_break_and_parallel_edges(spark):
    """All-equal weights force every choice through the (u, v) tie-break;
    parallel edges keep the best weight; self-loops never appear."""
    edges = [
        (1, 2, 5), (2, 1, 5), (2, 3, 5), (3, 4, 5), (4, 1, 5),
        (1, 3, 5), (2, 2, 1),          # self-loop: best weight, still out
        (3, 4, 9),                     # parallel: min wins when minimizing
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = sorted(
        (r["u"], r["v"], r["weight"]) for r in boruvka_msf(df).collect()
    )
    assert got == _kruskal(edges, False) == [(1, 2, 5), (1, 3, 5), (1, 4, 5)]
    # maximizing flips the parallel-edge rule AND the edge choice order
    got_max = sorted(
        (r["u"], r["v"], r["weight"])
        for r in boruvka_msf(df, maximize=True).collect()
    )
    assert got_max == _kruskal(edges, True)
    assert (3, 4, 9) in got_max


def test_boruvka_matches_kruskal_and_oracle_on_randoms(spark):
    """Random multigraphs (duplicate weights on purpose: weight range is
    narrow, so ties are everywhere): Spark Borůvka == Kruskal == the
    unrolled DuckDB oracle, for both orientations."""
    rng = random.Random(29)
    for trial in range(2):
        n = rng.randint(8, 22)
        m = rng.randint(n, 3 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.randrange(1, 7))
            for _ in range(m)
        ]
        con = _edges_con(edges)
        for maximize in (False, True):
            df = spark.createDataFrame(edges, "src long, dst long, weight long")
            got = sorted(
                (r["u"], r["v"], r["weight"])
                for r in boruvka_msf(df, maximize=maximize).collect()
            )
            want = _kruskal(edges, maximize)
            assert got == want, (trial, maximize)
            oracle = sorted(
                (int(a), int(b), int(w))
                for a, b, w in con.execute(
                    boruvka_oracle_sql(
                        "SELECT src, dst, weight FROM e",
                        rounds=8,
                        maximize=maximize,
                    )
                ).fetchall()
            )
            assert oracle == want, (trial, maximize, "oracle")


def test_boruvka_strict_raises_on_truncation(spark):
    """A round budget too small must raise (a truncated forest silently
    under-connects — the dedup_clusters discipline), and strict=False
    returns the partial forest instead.  Weights ALTERNATE low/high so
    round 1 picks only the low edges (an ascending path would finish in
    one round: every node's argmin already covers every edge)."""
    edges = [(i, i + 1, 1 if i % 2 == 0 else 9) for i in range(8)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    with pytest.raises(RuntimeError, match="not converged"):
        boruvka_msf(df, max_rounds=1, strict=True).count()
    partial = boruvka_msf(df, max_rounds=1, strict=False).collect()
    assert 0 < len(partial) < 8
    full = boruvka_msf(df, max_rounds=6).collect()
    assert len(full) == 8  # spanning tree of the path


def test_dedup_clusters_jump_converges_on_deep_chain(spark):
    """jump=True (pointer-jumping shortcut) must label a 200-node chain —
    the adversarial input the plain 1-hop path documents — within
    max_iters=20 (log2(200) ~ 8 combined rounds), and agree with the
    plain path on shallow components."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.dedup import (
        dedup_clusters,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "doc_a long, doc_b long"
    )
    out = dedup_clusters(chain, max_iters=20, strict=True, jump=True).collect()
    assert len(out) == 200 and all(r["cluster_id"] == 0 for r in out)
    shallow = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    plain = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters(shallow, jump=False).collect()
    )
    jumped = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters(shallow, jump=True).collect()
    )
    assert plain == jumped


def test_single_linkage_equals_thresholded_components(spark):
    """The composition's load-bearing identity: cutting the MAXIMUM
    spanning forest at t yields the connected components of the FULL
    graph restricted to weight >= t (max-bottleneck property) — checked
    against the oracle, which computes the right side, plus the singleton
    coalesce rule for isolated nodes."""
    rng = random.Random(41)
    n = 30
    edges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 10))
        for _ in range(55)
    ]
    nodes = [(i,) for i in range(n + 2)]  # n, n+1: isolated -> own cluster
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    nd = spark.createDataFrame(nodes, "node long")
    con = _edges_con(edges)
    con.execute("CREATE TABLE nn(node BIGINT)")
    con.executemany("INSERT INTO nn VALUES (?)", nodes)
    for cut in (3, 6, 9):
        got = sorted(
            (r["node"], r["cluster"])
            for r in single_linkage_clusters(df, nd, cut=cut).collect()
        )
        want = sorted(
            (int(a), int(b))
            for a, b in con.execute(
                single_linkage_oracle_sql(
                    "SELECT src, dst, weight FROM e",
                    "SELECT node FROM nn",
                    cut,
                )
            ).fetchall()
        )
        assert got == want, cut
        by_node = dict(got)
        assert by_node[n] == n and by_node[n + 1] == n + 1
    # cuts are nested: raising the threshold only ever splits clusters
    lo = dict(
        (r["node"], r["cluster"])
        for r in single_linkage_clusters(df, nd, cut=3).collect()
    )
    hi = dict(
        (r["node"], r["cluster"])
        for r in single_linkage_clusters(df, nd, cut=8).collect()
    )
    for a in lo:
        for b in lo:
            if hi[a] == hi[b]:
                assert lo[a] == lo[b], (a, b)
