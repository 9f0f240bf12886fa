"""Luby's MIS (round 9): pure-Python priority replay, independence +
maximality invariants, isolated nodes, and DuckDB-oracle parity."""

from __future__ import annotations

import hashlib
import random

import duckdb
import pytest

from personalized_pagerank_algorithms_on_neo4j_spark.operators.mis import (
    luby_mis,
    luby_mis_oracle_sql,
)


def _ph(x, seed):
    return int(hashlib.md5(f"{x}#{seed}".encode()).hexdigest()[:12], 16)


def _py_luby(nodes, edges, seed, max_rounds=12):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
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


def test_mis_matches_python_oracle_and_invariants(spark):
    for sd in (1, 2):
        rng = random.Random(sd)
        edges = sorted(
            {(rng.randrange(15), rng.randrange(15)) for _ in range(35)}
        )
        edges = [(u, v) for u, v in edges if u != v]
        nodes = sorted({x for e in edges for x in e} | {98, 99})
        ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
        edf = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["in_mis"] for r in luby_mis(ndf, edf, seed=29).collect()}
        assert got == _py_luby(nodes, edges, 29), sd
        und = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
        # independence: no adjacent members
        assert not any(got[u] and got[v] for u, v in und)
        # maximality: every non-member has a member neighbour
        assert all(
            got[n] or any(got[v] for u, v in und if u == n) for n in nodes
        )
        # isolated nodes always join
        assert got[98] and got[99]
        con = duckdb.connect()
        con.execute("CREATE TABLE n(node BIGINT)")
        con.executemany("INSERT INTO n VALUES (?)", [(x,) for x in nodes])
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?,?)", edges)
        orc = {
            int(r[0]): bool(r[1])
            for r in con.execute(
                luby_mis_oracle_sql(
                    "SELECT node FROM n", "SELECT src, dst FROM e", seed=29
                )
            ).fetchall()
        }
        assert orc == got, sd
        con.close()


def test_mis_strict_raises_past_budget(spark):
    """The 20-path under seed 29 needs 2 Luby rounds (verified by the
    priority replay); a 1-round budget must raise rather than return a
    non-maximal set."""
    ndf = spark.createDataFrame([(i,) for i in range(20)], "node long")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        luby_mis(ndf, edf, seed=29, max_rounds=1)
    # and the 2-round budget completes
    out = {r["node"]: r["in_mis"] for r in luby_mis(ndf, edf, seed=29, max_rounds=2).collect()}
    assert out == _py_luby(list(range(20)), [(i, i + 1) for i in range(19)], 29)


def test_coloring_matches_python_oracle_and_is_proper(spark):
    """Jones-Plassmann coloring: layer-salted seeded MIS replay, proper-
    coloring invariant, and oracle parity."""
    import duckdb as _duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.operators.mis import (
        coloring_oracle_sql,
        jones_plassmann_coloring,
    )

    def py_coloring(nodes, edges, seed, max_colors=8, max_rounds=12):
        adj: dict[int, set[int]] = {}
        for u, v in edges:
            if u != v:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
        active, colors = set(nodes), {}
        for c in range(max_colors):
            if not active:
                break
            act, mis = set(active), set()
            for r in range(max_rounds):
                if not act:
                    break
                s = (seed * 100 + c) * 1000 + r
                pri = {v: (_ph(v, s), v) for v in act}
                winners = {
                    v
                    for v in act
                    if all(pri[v] < pri[w] for w in adj.get(v, ()) if w in act)
                }
                mis |= winners
                removed = set(winners)
                for w in winners:
                    removed |= adj.get(w, set()) & act
                act -= removed
            for v in mis:
                colors[v] = c
            active -= mis
        assert not active
        return colors

    for sd in (4, 5):
        rng = random.Random(sd)
        edges = sorted(
            {(rng.randrange(14), rng.randrange(14)) for _ in range(34)}
        )
        edges = [(u, v) for u, v in edges if u != v]
        nodes = sorted({x for e in edges for x in e} | {97})
        ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
        edf = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["color"]
            for r in jones_plassmann_coloring(
                ndf, edf, seed=31, max_colors=8
            ).collect()
        }
        assert got == py_coloring(nodes, edges, 31), sd
        und = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
        assert not any(got[u] == got[v] for u, v in und)
        assert got[97] == 0  # isolated node joins the first layer
        con = _duckdb.connect()
        con.execute("CREATE TABLE n(node BIGINT)")
        con.executemany("INSERT INTO n VALUES (?)", [(x,) for x in nodes])
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?,?)", edges)
        orc = {
            int(r[0]): int(r[1])
            for r in con.execute(
                coloring_oracle_sql(
                    "SELECT node FROM n",
                    "SELECT src, dst FROM e",
                    seed=31,
                    max_colors=8,
                )
            ).fetchall()
        }
        assert orc == got, sd
        con.close()


def test_coloring_strict_raises_past_color_budget(spark):
    """A triangle needs 3 colors; a 2-color budget must raise rather than
    return a partial coloring."""
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.mis import (
        jones_plassmann_coloring,
    )

    ndf = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edf = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="needs more than 2 colors"):
        jones_plassmann_coloring(ndf, edf, seed=31, max_colors=2)
