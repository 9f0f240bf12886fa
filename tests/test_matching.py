"""Maximal matching (round 9): priority replay, matching invariants,
strict budget raise, and DuckDB-oracle parity."""

from __future__ import annotations

import hashlib
import random

import duckdb
import pytest

from personalized_pagerank_algorithms_on_neo4j_spark.operators.matching import (
    matching_oracle_sql,
    maximal_matching,
)


def _ph(x, seed):
    return int(hashlib.md5(f"{x}#{seed}".encode()).hexdigest()[:12], 16)


def _py_matching(edges, seed, max_rounds=8):
    und = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    active, out = set(und), set()
    for r in range(max_rounds):
        if not active:
            break
        pri = {
            e: (_ph(f"{e[0]}_{e[1]}", seed * 1000 + r), e[0], e[1])
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
        out |= winners
        matched = {n for e in winners for n in e}
        active = {
            e for e in active if e[0] not in matched and e[1] not in matched
        }
    assert not active
    return out


def test_matching_matches_python_oracle_and_invariants(spark):
    for sd in (1, 2, 3):
        rng = random.Random(sd)
        edges = sorted(
            {(rng.randrange(16), rng.randrange(16)) for _ in range(40)}
        )
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r["u"], r["v"]) for r in maximal_matching(df, seed=37).collect()}
        assert got == _py_matching(edges, 37), sd
        # a matching: no two pairs share a node
        used = [n for e in got for n in e]
        assert len(used) == len(set(used))
        # maximal: every edge touches a matched node
        m = set(used)
        und = {(min(u, v), max(u, v)) for u, v in edges}
        assert all(u in m or v in m for u, v in und)
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?,?)", edges)
        orc = {
            (int(a), int(b))
            for a, b in con.execute(
                matching_oracle_sql("SELECT src, dst FROM e", seed=37)
            ).fetchall()
        }
        assert orc == got, sd
        con.close()


def test_matching_strict_raises_past_budget(spark):
    """One round matches only the LOCAL-minimum edges; under seed 37 the
    round-1 local minima of this 12-edge path do not tile it (verified
    by the priority replay), so a 1-round budget must raise."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        maximal_matching(df, seed=37, max_rounds=1)


def test_matching_empty_and_selfloop_edges(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert maximal_matching(df, seed=37).count() == 0
    empty = spark.createDataFrame([], "src long, dst long")
    out = maximal_matching(empty, seed=37)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["u", "v"]
