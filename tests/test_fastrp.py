"""Gates for FastRP embeddings (operators/fastrp.py): a pure-Python md5
replay of the exact integer recurrence on a literal graph, structural
invariants (unit norm, determinism, seed sensitivity), and DuckDB oracle
parity."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from personalized_pagerank_algorithms_on_neo4j_spark.operators.fastrp import (
    fastrp_embeddings,
    fastrp_oracle_sql,
)
from tests.graphfixtures import edges_df as _edges_df
from tests.graphfixtures import edges_sql as _edges_sql

EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 4), (4, 5), (5, 2)]


def _py_fastrp(pairs, dims, iterations, weights, seed):
    """Reference replay of the exact integer recurrence with hashlib."""
    und = set()
    for s, d in pairs:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = sorted({s for s, _ in und})
    nbrs = {n: [d for s, d in und if s == n] for n in nodes}

    def init(node, dim):
        h = int(
            hashlib.md5(f"{node}|{dim}#{seed}".encode()).hexdigest()[:12], 16
        )
        r = h % 8
        return 1 if r == 0 else (-1 if r == 1 else 0)

    x = {n: [init(n, d) for d in range(dims)] for n in nodes}
    iterates = []
    for _ in range(iterations):
        x = {
            n: [sum(x[m][d] for m in nbrs[n]) for d in range(dims)]
            for n in nodes
        }
        iterates.append(x)
    out = {}
    for n in nodes:
        acc = [
            sum(w * it[n][d] for w, it in zip(weights, iterates))
            for d in range(dims)
        ]
        nv = math.sqrt(sum(v * v for v in acc))
        out[n] = [
            round(v / nv, 9) if nv > 0 else 0.0 for v in acc
        ]
    return out


def test_fastrp_matches_python_replay(spark):
    got = {}
    rows = fastrp_embeddings(
        spark, _edges_df(spark, EDGES), dims=4, iterations=2,
        weights=(1, 2), seed=3,
    ).collect()
    for r in rows:
        got.setdefault(r["node"], [0.0] * 4)[r["dim"]] = r["value"]
    want = _py_fastrp(EDGES, dims=4, iterations=2, weights=(1, 2), seed=3)
    assert got == want


def test_fastrp_unit_norm_and_determinism(spark):
    e = _edges_df(spark, EDGES)
    rows = fastrp_embeddings(spark, e, dims=8, iterations=2, seed=1).collect()
    by_node: dict[int, list[float]] = {}
    for r in rows:
        by_node.setdefault(r["node"], []).append(r["value"])
    assert len(by_node) == 6 and all(len(v) == 8 for v in by_node.values())
    for vals in by_node.values():
        s = sum(v * v for v in vals)
        assert s == 0.0 or abs(s - 1.0) < 1e-6
    again = {(r["node"], r["dim"], r["value"]) for r in
             fastrp_embeddings(spark, e, dims=8, iterations=2, seed=1).collect()}
    assert again == {(r["node"], r["dim"], r["value"]) for r in rows}
    other = {(r["node"], r["dim"], r["value"]) for r in
             fastrp_embeddings(spark, e, dims=8, iterations=2, seed=2).collect()}
    assert other != again


def test_fastrp_oracle_parity(spark):
    got = {
        (r["node"], r["dim"], r["value"])
        for r in fastrp_embeddings(
            spark, _edges_df(spark, EDGES), dims=6, iterations=3,
            weights=(1, 1, 2), seed=5,
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            fastrp_oracle_sql(
                _edges_sql(EDGES), dims=6, iterations=3,
                weights=(1, 1, 2), seed=5,
            )
        ).fetchall()
    }
    assert got == want and len(got) == 36


def test_fastrp_rejects_bad_params(spark):
    e = _edges_df(spark, EDGES)
    with pytest.raises(ValueError):
        fastrp_embeddings(spark, e, dims=0)
    with pytest.raises(ValueError):
        fastrp_embeddings(spark, e, iterations=0)
    with pytest.raises(ValueError):
        fastrp_embeddings(spark, e, iterations=3, weights=(1, 2))
