"""Hypothesis property tests for the round-6 exact-integer oracles:
the DuckDB twin of each operator is replayed in pure Python (fractions /
hashlib — no Spark, so hundreds of random graphs are cheap) and must
agree exactly.  Spark <-> oracle parity is separately pinned by the
fixed-fixture tests and the sf0.01 entry gate; this file pins the
oracle <-> mathematics side on arbitrary graphs."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings, strategies as st

from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
    assortativity_oracle_sql,
    modularity_oracle_sql,
)
from tests.graphfixtures import edges_sql, labels_sql

_edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
).filter(lambda es: any(a != b for a, b in es))


def _round_away(x: float, digits: int = 9) -> float:
    """Round-half-AWAY-from-zero — what BOTH engines do on an exact
    decimal .5 boundary (Spark F.round HALF_UPs the decimal string,
    DuckDB rounds the binary double away from zero), unlike Python's
    banker's round().  Dyadic rationals like -41/1024 = -0.0400390625
    land exactly on the boundary and exposed the difference (hypothesis
    falsifying example, 2026-08-15)."""
    scaled = x * 10**digits
    return math.copysign(math.floor(abs(scaled) + 0.5), scaled) / 10**digits


def _und(pairs):
    und = set()
    for s, d in pairs:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    return und


@settings(max_examples=80, deadline=None)
@given(pairs=_edge_lists, mod=st.integers(1, 4))
def test_modularity_oracle_matches_python(pairs, mod):
    und = _und(pairs)
    nodes = sorted({s for s, _ in und})
    labels = [(n, n % mod) for n in nodes]
    lab = dict(labels)
    m2 = len(und)
    deg = {n: sum(1 for s, _ in und if s == n) for n in nodes}
    want = {}
    for c in sorted({v for _, v in labels}):
        members = [n for n in nodes if lab[n] == c]
        w = sum(1 for s, d in und if lab[s] == c and lab[d] == c)
        dc = sum(deg[n] for n in members)
        q = _round_away((m2 * w - dc * dc) / (m2 * m2), 9)
        want[c] = (len(members), w // 2, dc, q)
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in duckdb.sql(
            modularity_oracle_sql(edges_sql(pairs), labels_sql(labels))
        ).fetchall()
    }
    assert got == want
    # total modularity is bounded: Q <= 1, and a single community is 0
    assert sum(v[3] for v in want.values()) <= 1.0 + 1e-9


@settings(max_examples=80, deadline=None)
@given(pairs=_edge_lists)
def test_assortativity_oracle_matches_python(pairs):
    und = _und(pairs)
    deg = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    m_dir = len(und)
    sx = sum(deg[s] for s, _ in und)
    sxx = sum(deg[s] * deg[s] for s, _ in und)
    sxy = sum(deg[s] * deg[d] for s, d in und)
    den = m_dir * sxx - sx * sx
    want_r = _round_away((m_dir * sxy - sx * sx) / den, 9) if den != 0 else None
    rows = duckdb.sql(assortativity_oracle_sql(edges_sql(pairs))).fetchall()
    assert len(rows) == 1
    m_edges, r = rows[0]
    assert m_edges == m_dir // 2
    assert r == want_r
    # Cauchy-Schwarz: |r| <= 1 whenever defined
    if r is not None:
        assert -1.0 - 1e-9 <= r <= 1.0 + 1e-9


@settings(max_examples=40, deadline=None)
@given(
    pairs=_edge_lists,
    seed=st.integers(0, 10_000),
    dims=st.integers(1, 6),
)
def test_fastrp_oracle_matches_python(pairs, seed, dims):
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.fastrp import (
        fastrp_oracle_sql,
    )
    from tests.test_fastrp import _py_fastrp

    want = _py_fastrp(pairs, dims=dims, iterations=2, weights=(1, 2), seed=seed)
    got: dict[int, list[float]] = {}
    for node, dim, value in duckdb.sql(
        fastrp_oracle_sql(
            edges_sql(pairs), dims=dims, iterations=2, weights=(1, 2), seed=seed
        )
    ).fetchall():
        got.setdefault(node, [0.0] * dims)[dim] = value
    assert got == want
    # unit norm (or exactly zero) per node
    for vals in got.values():
        s = sum(v * v for v in vals)
        assert s == 0.0 or abs(s - 1.0) < 1e-6


@settings(max_examples=40, deadline=None)
@given(pairs=_edge_lists, seed=st.integers(0, 10_000), length=st.integers(1, 5))
def test_walk_oracle_is_valid_and_deterministic(pairs, seed, length):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.walks import (
        walk_corpus_oracle_sql,
    )

    und = _und(pairs)
    nodes = {s for s, _ in und}
    sql = walk_corpus_oracle_sql(edges_sql(pairs), length=length, seed=seed)
    rows = duckdb.sql(sql).fetchall()
    assert {r[0] for r in rows} == nodes  # one walk per node
    for walk_id, end_node, path in rows:
        hops = [int(x) for x in path.split("->")]
        assert len(hops) == length + 1
        assert hops[0] == walk_id and hops[-1] == end_node
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in und
    # replay-stable (set compare: DuckDB guarantees no output order)
    assert set(duckdb.sql(sql).fetchall()) == set(rows)
