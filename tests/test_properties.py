"""Hypothesis property tests: push/walk invariants on random small graphs
(SURVEY section 5 item 4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from personalized_pagerank_algorithms_on_neo4j_spark.graph import LocalGraph
from personalized_pagerank_algorithms_on_neo4j_spark.operators import _kernels

ALPHA = 0.15


def _mk_graph(n: int, edges: list[tuple[int, int]]) -> LocalGraph:
    edges = sorted(set((a % n, b % n) for a, b in edges if a % n != b % n))
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.int64)
    in_deg = np.bincount(dst, minlength=n).astype(np.int64)
    order = np.argsort(src, kind="stable")
    rorder = np.argsort(dst, kind="stable")
    return LocalGraph(
        ids=np.arange(n, dtype=np.int64),
        indptr=np.concatenate(([0], np.cumsum(out_deg))),
        indices=dst[order],
        rindptr=np.concatenate(([0], np.cumsum(in_deg))),
        rindices=src[rorder],
        out_deg=out_deg,
        in_deg=in_deg,
        edge_src=src,
        edge_dst=dst,
    )


graphs = st.builds(
    _mk_graph,
    st.integers(min_value=2, max_value=12),
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=0, max_size=40
    ),
)


@settings(max_examples=60, deadline=None)
@given(lg=graphs, s=st.integers(0, 11), iters=st.integers(1, 60))
def test_power_method_invariants(lg, s, iters):
    s = s % lg.n
    pi = _kernels.power_method(lg, s, ALPHA, iters)
    assert (pi >= 0).all()
    # reserve mass after t iterations is exactly 1 - (1-alpha)^t
    assert abs(pi.sum() - (1.0 - (1.0 - ALPHA) ** iters)) < 1e-9


@settings(max_examples=60, deadline=None)
@given(lg=graphs, s=st.integers(0, 11), rmax=st.floats(1e-6, 1e-1))
def test_forward_push_invariants(lg, s, rmax):
    s = s % lg.n
    pi, r, rsum = _kernels.forward_push(lg, s, ALPHA, rmax)
    assert (pi >= 0).all() and (r >= -1e-15).all()
    # conservation: reserve + residue == 1 (no leak in forward push)
    assert abs(pi.sum() + r.sum() - 1.0) < 1e-9
    # fixed point: no node still qualifies
    qual = (r > 0) & ((lg.out_deg == 0) | (r >= rmax * lg.out_deg))
    assert not qual.any()
    # batch schedule: same invariants + oracle distance within residual mass
    pi_b, r_b, _ = _kernels.forward_push_batch(lg, s, ALPHA, rmax)
    assert abs(pi_b.sum() + r_b.sum() - 1.0) < 1e-9
    oracle = _kernels.power_method(lg, s, ALPHA, 400)
    assert np.max(np.abs(pi_b - oracle)) <= r_b.sum() + 1e-9
    assert np.max(np.abs(pi - oracle)) <= r.sum() + 1e-9


@settings(max_examples=40, deadline=None)
@given(lg=graphs, t=st.integers(0, 11), rmax=st.floats(1e-5, 1e-1))
def test_backward_search_invariants(lg, t, rmax):
    t = t % lg.n
    pi, r = _kernels.backward_search(lg, t, ALPHA, rmax)
    assert (pi >= 0).all()
    # no node with residue above threshold remains
    assert (r <= rmax + 1e-12).all()
    # pi(t,t) >= alpha whenever the target was processed at all
    assert pi[t] >= ALPHA - 1e-12


@settings(max_examples=30, deadline=None)
@given(lg=graphs, s=st.integers(0, 11), seed=st.integers(0, 2**31 - 1))
def test_walks_land_on_nodes(lg, s, seed):
    s = s % lg.n
    rng = np.random.default_rng(seed)
    ends = _kernels.random_walks(lg, np.full(50, s, dtype=np.int64), ALPHA, rng)
    assert ((ends >= 0) & (ends < lg.n)).all()
    # a dangling start must end at itself
    if lg.out_deg[s] == 0:
        assert (ends == s).all()


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(st.floats(0, 1, allow_nan=False), min_size=1, max_size=50),
    k=st.integers(1, 60),
)
def test_kth_largest_property(vals, k):
    arr = np.array(vals)
    got = _kernels.kth_largest(arr, k)
    if k > len(arr):
        assert got is None
    else:
        assert got == sorted(vals, reverse=True)[k - 1]
