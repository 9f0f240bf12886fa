"""Gates for graph sampling (functions/walks.py) and eigenvector
centrality (operators/eigenvector.py): hand-computed fixed points,
structural invariants, determinism, and DuckDB oracle parity on literal
edge tables (the same cross-engine discipline as every other operator)."""

from __future__ import annotations

import math

import duckdb
import pytest

from personalized_pagerank_algorithms_on_neo4j_spark.functions import walks
from personalized_pagerank_algorithms_on_neo4j_spark.operators.eigenvector import (
    eigenvector_centrality,
    eigenvector_oracle_sql,
)
from tests.graphfixtures import edges_df as _edges_df
from tests.graphfixtures import edges_sql as _edges_sql

EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 4), (4, 5), (5, 2)]


# ---------------------------------------------------------------------------
# sample_neighbors
# ---------------------------------------------------------------------------


def test_sample_neighbors_bounds_and_determinism(spark):
    e = _edges_df(spark, EDGES)
    out = walks.sample_neighbors(e, k=2, seed=7).collect()
    pairs = {(r["src"], r["dst"]) for r in out}
    assert pairs <= set(EDGES)  # only real edges survive
    from collections import Counter

    per_src = Counter(r["src"] for r in out)
    assert all(c <= 2 for c in per_src.values())
    # node 0 has 3 out-neighbors -> exactly k kept, ranks are 1..k
    assert per_src[0] == 2
    ranks = sorted(r["sample_rank"] for r in out if r["src"] == 0)
    assert ranks == [1, 2]
    # deterministic rerun; different seed reshuffles node 0's pick
    out2 = {(r["src"], r["dst"], r["sample_rank"])
            for r in walks.sample_neighbors(e, k=2, seed=7).collect()}
    assert out2 == {(r["src"], r["dst"], r["sample_rank"]) for r in out}
    seeds = {
        s: {(r["src"], r["dst"]) for r in
            walks.sample_neighbors(e, k=2, seed=s).collect() if r["src"] == 0}
        for s in range(6)
    }
    assert len(set(map(frozenset, seeds.values()))) > 1


def test_sample_neighbors_oracle_parity(spark):
    got = {
        (r["src"], r["dst"], r["sample_rank"])
        for r in walks.sample_neighbors(_edges_df(spark, EDGES), k=2, seed=3).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            walks.sample_neighbors_oracle_sql(_edges_sql(EDGES), k=2, seed=3)
        ).fetchall()
    }
    assert got == want and got


def test_sample_neighbors_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        walks.sample_neighbors(_edges_df(spark, EDGES), k=0)


# ---------------------------------------------------------------------------
# walk_corpus
# ---------------------------------------------------------------------------


def test_walk_corpus_structure_and_determinism(spark):
    e = _edges_df(spark, EDGES)
    out = walks.walk_corpus(spark, e, length=4, seed=1).collect()
    und = {(s, d) for s, d in EDGES} | {(d, s) for s, d in EDGES}
    nodes = {s for s, _ in und}
    assert {r["walk_id"] for r in out} == nodes  # one walk per node
    for r in out:
        hops = [int(x) for x in r["path"].split("->")]
        assert len(hops) == 5 and hops[0] == r["walk_id"]
        assert hops[-1] == r["end_node"]
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in und  # every hop is a real undirected edge
    again = {(r["walk_id"], r["path"]) for r in
             walks.walk_corpus(spark, e, length=4, seed=1).collect()}
    assert again == {(r["walk_id"], r["path"]) for r in out}
    other = {(r["walk_id"], r["path"]) for r in
             walks.walk_corpus(spark, e, length=4, seed=2).collect()}
    assert other != again  # seed varies the corpus


def test_walk_corpus_oracle_parity(spark):
    got = {
        (r["walk_id"], r["end_node"], r["path"])
        for r in walks.walk_corpus(
            spark, _edges_df(spark, EDGES), length=5, seed=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            walks.walk_corpus_oracle_sql(_edges_sql(EDGES), length=5, seed=4)
        ).fetchall()
    }
    assert got == want and got


def test_walk_corpus_rejects_bad_length(spark):
    with pytest.raises(ValueError):
        walks.walk_corpus(spark, _edges_df(spark, EDGES), length=0)


# ---------------------------------------------------------------------------
# eigenvector centrality
# ---------------------------------------------------------------------------


def test_eigenvector_triangle_exact(spark):
    # all-ones IS the principal eigenvector of a triangle: every iterate
    # stays uniform, so the normalized result is exactly 1/sqrt(3)
    e = _edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    out = {r["node"]: r["score"]
           for r in eigenvector_centrality(spark, e, iterations=5).collect()}
    want = round(1 / math.sqrt(3), 9)
    assert out == {0: want, 1: want, 2: want}


def test_eigenvector_star_converges_despite_bipartite(spark):
    # K_{1,3} is bipartite: plain power iteration oscillates forever, the
    # shifted (A+I) recurrence converges to the principal eigenvector
    # (center 1/sqrt(2), leaves 1/sqrt(6))
    e = _edges_df(spark, [(0, 1), (0, 2), (0, 3)])
    out = {r["node"]: r["score"]
           for r in eigenvector_centrality(spark, e, iterations=12).collect()}
    assert abs(out[0] - 1 / math.sqrt(2)) < 1e-3
    for leaf in (1, 2, 3):
        assert abs(out[leaf] - 1 / math.sqrt(6)) < 1e-3
    # ranking is already exact at any iteration count
    assert out[0] > out[1] == out[2] == out[3]


def test_eigenvector_oracle_parity(spark):
    got = {
        (r["node"], r["score"])
        for r in eigenvector_centrality(
            spark, _edges_df(spark, EDGES), iterations=8
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            eigenvector_oracle_sql(_edges_sql(EDGES), iterations=8)
        ).fetchall()
    }
    assert got == want and len(got) == 6


def test_eigenvector_rejects_bad_iterations(spark):
    with pytest.raises(ValueError):
        eigenvector_centrality(spark, _edges_df(spark, EDGES), iterations=0)


# ---------------------------------------------------------------------------
# node2vec biased walks
# ---------------------------------------------------------------------------


def test_node2vec_structure_and_bias(spark):
    e = _edges_df(spark, EDGES)
    out = walks.node2vec_walk_corpus(spark, e, length=4, seed=1).collect()
    und = {(s, d) for s, d in EDGES} | {(d, s) for s, d in EDGES}
    nodes = {s for s, _ in und}
    assert {r["walk_id"] for r in out} == nodes
    for r in out:
        hops = [int(x) for x in r["path"].split("->")]
        assert len(hops) == 5 and hops[0] == r["walk_id"]
        assert hops[-1] == r["end_node"]
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in und
    # determinism
    again = {(r["walk_id"], r["path"]) for r in
             walks.node2vec_walk_corpus(spark, e, length=4, seed=1).collect()}
    assert again == {(r["walk_id"], r["path"]) for r in out}
    # the (p, q) bias must actually change at least one walk vs heavy
    # backtrack-preference (p_mult=1 favors returning; large q_mult makes
    # exploration ~1000x less likely) at the same seed
    biased = {(r["walk_id"], r["path"]) for r in
              walks.node2vec_walk_corpus(
                  spark, e, length=4, seed=1, p_mult=1, q_mult=1_000
              ).collect()}
    assert biased != again


def test_node2vec_backtrack_forced_on_leaf(spark):
    # a path graph 0-1: every hop must alternate (only one neighbor each)
    e = _edges_df(spark, [(0, 1)])
    out = {r["walk_id"]: r["path"]
           for r in walks.node2vec_walk_corpus(spark, e, length=3, seed=0).collect()}
    assert out == {0: "0->1->0->1", 1: "1->0->1->0"}


def test_node2vec_oracle_parity(spark):
    got = {
        (r["walk_id"], r["end_node"], r["path"])
        for r in walks.node2vec_walk_corpus(
            spark, _edges_df(spark, EDGES), length=5, seed=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            walks.node2vec_oracle_sql(_edges_sql(EDGES), length=5, seed=4)
        ).fetchall()
    }
    assert got == want and got


def test_node2vec_rejects_bad_params(spark):
    e = _edges_df(spark, EDGES)
    with pytest.raises(ValueError):
        walks.node2vec_walk_corpus(spark, e, length=0)
    with pytest.raises(ValueError):
        walks.node2vec_walk_corpus(spark, e, length=2, p_mult=0)


# ---------------------------------------------------------------------------
# skip-gram pairs
# ---------------------------------------------------------------------------


def test_skipgram_pairs_hand_computed(spark):
    # one walk 0->1->2->3, window 2:
    # offset 1: (0,1) (1,2) (2,3); offset 2: (0,2) (1,3); both directions
    w = spark.createDataFrame([(0, "0->1->2->3")], "walk_id long, path string")
    out = {(r["center"], r["context"]): r["n_pairs"]
           for r in walks.skipgram_pairs(w, window=2).collect()}
    fwd = {(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)}
    want = {}
    for a, b in fwd:
        want[(a, b)] = want.get((a, b), 0) + 1
        want[(b, a)] = want.get((b, a), 0) + 1
    assert out == want


def test_skipgram_repeated_node_counts_multiplicity(spark):
    # backtracking walk 0->1->0, window 1: pairs (0,1) and (1,0) each from
    # two offsets-positions -> n_pairs 2 in both orientations
    w = spark.createDataFrame([(0, "0->1->0")], "walk_id long, path string")
    out = {(r["center"], r["context"]): r["n_pairs"]
           for r in walks.skipgram_pairs(w, window=1).collect()}
    assert out == {(0, 1): 2, (1, 0): 2}


def test_skipgram_oracle_parity(spark):
    e = _edges_df(spark, EDGES)
    corpus = walks.walk_corpus(spark, e, length=4, seed=2)
    got = {
        tuple(r)
        for r in walks.skipgram_pairs(corpus, window=2).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            walks.skipgram_oracle_sql(
                f"SELECT * FROM ({walks.walk_corpus_oracle_sql(_edges_sql(EDGES), length=4, seed=2)})",
                window=2,
            )
        ).fetchall()
    }
    assert got == want and got


def test_skipgram_rejects_bad_window(spark):
    w = spark.createDataFrame([(0, "0->1")], "walk_id long, path string")
    with pytest.raises(ValueError):
        walks.skipgram_pairs(w, window=0)


def test_skipgram_window_longer_than_walk(spark):
    # window >= token count: the long offsets contribute nothing instead
    # of crashing; oracle agrees
    w = spark.createDataFrame([(0, "0->1")], "walk_id long, path string")
    out = {(r["center"], r["context"]): r["n_pairs"]
           for r in walks.skipgram_pairs(w, window=3).collect()}
    assert out == {(0, 1): 1, (1, 0): 1}
    want = {(r[0], r[1]): r[2] for r in duckdb.sql(
        walks.skipgram_oracle_sql("SELECT '0->1' AS path", window=3)
    ).fetchall()}
    assert out == want


def test_node2vec_pruned_candidates_oracle_parity_random_hub_graph(spark):
    """r12 optimization regression: the biased hops prune candidates to
    h <= cmax * hmin(cur, t) before the class-multiplier argmin.  On a
    random graph with a forced hub (the regime where pruning discards
    almost the whole adjacency) every walk must still equal the oracle's
    UNPRUNED full-adjacency replay, across distinct (p, q) shapes."""
    import random

    rng = random.Random(41)
    edges = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    edges += [(29, i) for i in range(25)]  # hub: degree ~25 after symmetrize
    edges = [(u, v) for u, v in sorted(set(edges)) if u != v]
    for p_mult, q_mult in ((4, 2), (1, 16), (16, 1)):
        got = {
            (r["walk_id"], r["end_node"], r["path"])
            for r in walks.node2vec_walk_corpus(
                spark,
                _edges_df(spark, edges),
                length=4,
                seed=7,
                p_mult=p_mult,
                q_mult=q_mult,
            ).collect()
        }
        want = {
            tuple(r)
            for r in duckdb.sql(
                walks.node2vec_oracle_sql(
                    _edges_sql(edges),
                    length=4,
                    seed=7,
                    p_mult=p_mult,
                    q_mult=q_mult,
                )
            ).fetchall()
        }
        assert got == want and len(got) == 30
