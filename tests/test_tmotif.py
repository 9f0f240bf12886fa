"""Temporal motif counts (round 9): hand-verified fixture, instance
multiplicity, and DuckDB-oracle parity on random streams."""

from __future__ import annotations

import random

import duckdb

from personalized_pagerank_algorithms_on_neo4j_spark.functions.tmotif import (
    temporal_motif_counts,
)


def _rows(df):
    return {r["mid"]: (r["n_paths"], r["n_triangles"]) for r in df.collect()}


def test_tmotif_hand_fixture(spark):
    """1->2@10, 2->3@15, 3->1@18, 2->1@12, 2->3@100 with delta=10:
    paths 1->2->3 (mid 2) and 2->3->1 (mid 3); 1->2->1 dies on w==u;
    2->3@100 is out of band.  The first path closes via 3->1@18
    (15 < 18 <= 20) -> one triangle at mid 2."""
    edges = [(1, 2, 10), (2, 3, 15), (3, 1, 18), (2, 1, 12), (2, 3, 100)]
    df = spark.createDataFrame(edges, "src long, dst long, t long")
    assert _rows(temporal_motif_counts(df, delta_s=10)) == {
        2: (1, 1),
        3: (1, 0),
    }


def test_tmotif_instance_multiplicity(spark):
    """Repeated (u,v) edge instances each count: two 1->2 edges in band
    before one 2->3 edge give TWO 2-paths at mid 2."""
    edges = [(1, 2, 10), (1, 2, 11), (2, 3, 15)]
    df = spark.createDataFrame(edges, "src long, dst long, t long")
    assert _rows(temporal_motif_counts(df, delta_s=10)) == {2: (2, 0)}


def test_tmotif_strict_band_edges(spark):
    """Band boundaries: t2 == t1 never counts (strict >); t2 == t1+delta
    counts (inclusive <=)."""
    df = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 10), (2, 4, 20)], "src long, dst long, t long"
    )
    assert _rows(temporal_motif_counts(df, delta_s=10)) == {2: (1, 0)}


def test_tmotif_random_matches_oracle_algebra(spark):
    """Random stream vs a brute-force Python count (same algebra as the
    registered DuckDB oracle, minus the events-table derivation)."""
    rng = random.Random(17)
    edges = [
        (rng.randrange(8), rng.randrange(8), rng.randrange(100))
        for _ in range(120)
    ]
    edges = [(u, v, t) for u, v, t in edges if u != v]
    delta = 15
    paths: dict[int, int] = {}
    tris: dict[int, int] = {}
    for u, v, t1 in edges:
        for v2, w, t2 in edges:
            if v2 == v and t1 < t2 <= t1 + delta and w != u:
                paths[v] = paths.get(v, 0) + 1
                for w3, u3, t3 in edges:
                    if w3 == w and u3 == u and t2 < t3 <= t1 + delta:
                        tris[v] = tris.get(v, 0) + 1
    want = {m: (n, tris.get(m, 0)) for m, n in paths.items()}
    df = spark.createDataFrame(edges, "src long, dst long, t long")
    assert _rows(temporal_motif_counts(df, delta_s=delta)) == want


def test_tmotif_hub_cap_binds_only_above_cap(spark):
    """With a hub cap below a mid's in-instance degree, that mid's rows
    drop — and OTHER mids' counts stay untouched even when their wedges
    ride edges incident to the hub."""
    edges = [(u, 5, 10 + u) for u in range(4)] + [(5, 9, 30), (9, 7, 31), (3, 9, 29)]
    df = spark.createDataFrame(edges, "src long, dst long, t long")
    exact = _rows(temporal_motif_counts(df, delta_s=30))
    assert exact[5][0] == 4
    capped = _rows(temporal_motif_counts(df, delta_s=30, hub_cap=2))
    assert 5 not in capped
    # mid 9 (degree 2+1, under the cap) keeps its exact counts: its
    # wedge 5->9->7 uses an edge incident to the capped hub 5
    assert capped[9] == exact[9]
