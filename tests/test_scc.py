"""Strongly-connected components (operators/scc.py): hand fixtures, DAG
degeneration, DuckDB-oracle parity, and a brute-force property check."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.operators.scc import (
    scc,
    scc_oracle_sql,
)

# cycle {1,2,3}; chain 3->4->5; 5 feeds the 2-cycle {6,7}; self-loop 8;
# 7->8 makes 8 reachable but still a singleton
FIXTURE = [
    (1, 2), (2, 3), (3, 1),
    (3, 4), (4, 5),
    (5, 6), (6, 7), (7, 6),
    (8, 8), (7, 8),
]
EXPECTED = {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 6, 8: 8}


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r["node"]: r["scc_id"] for r in scc(df).collect()}


def test_scc_fixture(spark):
    assert _run(spark, FIXTURE) == EXPECTED


def test_scc_dag_degenerates_to_singletons(spark):
    dag = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    assert _run(spark, dag) == {n: n for n in range(1, 6)}


def test_scc_single_giant_cycle(spark):
    n = 30
    ring = [(i, (i + 1) % n) for i in range(n)]
    assert _run(spark, ring) == {i: 0 for i in range(n)}


def test_scc_oracle_parity_on_fixture(spark):
    got = _run(spark, FIXTURE)
    values = ", ".join(f"({a}, {b})" for a, b in FIXTURE)
    sql = scc_oracle_sql(f"SELECT * FROM (VALUES {values}) AS t(src, dst)")
    oracle = dict(duckdb.connect().execute(sql).fetchall())
    assert got == oracle


def _brute_scc(pairs):
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for n in nodes:
            new = set().union(*(reach[m] for m in adj[n])) if adj[n] else set()
            if not new <= reach[n]:
                reach[n] |= new
                changed = True
    return {
        n: min(m for m in nodes if n in reach[m] and m in reach[n])
        for n in nodes
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scc_matches_bruteforce_random(spark, seed):
    import random

    rng = random.Random(seed)
    n, m = 24, 60
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    assert _run(spark, pairs) == _brute_scc(pairs)


def test_scc_equals_wcc_on_symmetric_graph(spark):
    """On a symmetric edge set, mutual reachability degenerates to plain
    connectivity — SCC must equal WCC (min-label components)."""
    import random

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.dedup import (
        dedup_clusters,
    )

    rng = random.Random(7)
    base = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(50)})
    sym = sorted({p for a, b in base if a != b for p in [(a, b), (b, a)]})
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r["node"]: r["scc_id"] for r in scc(df).collect()}
    pairs = df.select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    wcc = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, strict=True).collect()
    }
    assert got == wcc
