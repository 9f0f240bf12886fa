"""DAG topological layers (operators/dag.py): hand DAG, cycle detection,
and random-DAG parity against the unrolled oracle."""

from __future__ import annotations

import random

import duckdb
import pytest

from personalized_pagerank_algorithms_on_neo4j_spark.operators.dag import (
    topological_layers,
    topological_layers_oracle_sql,
)


def test_layers_hand_dag(spark):
    """Diamond + tail: a(0) -> b,c(1) -> d(2) -> e(3); longest path wins
    (a -> d direct edge must NOT pull d down to layer 1)."""
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["layer"] for r in topological_layers(df).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_cycle_detection_raises(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    with pytest.raises(RuntimeError, match="cycle"):
        topological_layers(df, max_rounds=8).count()


def test_layers_match_oracle_on_random_dags(spark):
    """Random DAGs (edges only low -> high id, so acyclic by
    construction): Spark == the unrolled DuckDB twin, with the unroll
    deliberately deeper than needed (no-op rounds must not change it)."""
    rng = random.Random(37)
    for _ in range(2):
        n = rng.randint(8, 16)
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(3 * n)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = sorted(
            (r["node"], r["layer"]) for r in topological_layers(df).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        want = sorted(
            (int(a), int(b))
            for a, b in con.execute(
                topological_layers_oracle_sql("SELECT src, dst FROM e", rounds=24)
            ).fetchall()
        )
        assert got == want


def test_depth_equals_max_rounds_is_not_a_false_cycle(spark):
    """max_rounds is the supported DEPTH: a depth-8 chain must succeed
    at max_rounds=8 (the confirming no-op round is budgeted separately)
    and raise only below the true depth."""
    chain = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {r["node"]: r["layer"] for r in topological_layers(df, max_rounds=8).collect()}
    assert got[8] == 8 and got[0] == 0
    with pytest.raises(RuntimeError, match="cycle"):
        topological_layers(df, max_rounds=7).count()
