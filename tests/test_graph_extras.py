"""Link-prediction trio + double-sweep diameter (round-8 graph extras)."""

from __future__ import annotations

import random

import duckdb

from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
    link_prediction_scores,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.bfs import (
    diameter_double_sweep,
    diameter_oracle_sql,
)


def test_link_prediction_hand_values(spark):
    """Two sources sharing two mids: CN = 2, PA = out-degrees' product,
    RA = sum 1/in_deg — checked against hand arithmetic."""
    edges = [
        (1, 10), (2, 10),           # mid 10: in_deg 2
        (1, 11), (2, 11), (3, 11),  # mid 11: in_deg 3
        (3, 12),                    # mid 12: in_deg 1 -> never a mid
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {
        (r["node_a"], r["node_b"]): r
        for r in link_prediction_scores(df).collect()
    }
    r12 = rows[(1, 2)]
    assert r12["n_common"] == 2
    # out_deg(1) = 2, out_deg(2) = 2
    assert r12["pref_attachment"] == 4
    # 1/2 + 1/3 in nano-int HALF-UP-to-6dec: (5e8 + 333333333 + 500)//1000/1e6
    assert abs(r12["ra_score"] - 0.833333) < 1e-9
    r13 = rows[(1, 3)]
    assert r13["n_common"] == 1 and r13["pref_attachment"] == 2 * 2
    assert abs(r13["ra_score"] - 0.333333) < 1e-9


def test_diameter_fixtures_and_oracle(spark):
    """A 6-path has diameter 5 with endpoints 0 and 5 (exact on trees);
    a star has diameter 2.  Random graphs must match the SQL twin."""
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    r = diameter_double_sweep(path).collect()[0]
    assert (r["far_a"], r["far_b"], r["diameter_lb"]) == (0, 5, 5)

    star = spark.createDataFrame([(0, i) for i in (1, 2, 3)], "src long, dst long")
    assert diameter_double_sweep(star).collect()[0]["diameter_lb"] == 2

    rng = random.Random(61)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(20)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = tuple(diameter_double_sweep(df).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = tuple(
        int(x)
        for x in con.execute(
            diameter_oracle_sql("SELECT src, dst FROM e")
        ).fetchone()
    )
    assert got == want


def test_diameter_empty_and_selfloop_edges(spark):
    """Empty or self-loop-only edge tables have no component to sweep:
    the guard must return an empty frame, not TypeError on int(None)."""
    empty = spark.createDataFrame([], "src long, dst long")
    assert diameter_double_sweep(empty).count() == 0
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    out = diameter_double_sweep(loops)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "far_a", "far_b", "diameter_lb"
    ]
    # the oracle agrees: zero rows, not one row of NULLs (r9 review #4)
    con = duckdb.connect()
    con.execute("CREATE TABLE le(src BIGINT, dst BIGINT)")
    con.execute("INSERT INTO le VALUES (1, 1), (2, 2)")
    assert con.execute(
        diameter_oracle_sql("SELECT src, dst FROM le")
    ).fetchall() == []
