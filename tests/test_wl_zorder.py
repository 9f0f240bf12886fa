"""1-WL color refinement (operators/wl.py) and Z-order layout
(functions/sharding.py zorder_*).

The driver gate pins exact values at sf0.01; these tests pin the
SEMANTICS the values encode: WL must put structurally-equivalent nodes
in one class and split distinguishable ones, and the Morton key must be
the textbook bit interleave (checked against a pure-Python reference,
including negative and constant key ranges the TPC-H fixture never
hits)."""

from __future__ import annotations

import random

import duckdb

from personalized_pagerank_algorithms_on_neo4j_spark.functions.sharding import (
    ZORDER_BITS,
    zorder_layout,
    zorder_layout_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.wl import (
    wl_colors,
    wl_oracle_sql,
)


def _colors(spark, edges, rounds=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["color"] for r in wl_colors(df, rounds=rounds).collect()}


def test_wl_equivalence_classes(spark):
    """Two disjoint triangles: all six nodes are 1-WL equivalent.  A
    4-leaf star: the leaves share a class, the hub does not.  A path of
    5: ends agree, their neighbours agree, the centre is alone."""
    tri2 = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    c = _colors(spark, tri2)
    assert len(set(c.values())) == 1 and len(c) == 6

    star = [(0, i) for i in (1, 2, 3, 4)]
    c = _colors(spark, star)
    assert len({c[i] for i in (1, 2, 3, 4)}) == 1
    assert c[0] != c[1]

    path = [(0, 1), (1, 2), (2, 3), (3, 4)]
    c = _colors(spark, path)
    assert c[0] == c[4] and c[1] == c[3]
    assert len({c[0], c[1], c[2]}) == 3


def test_wl_refinement_only_splits(spark):
    """More rounds can only split classes, never merge two apart-classes
    back together (refinement monotonicity) — checked on a random graph
    by comparing the partition at rounds 1 vs 3."""
    rng = random.Random(23)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    c1 = _colors(spark, edges, rounds=1)
    c3 = _colors(spark, edges, rounds=3)
    for a in c3:
        for b in c3:
            if c3[a] == c3[b]:
                assert c1[a] == c1[b], (a, b)


def test_wl_oracle_parity_random(spark):
    rng = random.Random(31)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted((r["node"], r["color"]) for r in wl_colors(df, rounds=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = sorted(
        (int(n), int(c))
        for n, c in con.execute(
            wl_oracle_sql("SELECT src, dst FROM e", rounds=4)
        ).fetchall()
    )
    assert got == want


def _morton_ref(a, b, alo, ahi, blo, bhi, bits=ZORDER_BITS):
    top = (1 << bits) - 1
    sa = (a - alo) * top // max(1, ahi - alo)
    sb = (b - blo) * top // max(1, bhi - blo)
    z = 0
    for i in range(bits):
        z |= ((sa >> i) & 1) << (2 * i)
        z |= ((sb >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference_and_oracle(spark):
    """Random rows including NEGATIVE keys and a CONSTANT second key
    (degenerate range -> the div-by-zero guard): Spark == pure-Python
    Morton reference == DuckDB oracle."""
    rng = random.Random(47)
    rows = [(i, rng.randint(-500, 500), rng.randint(0, 10**6)) for i in range(200)]
    rows += [(1000 + i, rng.randint(-500, 500), 77) for i in range(20)]
    for subset in (rows[:200], rows[200:]):
        df = spark.createDataFrame(subset, "id long, a long, b long")
        lay = zorder_layout(df, a_col="a", b_col="b", id_col="id", n_shards=8)
        got = {r["id"]: (r["zkey"], r["shard"]) for r in lay.collect()}
        alo = min(a for _, a, _ in subset)
        ahi = max(a for _, a, _ in subset)
        blo = min(b for _, _, b in subset)
        bhi = max(b for _, _, b in subset)
        span = (1 << (2 * ZORDER_BITS)) // 8
        for i, a, b in subset:
            z = _morton_ref(a, b, alo, ahi, blo, bhi)
            assert got[i] == (z, z // span), (i, a, b)
        con = duckdb.connect()
        con.execute("CREATE TABLE t(id BIGINT, a BIGINT, b BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", subset)
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(
                zorder_layout_oracle_sql(
                    "SELECT id, a, b FROM t", a="a", b="b", id_col="id", n_shards=8
                )
            ).fetchall()
        )
        spark_rows = sorted(
            (r["id"], r["a"], r["b"], r["zkey"], r["shard"]) for r in lay.collect()
        )
        assert spark_rows == want


def test_zorder_locality_beats_single_key_layout(spark):
    """The point of the layout: per-shard ranges are tight on BOTH keys.
    Compare against sharding by key a alone — the b-ranges there span
    (almost) the whole domain, so a predicate on b prunes nothing."""
    rng = random.Random(53)
    rows = [(i, rng.randint(0, 2**15), rng.randint(0, 2**15)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    lay = zorder_layout(df, a_col="a", b_col="b", id_col="id", n_shards=16)
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.sharding import (
        zorder_manifest,
    )

    m = zorder_manifest(lay).collect()
    domain = 2**15
    z_b_span = sum(r["b_max"] - r["b_min"] for r in m) / len(m)
    # single-key layout: shard = a div (domain/16) -> b ranges ~ full domain
    assert z_b_span < 0.7 * domain, z_b_span
