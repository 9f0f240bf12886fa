"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import personalized_pagerank_algorithms_on_neo4j_spark as P
from personalized_pagerank_algorithms_on_neo4j_spark.config import TopkConf
from personalized_pagerank_algorithms_on_neo4j_spark.operators import _kernels
from personalized_pagerank_algorithms_on_neo4j_spark.operators.asof import asof_join


def test_topk_conf_k_equals_n():
    """k == n used to divide by log(1) == 0."""
    c = TopkConf(alpha=0.15, n=10, m=30, k=10)
    assert np.isfinite(c.pfail) and c.pfail > 0
    c2 = TopkConf(alpha=0.15, n=10, m=30, k=50)  # k > n clamps
    assert c2.k <= 10 and np.isfinite(c2.pfail)


def test_fora_topk_kernel_k_equals_n(got):
    lg = got.local
    s = lg.dense(got.id_of("Eddard"))
    rng = np.random.default_rng(5)
    pi = _kernels.fora_topk(lg, s, 0.15, 0.5, lg.n, lg.m, rng)  # k == n
    assert np.isfinite(pi).all() and pi.sum() > 0


def test_asof_join_preserves_duplicate_left_rows(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 100), (2, 100)], "k long, ts long"  # two identical rows
    )
    right = spark.createDataFrame(
        [(1, 50, 7), (1, 90, 8), (2, 200, 9)], "k long, ts long, rid long"
    )
    inner = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                      right_tiebreak="rid", how="inner")
    rows = inner.collect()
    assert len(rows) == 2  # both duplicate left rows survive
    assert all(r["r_rid"] == 8 for r in rows)  # latest right at ts<=100
    outer = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                      right_tiebreak="rid", how="left")
    assert outer.count() == 3
    unmatched = [r for r in outer.collect() if r["k"] == 2]
    assert unmatched[0]["r_rid"] is None  # right ts 200 > left 100


def test_local_graph_rejects_unknown_edge_endpoints(spark):
    nodes = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    edges = spark.createDataFrame([(1, 2), (1, 99)], "src long, dst long")
    g = P.PropertyGraph(spark, nodes, edges)
    with pytest.raises(ValueError, match="absent from nodes table"):
        _ = g.local


def test_empty_docs_do_not_dedup_together(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import dedup

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text here")], "doc_id long, text string"
    )
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.1, n=3)
    assert pairs.count() == 0  # empty docs share no shingles anymore


def test_asof_strategies_agree(spark):
    """ranked vs pandas as-of strategies must return identical matches,
    including right_ts ties (max-tiebreak wins) and strict mode."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 1, 105), (3, 1, 110), (4, 2, 100), (5, 3, 50)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 100, 7), (1, 100, 9), (1, 105, 3), (2, 90, 1), (3, 60, 2)],
        "k long, ts long, v long",
    )
    for strict in (False, True):
        ranked = asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_tiebreak="v", strict=strict, how="left", strategy="ranked",
        )
        pandas_ = asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_tiebreak="v", strict=strict, how="left", strategy="pandas",
        )
        def key(rows):
            return sorted(
                (r["lid"], r["r_ts"], r["r_v"]) for r in rows
            )
        assert key(ranked.collect()) == key(pandas_.collect()), f"strict={strict}"

    auto = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_tiebreak="v", how="left", strategy="auto",
    )
    assert auto.count() == 5
