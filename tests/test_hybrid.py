"""Hybrid retrieval RRF (functions/hybrid): fused-score fixture,
missing-list contribution, and determinism of the positional ranks."""

from __future__ import annotations

from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions.hybrid import (
    RRF_K0,
    cosine_rank_batch,
    rrf_fuse,
)


def test_rrf_fixture(spark):
    """Hand-checked fusion: a doc ranked #1 in both lists beats a doc
    ranked #1 in only one; docs missing from a list get only the other
    list's contribution."""
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, pos long",
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 13, 1)],
        "query_id long, doc_id long, pos long",
    )
    rows = {r.doc_id: (r.rrf, r.pos) for r in rrf_fuse(a, b, k=10).collect()}
    k0 = RRF_K0
    assert rows[10][0] == round(1 / (k0 + 1) + 1 / (k0 + 2), 9)
    assert rows[11][0] == round(1 / (k0 + 2), 9)
    assert rows[13][0] == round(1 / (k0 + 1), 9)
    # doc 10 (in both) outranks doc 13 (single #1), which outranks doc 11
    assert rows[10][1] == 1 and rows[13][1] == 2 and rows[11][1] == 3


def test_cosine_rank_batch_matches_single(spark):
    """The batched positional ranks agree with per-query brute cosine
    ordering (rounded scores, id tie-break)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r.query_id, r.pos): r.doc_id
        for r in cosine_rank_batch(e, [1, 2], k=5).collect()
    }
    assert len(got) == 10
    # rank 1 for each probe is the probe itself (cosine 1.0, smallest id
    # tie-break among exact ties only)
    assert got[(1, 1)] == 1 and got[(2, 1)] == 2
