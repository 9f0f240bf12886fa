"""Hybrid retrieval — reciprocal-rank fusion of lexical and embedding
rankers (Cormack/Clarke/Buettcher, SIGIR 2009 "Reciprocal Rank Fusion
outperforms Condorcet and individual Rank Learning Methods" [public]).

The engine already ships both retrieval families the fusion needs:
`text.bm25_topk_batch` (Okapi BM25, one corpus pass for a query batch)
and the `simsearch` cosine rankers.  RRF combines any two ranked lists
without score calibration: rrf(d) = sum over lists of 1/(k0 + rank_d),
documents missing from a list contribute nothing.  k0 = 60 is the
paper's constant.

Determinism: ranks are row_number positions under a strict
(score DESC, id ASC) order on ROUNDED scores, so both engines agree on
every rank; the fused score is two elementwise IEEE divisions and one
addition on identical integers — identical in Spark and DuckDB, rounded
to 9 for the gate.

Scale shape: the fusion itself is one full-outer join of two k-bounded
lists per query (tiny by construction) + a query-partitioned window —
all the data-sized work lives in the upstream rankers, both already
audited (BM25: one corpus pass for the batch; cosine: one broadcast
probe join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K0 = 60


def rrf_fuse(
    a: DataFrame, b: DataFrame, k0: int = RRF_K0, k: int = 10
) -> DataFrame:
    """(query_id, doc_id, rrf, pos): fuse two (query_id, doc_id, pos)
    ranked lists; per query the top-``k`` by fused score, ties broken by
    doc_id (strict order -> deterministic cross-engine)."""
    pa = a.select(
        "query_id", "doc_id", F.col("pos").cast("long").alias("pa")
    )
    pb = b.select(
        "query_id", "doc_id", F.col("pos").cast("long").alias("pb")
    )
    fused = pa.join(pb, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("pa")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("pb")), F.lit(0.0)
            ),
            9,
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
    )


def cosine_rank_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, doc_id, pos): per probe vector, the top-``k`` rows by
    rounded cosine under the strict (cosine DESC, id ASC) order — the
    positional-rank view of `simsearch.cosine_topk`, batched (one
    broadcast probe join for ALL queries)."""
    from .simsearch import cosine

    q = embeddings.where(F.col(id_col).isin([int(x) for x in query_ids])).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    )
    scored = embeddings.join(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("doc_id"),
        F.round(cosine(F.col(vec_col), F.col("_q")), 5).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("doc_id")
    )
    return (
        scored.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
        .select("query_id", "doc_id", "pos")
    )


def cosine_rank_batch_oracle_sql(
    query_ids: list[int], k: int = 10, dims: int = 64
) -> str:
    """DuckDB twin of `cosine_rank_batch` over the ``embeddings`` view."""
    ids = ", ".join(str(int(x)) for x in query_ids)
    dot = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"
    )
    nrm = (
        lambda t: f"SQRT(list_sum(list_transform(range(1, {dims + 1}), "
        f"i -> CAST({t}.embedding[i] AS DOUBLE) * CAST({t}.embedding[i] AS DOUBLE))))"
    )
    return f"""
SELECT query_id, doc_id, pos FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY ROUND({dot} / ({nrm('e')} * {nrm('q')}), 5) DESC,
                    e.vec_id ASC) AS BIGINT) AS pos
  FROM embeddings e
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id IN ({ids})) q
) r WHERE pos <= {k}
"""


def rrf_fuse_oracle_sql(
    a_sql: str, b_sql: str, k0: int = RRF_K0, k: int = 10
) -> str:
    """DuckDB twin of `rrf_fuse`: ``a_sql`` / ``b_sql`` yield
    (query_id, doc_id, pos)."""
    return f"""
WITH rrf_a AS ({a_sql}),
rrf_b AS ({b_sql}),
rrf_f AS (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         COALESCE(a.doc_id, b.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({k0} + a.pos), 0.0)
               + COALESCE(1.0 / ({k0} + b.pos), 0.0), 9) AS rrf
  FROM rrf_a a
  FULL OUTER JOIN rrf_b b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id)
SELECT query_id, doc_id, rrf,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
         AS pos
FROM rrf_f
QUALIFY pos <= {k}
"""
