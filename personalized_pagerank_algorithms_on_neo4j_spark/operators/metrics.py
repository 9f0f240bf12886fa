"""Oracle-comparison error metrics (E1-E3).

Reference: Gen_Util.java:259-326.
- precision@k: |est topk ∩ gnd topk| / |gnd topk| — denominator is the oracle
  *tie-set* size, not k (Gen_Util.java:271-279). Semi-join + counts.
- NDCG@k: gain 2^ppr - 1, log2(i+1) discount; the estimate's i-th node is
  scored by the *oracle's* ppr for that node, missing => 0
  (Gen_Util.java:280-300). Z_k is the oracle tie-set's own DCG.
- MaxErr: max over *oracle* nodes of |est - gnd|, est missing => 0 — a LEFT
  join from the ground-truth side; estimate-only nodes are ignored
  (Gen_Util.java:306-321).

All three run as DataFrame plans (the inputs are top-k-sized or node-sized).
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..plans.windows import bounded_global_window


def precision_at_k(est_topk: DataFrame, gnd_topk: DataFrame) -> float:
    """est_topk/gnd_topk: (node, ppr) tie-sets from retrieve_topk."""
    gnd_n = gnd_topk.count()
    if gnd_n == 0:
        return 0.0
    hits = est_topk.join(gnd_topk.select("node"), "node", "left_semi").count()
    return hits / gnd_n


def _dcg(ranked: DataFrame, gain_col: str = "gain") -> float:
    """sum over i of (2^gain_i - 1)/log2(i+1); `ranked` has (pos, gain)."""
    row = ranked.agg(
        F.sum(
            (F.pow(F.lit(2.0), F.col(gain_col)) - F.lit(1.0))
            / F.log(2.0, F.col("pos") + F.lit(1.0))
        ).alias("dcg")
    ).collect()[0]
    return row["dcg"] or 0.0


def ndcg_at_k(est_topk: DataFrame, gnd_topk: DataFrame) -> float | None:
    """NDCG of the estimated ranking against the oracle tie-set."""
    # rank over the k-row top-k tie-set — bounded by construction
    w = bounded_global_window(F.desc("ppr"), F.asc("node"))
    gnd_ranked = gnd_topk.select(
        "node", F.col("ppr").alias("gain"), F.row_number().over(w).alias("pos")
    )
    zk = _dcg(gnd_ranked)
    if zk == 0.0:
        return None
    # the estimate's i-th node is scored by the ORACLE's ppr, missing => 0 (J6)
    est_ranked = (
        est_topk.select("node", F.row_number().over(w).alias("pos"))
        .join(gnd_topk.select("node", F.col("ppr").alias("gain")), "node", "left")
        .select("pos", F.coalesce("gain", F.lit(0.0)).alias("gain"))
    )
    return _dcg(est_ranked) / zk


def max_err(est: DataFrame, gnd: DataFrame) -> float:
    """Max |est - gnd| over oracle nodes (LEFT join from the oracle side, J4)."""
    joined = gnd.select("node", F.col("ppr").alias("gnd_ppr")).join(
        est.select("node", F.col("ppr").alias("est_ppr")), "node", "left"
    )
    row = joined.agg(
        F.max(
            F.abs(F.coalesce("est_ppr", F.lit(0.0)) - F.col("gnd_ppr"))
        ).alias("max_err")
    ).collect()[0]
    return row["max_err"] or 0.0
