"""Graph feature engineering beyond PPR: multi-hop neighborhood stats.

`two_hop_neighbors` is the canonical friend-of-friend shape — the edge
self-join whose output explodes through hub nodes (a mid node of degree d
contributes in_deg(mid) * d pairs). The scale control is the HUB CAP:
exclude middle nodes whose out-degree exceeds the cap before the join,
exactly the argument behind the shingle-DF cap in `dedup.ngram_jaccard`
and the basket cap in `cooccurrence.item_jaccard` — a hub's 2-hop
contribution is near-uniform reachability, so dropping it changes little
while bounding the join output to in_deg * cap per mid. The cap is part
of the operator's declared semantics (the DuckDB oracle applies the same
cap), not a silent truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_hop_neighbors", "two_hop_oracle_sql"]


def two_hop_neighbors(
    edges: DataFrame,
    hub_cap: int | None = 1_000,
) -> DataFrame:
    """(node, n_two_hop): distinct nodes reachable in exactly two hops —
    excluding the node itself and its direct out-neighbors. `hub_cap`
    drops middle nodes with out-degree > cap before the self-join."""
    e = edges.select("src", "dst")
    mid = e.groupBy(F.col("src").alias("mid")).agg(
        F.count(F.lit(1)).alias("mid_deg")
    )
    if hub_cap is not None:
        mid = mid.where(F.col("mid_deg") <= hub_cap)
    hop1 = e.join(mid, e.dst == mid.mid).select("src", "mid")
    e2 = e.select(F.col("src").alias("mid"), F.col("dst").alias("two"))
    pairs = (
        hop1.join(e2, "mid")
        .select("src", "two")
        .where(F.col("src") != F.col("two"))
        .join(
            e.select("src", F.col("dst").alias("two")), ["src", "two"], "left_anti"
        )
        .distinct()
    )
    return pairs.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("n_two_hop")
    )


def two_hop_oracle_sql(edges_sql: str, hub_cap: int | None = 1_000) -> str:
    """DuckDB twin over any edge-producing SQL (columns src, dst)."""
    cap_clause = f"WHERE mid_deg <= {hub_cap}" if hub_cap is not None else ""
    return f"""
WITH e AS ({edges_sql}),
mid AS (
  SELECT src AS mid, COUNT(*) AS mid_deg FROM e GROUP BY 1
),
capped AS (SELECT mid FROM mid {cap_clause}),
pairs AS (
  SELECT DISTINCT e1.src AS src, e2.dst AS two
  FROM e e1
  JOIN capped c ON e1.dst = c.mid
  JOIN e e2 ON e2.src = e1.dst
  WHERE e1.src <> e2.dst
    AND NOT EXISTS (
      SELECT 1 FROM e d WHERE d.src = e1.src AND d.dst = e2.dst
    )
)
SELECT src AS node, COUNT(*) AS n_two_hop FROM pairs GROUP BY 1
"""
