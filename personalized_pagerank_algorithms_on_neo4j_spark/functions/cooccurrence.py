"""Item-item co-occurrence similarity over (basket, item) incidence pairs.

The recommender-style "customers who bought X also bought Y" shape, applied
here to the same customer->supplier incidence the PPR graph is built from
(tpch_graph.py): two suppliers are similar when many customers ordered from
both. The reference expresses relatedness through random walks (PPR scores);
co-occurrence Jaccard is the direct set-overlap counterpart — both belong in
the same graph-analytics surface.

Scale shape: the pair generation is the classic per-basket self-join, whose
cost is sum_b deg(b)^2 — quadratic in the HOT basket, linear in everything
else. `max_basket_size` drops baskets above the cap BEFORE the join (a
power-user who bought everything contributes deg^2 join rows and near-zero
similarity signal — the same argument as `ngram_jaccard_pairs.max_shingle_df`).
Degrees for the Jaccard denominator are computed over the SAME capped
incidence so the score stays a true Jaccard of the sets actually joined.
The degree join broadcasts (|items| rows); the heavy exchange is the single
hash partition on basket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    incidence: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    max_basket_size: int | None = 4096,
    min_shared: int = 1,
    materialize: bool = True,
) -> DataFrame:
    """(item_a, item_b, shared): distinct-basket co-occurrence counts for
    unordered item pairs (item_a < item_b) sharing >= min_shared baskets.

    ``materialize=False`` skips the incidence checkpoint when the caller
    passes an already-materialized frame (item_jaccard does)."""
    e = incidence.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket_size is not None:
        big = (
            e.groupBy("basket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") > max_basket_size)
            .select("basket")
        )
        e = e.join(F.broadcast(big), "basket", "left_anti")
    if materialize:
        # the capped incidence feeds BOTH self-join sides (and, via the
        # cap, its own basket-size aggregate): without materialization the
        # upstream incidence derivation re-runs once per reference
        e = e.localCheckpoint(eager=True)
    a = e.select("basket", F.col("item").alias("item_a"))
    b = e.select("basket", F.col("item").alias("item_b"))
    return (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def item_jaccard(
    incidence: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    max_basket_size: int | None = 4096,
    min_shared: int = 1,
) -> DataFrame:
    """(item_a, item_b, shared, jaccard): co-occurrence Jaccard
    |A ∩ B| / |A ∪ B| over each item's (capped) basket set, ROUND 6."""
    e = incidence.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket_size is not None:
        big = (
            e.groupBy("basket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") > max_basket_size)
            .select("basket")
        )
        e = e.join(F.broadcast(big), "basket", "left_anti")
    # one materialization shared by the pair self-join AND the degree
    # aggregate below — previously the distinct+cap pipeline re-ran for
    # every reference (the plan audit showed 62 exchanges / 32 scans on
    # supplier_cooccurrence)
    e = e.localCheckpoint(eager=True)
    pairs = cooccurrence_pairs(
        e,
        "basket",
        "item",
        max_basket_size=None,
        min_shared=min_shared,
        materialize=False,
    )
    deg = e.groupBy("item").agg(F.count(F.lit(1)).alias("deg"))
    return (
        pairs.join(
            F.broadcast(deg.select(F.col("item").alias("item_a"), F.col("deg").alias("da"))),
            "item_a",
        )
        .join(
            F.broadcast(deg.select(F.col("item").alias("item_b"), F.col("deg").alias("db"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "shared",
            F.round(
                F.col("shared").cast("double")
                / (F.col("da") + F.col("db") - F.col("shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def supplier_cooccurrence_oracle_sql(min_shared: int) -> str:
    """DuckDB twin of the basket-cooccurrence query over
    orders x lineitem (basket = customer, item = supplier)."""
    return f"""
WITH e AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS basket,
                  CAST(l.l_suppkey AS BIGINT) AS item
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
deg AS (SELECT item, COUNT(*) AS d FROM e GROUP BY 1),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS shared
  FROM e a JOIN e b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {int(min_shared)}
)
SELECT item_a, item_b, shared,
       ROUND(CAST(shared AS DOUBLE) / (da.d + db.d - shared), 6) AS jaccard
FROM pairs
JOIN deg da ON pairs.item_a = da.item
JOIN deg db ON pairs.item_b = db.item
"""
