"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001 (whole-graph PPR with names).
queries()     -> one callable per implemented operator from SURVEY.md section 2.
oracle_sql()  -> equivalent DuckDB SQL per query (omitted only for stochastic
                 operators — random walks have no SQL-expressible oracle).

Cross-engine float discipline (Spark vs DuckDB must hash-match):
- monetary aggregates go through exact integer cents:
  CAST(ROUND(x*100) AS BIGINT); sums are exact integers; a final /100.0
  (IEEE-exact rounding) yields identical doubles in both engines.
- iteratively-computed PPR doubles are ROUND(x, 7)-ed on both sides — the two
  engines evaluate the same recurrence with summation-order noise ~1e-15.
- the Power-Method oracle SQL is *generated*: one chained CTE per iteration
  replays the exact synchronous-push recurrence (Power_Method.java:43-101
  semantics) over the same derived graph.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark import PPREngine, load_tpch_graph
from personalized_pagerank_algorithms_on_neo4j_spark.operators import topk as topk_ops
from personalized_pagerank_algorithms_on_neo4j_spark.sources.tpch_graph import (
    GRAPH_DEGREES_SQL,
    GRAPH_EDGES_SQL,
    GRAPH_NODES_SQL,
)

ALPHA = 0.15
POWER_ITERS = 30
POWER_ITERS_LO = 10

_graph_cache: dict[str, object] = {}


def _graph(spark: SparkSession, sf_dir: str):
    key = sf_dir.rstrip("/")
    if key not in _graph_cache:
        _graph_cache[key] = load_tpch_graph(spark, key)
    return _graph_cache[key]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def _source(graph) -> int:
    # deterministic source: the smallest customer node id
    return int(
        graph.nodes.where(F.col("id") < 1_000_000).agg(F.min("id")).collect()[0][0]
    )


def _cents(col):
    """Exact integer cents from a 2-decimal double (identical in DuckDB)."""
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Graph / PPR queries (SURVEY 2a, 2g)
# ---------------------------------------------------------------------------


def q_graph_stats(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return spark.createDataFrame(
        [(g.n, g.m)], schema="n_nodes long, n_edges long"
    )


def q_graph_degrees(spark, sf_dir):
    return _graph(spark, sf_dir).degrees


def _power_df(spark, sf_dir, iterations):
    g = _graph(spark, sf_dir)
    eng = PPREngine(g, alpha=ALPHA)
    df = eng.ppr(_source(g), algo="power", iterations=iterations)
    return df.select("node", F.round("ppr", 7).alias("ppr")).where(F.col("ppr") > 0)


def q_ppr_power(spark, sf_dir):
    return _power_df(spark, sf_dir, POWER_ITERS)


def q_ppr_power_topk(spark, sf_dir):
    return topk_ops.retrieve_topk(_power_df(spark, sf_dir, POWER_ITERS), 10)


def q_ppr_power_names(spark, sf_dir):
    g = _graph(spark, sf_dir)
    top = topk_ops.retrieve_topk(_power_df(spark, sf_dir, POWER_ITERS), 20)
    return g.with_names(top).select("node", "ppr", "name")


def q_ppr_maxerr(spark, sf_dir):
    """E3: MaxErr between the 30-iter oracle and a 10-iter estimate (LEFT join
    from the oracle side, Gen_Util.java:306-321)."""
    gnd = _power_df(spark, sf_dir, POWER_ITERS)
    est = _power_df(spark, sf_dir, POWER_ITERS_LO)
    j = gnd.select("node", F.col("ppr").alias("g")).join(
        est.select("node", F.col("ppr").alias("e")), "node", "left"
    )
    return j.agg(
        F.round(F.max(F.abs(F.coalesce("e", F.lit(0.0)) - F.col("g"))), 7).alias(
            "max_err"
        )
    )


def q_ppr_precision(spark, sf_dir):
    """E1: |est top-10 ∩ gnd top-10| / |gnd top-10| (tie-sets)."""
    gnd_k = topk_ops.retrieve_topk(_power_df(spark, sf_dir, POWER_ITERS), 10)
    est_k = topk_ops.retrieve_topk(_power_df(spark, sf_dir, POWER_ITERS_LO), 10)
    hits = est_k.join(gnd_k.select("node"), "node", "left_semi").count()
    gnd_n = gnd_k.count()
    return spark.createDataFrame(
        [(float(hits) / float(gnd_n),)], schema="precision double"
    )


# ---------------------------------------------------------------------------
# Relational operators on the star schema (SURVEY 2b-2e)
# ---------------------------------------------------------------------------


def q_revenue_by_customer(spark, sf_dir):
    """J1/A2: orders ⋈ lineitem equi join + sum-by-key (exact cents)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = (_cents(F.col("l_extendedprice")) * _cents(F.lit(1.0) - F.col("l_discount")))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            (F.sum(rev) / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_revenue_by_nation(spark, sf_dir):
    """J2: two-hop expansion lineitem ⋈ supplier ⋈ nation (broadcast dims)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = (_cents(F.col("l_extendedprice")) * _cents(F.lit(1.0) - F.col("l_discount")))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg((F.sum(rev) / F.lit(10000.0)).alias("revenue"))
    )


def q_customer_order_counts(spark, sf_dir):
    """J3/P5: left join + coalesce-0 (missing row => 0 semantics)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return c.join(cnt, c.c_custkey == cnt.o_custkey, "left").select(
        "c_custkey", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


def q_customer_spend_share(spark, sf_dir):
    """P2/P4: scalar / global-aggregate normalization + threshold filter."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("cents")
    )
    total = spend.agg(F.sum("cents").alias("total_cents"))
    return (
        spend.crossJoin(total)
        .select(
            "o_custkey",
            (F.col("cents").cast("double") / F.col("total_cents").cast("double")).alias(
                "share"
            ),
        )
        .where(F.col("share") >= 0.002)
    )


def q_part_math(spark, sf_dir):
    """P7: math scalar functions (log/sqrt/pow/ceil/abs/greatest)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.log(F.col("p_retailprice")), 6).alias("log_price"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("sqrt_size"),
        F.round(F.pow(F.lit(2.0), F.col("p_size").cast("double") / 8.0), 6).alias(
            "pow_size"
        ),
        F.ceil(F.col("p_retailprice") / 100.0).cast("long").alias("ceil_hundreds"),
        F.abs(F.col("p_size") - 25).cast("long").alias("abs_off"),
        F.greatest(F.col("p_size").cast("long"), F.lit(10).cast("long")).alias(
            "greatest_size"
        ),
    )


def q_orders_by_month(spark, sf_dir):
    """P9/A5: timestamp formatting + count per bucket."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_global_aggs(spark, sf_dir):
    """A3-A6: global sum / max / count / avg in one row (exact cents)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        (F.sum(_cents(F.col("l_extendedprice"))) / F.lit(100.0)).alias("sum_price"),
        (F.max(_cents(F.col("l_extendedprice"))) / F.lit(100.0)).alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
        (
            (F.sum(_cents(F.col("l_extendedprice"))) / F.count(F.lit(1))).cast("long")
        ).alias("avg_price_cents_floor"),
    )


def q_top_orders_ties(spark, sf_dir):
    """T1/T3: descending sort + tie-aware top-k (k-th value filter == rank()<=k)."""
    o = _t(spark, sf_dir, "orders")
    df = o.select(
        "o_orderkey", (_cents(F.col("o_totalprice")) / F.lit(100.0)).alias("price")
    )
    return topk_ops.retrieve_topk(df, 10, value_col="price")


def q_customers_without_orders(spark, sf_dir):
    """J5 complement: anti join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def q_delta_merge(spark, sf_dir):
    """A2: two keyed increment streams folded into per-key totals (the
    residue/reserve merge shape, Forward_Push.java:117-139)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    d1 = o.select(F.col("o_custkey").alias("key"), F.lit(1).cast("long").alias("delta"))
    d2 = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("key"), F.col("l_linenumber").cast("long").alias("delta"))
    )
    return d1.unionAll(d2).groupBy("key").agg(F.sum("delta").alias("total"))


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (dedup / text / similarity)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized text; keep groups > 1."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.lower(F.col("text"))).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def q_token_counts(spark, sf_dir):
    """Token counting + length stats per document."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "lang",
    )


def q_simsearch_cosine(spark, sf_dir):
    """Brute-force cosine top-20 against the vec_id=0 embedding (ANN baseline).
    Dot products via zip_with/aggregate (JVM-side, no UDF)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    j = e.crossJoin(F.broadcast(q))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("embedding"), F.col("qe")) / (
        F.sqrt(dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    scored = j.select("vec_id", F.round(cos, 5).alias("cosine"))
    return topk_ops.retrieve_topk(scored, 20, value_col="cosine")


# ---------------------------------------------------------------------------
# Stochastic operators — no SQL-expressible oracle (rows-only checks)
# ---------------------------------------------------------------------------


def q_ppr_montecarlo(spark, sf_dir):
    g = _graph(spark, sf_dir)
    eng = PPREngine(g, alpha=ALPHA)
    return eng.ppr(_source(g), algo="montecarlo", epsilon=0.5, seed=42)


def q_ppr_fora(spark, sf_dir):
    g = _graph(spark, sf_dir)
    eng = PPREngine(g, alpha=ALPHA)
    return eng.ppr(_source(g), algo="fora", epsilon=0.5, seed=42)


def q_ppr_fora_topk(spark, sf_dir):
    g = _graph(spark, sf_dir)
    eng = PPREngine(g, alpha=ALPHA)
    return eng.topk(_source(g), 10, algo="fora_topk", epsilon=0.5, seed=42)


# ---------------------------------------------------------------------------
# Oracle SQL generation
# ---------------------------------------------------------------------------

_GRAPH_CTES = f"""edges AS MATERIALIZED ({GRAPH_EDGES_SQL}),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ew AS MATERIALIZED (SELECT e.src, e.dst, d.od FROM edges e JOIN deg d ON e.src = d.src),
srcn AS MATERIALIZED (SELECT CAST(MIN(c_custkey) AS BIGINT) AS s FROM customer)"""


def _power_chain(prefix: str, iterations: int, alpha: float = ALPHA) -> str:
    """Chained CTEs replaying the synchronous push recurrence."""
    ctes = [
        f"""{prefix}0 AS MATERIALIZED (
  SELECT s AS node, CAST(1.0 AS DOUBLE) AS residue, CAST(0.0 AS DOUBLE) AS reserve
  FROM srcn)"""
    ]
    for i in range(iterations):
        ctes.append(
            f"""{prefix}{i + 1} AS MATERIALIZED (
  SELECT node, SUM(residue) AS residue, SUM(reserve) AS reserve FROM (
    SELECT node, CAST(0.0 AS DOUBLE) AS residue,
           reserve + {alpha} * residue AS reserve
    FROM {prefix}{i}
    UNION ALL
    SELECT ew.dst AS node, (1.0 - {alpha}) * t.residue / ew.od AS residue,
           CAST(0.0 AS DOUBLE) AS reserve
    FROM {prefix}{i} t JOIN ew ON t.node = ew.src
    UNION ALL
    SELECT (SELECT s FROM srcn) AS node,
           (1.0 - {alpha}) * SUM(t.residue) AS residue,
           CAST(0.0 AS DOUBLE) AS reserve
    FROM {prefix}{i} t LEFT JOIN deg ON t.node = deg.src
    WHERE deg.src IS NULL
    HAVING SUM(t.residue) IS NOT NULL
  ) u GROUP BY node)"""
        )
    return ",\n".join(ctes)


def _power_sql(iterations: int) -> str:
    return f"""WITH {_GRAPH_CTES},
{_power_chain("it", iterations)},
result AS (
  SELECT node, ROUND(reserve, 7) AS ppr FROM it{iterations} WHERE ROUND(reserve, 7) > 0
)"""


_REV_CENTS = (
    "CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
    "CAST(ROUND((1.0-l_discount)*100) AS BIGINT)"
)


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}
    sql["graph_stats"] = f"""
SELECT (SELECT COUNT(*) FROM ({GRAPH_NODES_SQL}) n) AS n_nodes,
       (SELECT COUNT(*) FROM ({GRAPH_EDGES_SQL}) e) AS n_edges
"""
    sql["graph_degrees"] = GRAPH_DEGREES_SQL
    sql["ppr_power"] = _power_sql(POWER_ITERS) + "\nSELECT node, ppr FROM result"
    sql["ppr_power_topk"] = (
        _power_sql(POWER_ITERS)
        + """
SELECT node, ppr FROM result
QUALIFY RANK() OVER (ORDER BY ppr DESC) <= 10"""
    )
    sql["ppr_power_names"] = (
        _power_sql(POWER_ITERS)
        + f""",
topk AS (SELECT node, ppr FROM result QUALIFY RANK() OVER (ORDER BY ppr DESC) <= 20)
SELECT t.node, t.ppr, n.name FROM topk t LEFT JOIN ({GRAPH_NODES_SQL}) n ON t.node = n.id"""
    )
    sql["ppr_maxerr"] = f"""WITH {_GRAPH_CTES},
{_power_chain("it", POWER_ITERS)},
{_power_chain("jt", POWER_ITERS_LO)},
gnd AS (SELECT node, ROUND(reserve,7) AS ppr FROM it{POWER_ITERS} WHERE ROUND(reserve,7) > 0),
est AS (SELECT node, ROUND(reserve,7) AS ppr FROM jt{POWER_ITERS_LO} WHERE ROUND(reserve,7) > 0)
SELECT ROUND(MAX(ABS(COALESCE(e.ppr, 0.0) - g.ppr)), 7) AS max_err
FROM gnd g LEFT JOIN est e ON g.node = e.node"""
    sql["ppr_precision"] = f"""WITH {_GRAPH_CTES},
{_power_chain("it", POWER_ITERS)},
{_power_chain("jt", POWER_ITERS_LO)},
gnd AS (SELECT node, ROUND(reserve,7) AS ppr FROM it{POWER_ITERS} WHERE ROUND(reserve,7) > 0
        QUALIFY RANK() OVER (ORDER BY ROUND(reserve,7) DESC) <= 10),
est AS (SELECT node, ROUND(reserve,7) AS ppr FROM jt{POWER_ITERS_LO} WHERE ROUND(reserve,7) > 0
        QUALIFY RANK() OVER (ORDER BY ROUND(reserve,7) DESC) <= 10)
SELECT CAST((SELECT COUNT(*) FROM est WHERE est.node IN (SELECT node FROM gnd)) AS DOUBLE)
     / CAST((SELECT COUNT(*) FROM gnd) AS DOUBLE) AS precision
"""
    sql["revenue_by_customer"] = f"""
SELECT o.o_custkey,
       CAST(SUM({_REV_CENTS}) AS BIGINT) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_custkey
"""
    sql["revenue_by_nation"] = f"""
SELECT n.n_name,
       CAST(SUM({_REV_CENTS}) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""
    sql["customer_order_counts"] = """
SELECT c.c_custkey, COALESCE(o.n, 0) AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) o
  ON c.c_custkey = o.o_custkey
"""
    sql["customer_spend_share"] = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(cents AS DOUBLE) / CAST((SELECT SUM(cents) FROM spend) AS DOUBLE) AS share
FROM spend
WHERE CAST(cents AS DOUBLE) / CAST((SELECT SUM(cents) FROM spend) AS DOUBLE) >= 0.002
"""
    sql["part_math"] = """
SELECT p_partkey,
       ROUND(LN(p_retailprice), 6) AS log_price,
       ROUND(SQRT(CAST(p_size AS DOUBLE)), 6) AS sqrt_size,
       ROUND(POW(2.0, CAST(p_size AS DOUBLE)/8.0), 6) AS pow_size,
       CAST(CEIL(p_retailprice/100.0) AS BIGINT) AS ceil_hundreds,
       CAST(ABS(p_size - 25) AS BIGINT) AS abs_off,
       GREATEST(CAST(p_size AS BIGINT), 10) AS greatest_size
FROM part
"""
    sql["orders_by_month"] = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""
    sql["global_aggs"] = """
SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
       MAX(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 100.0 AS max_price,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / COUNT(*) AS BIGINT) AS avg_price_cents_floor
FROM lineitem
"""
    sql["top_orders_ties"] = """
SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) / 100.0 AS price
FROM orders
QUALIFY RANK() OVER (ORDER BY price DESC) <= 10
"""
    sql["customers_without_orders"] = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""
    sql["delta_merge"] = """
SELECT key, CAST(SUM(delta) AS BIGINT) AS total FROM (
  SELECT o_custkey AS key, CAST(1 AS BIGINT) AS delta FROM orders
  UNION ALL
  SELECT o.o_custkey AS key, CAST(l.l_linenumber AS BIGINT) AS delta
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
) u GROUP BY key
"""
    sql["dedup_exact"] = """
SELECT md5(lower(text)) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""
    sql["token_counts"] = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       lang
FROM documents
"""
    sql["simsearch_cosine"] = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         ROUND(
           list_sum(list_transform(range(1, 65),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
           / (SQRT(list_sum(list_transform(range(1, 65),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
            * SQRT(list_sum(list_transform(range(1, 65),
                    i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))),
         5) AS cosine
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, cosine FROM scored
QUALIFY RANK() OVER (ORDER BY cosine DESC) <= 20
"""
    return sql


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_stats": q_graph_stats,
        "graph_degrees": q_graph_degrees,
        "ppr_power": q_ppr_power,
        "ppr_power_topk": q_ppr_power_topk,
        "ppr_power_names": q_ppr_power_names,
        "ppr_maxerr": q_ppr_maxerr,
        "ppr_precision": q_ppr_precision,
        "revenue_by_customer": q_revenue_by_customer,
        "revenue_by_nation": q_revenue_by_nation,
        "customer_order_counts": q_customer_order_counts,
        "customer_spend_share": q_customer_spend_share,
        "part_math": q_part_math,
        "orders_by_month": q_orders_by_month,
        "global_aggs": q_global_aggs,
        "top_orders_ties": q_top_orders_ties,
        "customers_without_orders": q_customers_without_orders,
        "delta_merge": q_delta_merge,
        "dedup_exact": q_dedup_exact,
        "token_counts": q_token_counts,
        "simsearch_cosine": q_simsearch_cosine,
        # stochastic — rows-only checks (no SQL-expressible oracle)
        "ppr_montecarlo": q_ppr_montecarlo,
        "ppr_fora": q_ppr_fora,
        "ppr_fora_topk": q_ppr_fora_topk,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: whole-graph PPR over the sf0.001-derived graph, with names."""
    sf_dir = "/root/testdata/sf0.001"
    g = _graph(spark, sf_dir)
    eng = PPREngine(g, alpha=ALPHA)
    df = eng.ppr(_source(g), algo="power")
    return g.with_names(df).select("node", "name", "ppr").orderBy(F.desc("ppr"))
