"""Derive a property graph from the driver's TPC-H-ish star schema.

Deterministic projection of existing keys (FIXTURES.md "Relational-operator
checks"): customers, suppliers and nations become nodes in one long id space;
edges are

  customer --(ordered from)--> supplier   (distinct pairs via orders x lineitem)
  supplier --(located in)---> nation
  customer --(located in)---> nation

Nations have out-degree 0, which exercises the reference's dangling->source
rule (Forward_Push.java:101-115). Node id space: customer = c_custkey,
supplier = SUPP_BASE + s_suppkey, nation = NATION_BASE + n_nationkey.

``graph_oracle_sql`` returns the *identical* derivation as ANSI SQL so a DuckDB
oracle can rebuild byte-identical node/edge tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..graph import PropertyGraph

SUPP_BASE = 1_000_000
NATION_BASE = 2_000_000


def load_tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    # Each spark.read.parquet() does a driver-side footer/schema read
    # (~hundreds of ms of filesystem latency each); the five tables are
    # independent, so infer their schemas concurrently. Spark's session is
    # thread-safe for read-path planning.
    from concurrent.futures import ThreadPoolExecutor

    names = ["customer", "supplier", "nation", "orders", "lineitem"]
    with ThreadPoolExecutor(max_workers=len(names)) as pool:
        dfs = list(
            pool.map(lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet"), names)
        )
    customer, supplier, nation, orders, lineitem = dfs

    nodes = (
        customer.select(F.col("c_custkey").cast("long").alias("id"), F.col("c_name").alias("name"))
        .unionAll(
            supplier.select(
                (F.col("s_suppkey") + F.lit(SUPP_BASE)).cast("long").alias("id"),
                F.col("s_name").alias("name"),
            )
        )
        .unionAll(
            nation.select(
                (F.col("n_nationkey") + F.lit(NATION_BASE)).cast("long").alias("id"),
                F.col("n_name").alias("name"),
            )
        )
    )

    cust_supp = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPP_BASE)).cast("long").alias("dst"),
        )
        .distinct()
    )
    supp_nation = supplier.select(
        (F.col("s_suppkey") + F.lit(SUPP_BASE)).cast("long").alias("src"),
        (F.col("s_nationkey") + F.lit(NATION_BASE)).cast("long").alias("dst"),
    )
    cust_nation = customer.select(
        F.col("c_custkey").cast("long").alias("src"),
        (F.col("c_nationkey") + F.lit(NATION_BASE)).cast("long").alias("dst"),
    )
    edges = cust_supp.unionAll(supp_nation).unionAll(cust_nation)
    # endpoints mapped through the node tables themselves -> coverage by
    # construction; dangling_nodes may skip the O(m) dst union-distinct
    return PropertyGraph(spark, nodes, edges, nodes_cover_edges=True)


GRAPH_EDGES_SQL = f"""
SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
       CAST(l.l_suppkey + {SUPP_BASE} AS BIGINT) AS dst
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT CAST(s_suppkey + {SUPP_BASE} AS BIGINT), CAST(s_nationkey + {NATION_BASE} AS BIGINT)
FROM supplier
UNION ALL
SELECT CAST(c_custkey AS BIGINT), CAST(c_nationkey + {NATION_BASE} AS BIGINT)
FROM customer
"""

GRAPH_NODES_SQL = f"""
SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name FROM customer
UNION ALL
SELECT CAST(s_suppkey + {SUPP_BASE} AS BIGINT), s_name FROM supplier
UNION ALL
SELECT CAST(n_nationkey + {NATION_BASE} AS BIGINT), n_name FROM nation
"""

GRAPH_DEGREES_SQL = f"""
SELECT n.id AS node,
       COALESCE(o.out_degree, 0) AS out_degree,
       COALESCE(i.in_degree, 0) AS in_degree
FROM ({GRAPH_NODES_SQL}) n
LEFT JOIN (SELECT src, COUNT(*) AS out_degree FROM ({GRAPH_EDGES_SQL}) GROUP BY src) o
       ON n.id = o.src
LEFT JOIN (SELECT dst, COUNT(*) AS in_degree FROM ({GRAPH_EDGES_SQL}) GROUP BY dst) i
       ON n.id = i.dst
"""
