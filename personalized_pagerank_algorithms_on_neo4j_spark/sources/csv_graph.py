"""CSV graph source: the neo4j-admin bulk-import format the reference ships.

Node CSV header ``:ID,name`` and relationship CSV header
``:START_ID,:END_ID,:TYPE`` (reference dataset/got/GOT_Nodes.csv:1,
GOT_Rels.csv:1, README.md:17-19). Node ``:ID`` is a string; we map string ids
to dense longs with a ``row_number() - 1`` window over the sorted id (a
deterministic dense mapping — ``monotonically_increasing_id`` is non-dense).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..graph import PropertyGraph


def load_csv_graph(
    spark: SparkSession,
    nodes_path: str,
    edges_path: str,
    rel_type: str | None = "Relation",
) -> PropertyGraph:
    raw_nodes = spark.read.option("header", True).csv(nodes_path)
    # The BOM sometimes survives into the first header name; normalize.
    first_col = raw_nodes.columns[0]
    raw_nodes = raw_nodes.withColumnRenamed(first_col, "orig_id")

    w = Window.orderBy("orig_id")
    id_map = raw_nodes.select(
        "orig_id",
        F.col("name"),
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("id"),
    ).cache()

    nodes = id_map.select("id", "name")

    raw_edges = spark.read.option("header", True).csv(edges_path)
    s, d, t = raw_edges.columns[:3]
    raw_edges = (
        raw_edges.withColumnRenamed(s, "src_orig")
        .withColumnRenamed(d, "dst_orig")
        .withColumnRenamed(t, "rel_type")
    )
    if rel_type is not None:
        raw_edges = raw_edges.where(F.col("rel_type") == rel_type)

    src_map = id_map.select(F.col("orig_id").alias("src_orig"), F.col("id").alias("src"))
    dst_map = id_map.select(F.col("orig_id").alias("dst_orig"), F.col("id").alias("dst"))
    edges = (
        raw_edges.join(F.broadcast(src_map), "src_orig")
        .join(F.broadcast(dst_map), "dst_orig")
        .select("src", "dst")
    )
    # endpoints mapped through the node tables themselves -> coverage by
    # construction; dangling_nodes may skip the O(m) dst union-distinct
    return PropertyGraph(spark, nodes, edges, nodes_cover_edges=True)
