"""CSV graph source: the neo4j-admin bulk-import format the reference ships.

Node CSV header ``:ID,name`` and relationship CSV header
``:START_ID,:END_ID,:TYPE`` (reference dataset/got/GOT_Nodes.csv:1,
GOT_Rels.csv:1, README.md:17-19). Node ``:ID`` is a string; we map string ids
to dense longs equal to each id's rank in the global sort order (the same
mapping a ``row_number() - 1`` window gives, but computed zipWithIndex-style:
range-partition by id, number within each partition, add per-partition
offsets). No stage ever sorts the whole node table on one partition, so the
load path holds at 1e9 nodes. ``monotonically_increasing_id`` is non-dense,
hence unusable here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..graph import PropertyGraph


def dense_ids(df: DataFrame, order_col: str, id_name: str = "id") -> DataFrame:
    """Append ``id_name`` = rank of ``order_col`` in global ascending order,
    0-based, without a global single-partition sort.

    Plan shape: repartitionByRange(order_col) gives non-overlapping sorted
    ranges in partition-index order; a tiny per-partition count job yields
    cumulative offsets (P rows on the driver); ids are then
    ``row_number within partition - 1 + offset[pid]``. The within-partition
    window shuffles by pid only — each range stays one task. Because offsets
    come from observed partition counts, the result is identical for ANY
    range boundaries, so sampling nondeterminism in the range partitioner
    cannot change ids (order_col values must be distinct).
    """
    spark = df.sparkSession
    n_part = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        df.repartitionByRange(n_part, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid: one materialization feeds both jobs
    )
    counts = ranged.groupBy("_pid").count().collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    off = F.create_map(
        *[F.lit(x) for pid_acc in offsets.items() for x in pid_acc]
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        ranged.withColumn(
            id_name,
            (F.row_number().over(w) - F.lit(1) + off[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )


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

    id_map = dense_ids(
        raw_nodes.select("orig_id", "name"), "orig_id"
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
