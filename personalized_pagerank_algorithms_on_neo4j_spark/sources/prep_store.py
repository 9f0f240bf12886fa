"""Preprocessed-PPR store (S4/S5/S7/S8).

The reference persists one `<srcNodeId>.txt` of tab-separated (nodeId, ppr)
lines per source under `<ALGO>_ppr_results/<db>/<param>/`
(Forward_Push.java:301-362 and 4 clones). The Spark-native materialized view
is a Parquet table `ppr_prep(source, target, ppr [, rank])` written
`partitionBy("source")`: per-source lookups become partition-pruned scans
(Catalyst prunes on `source = s` for free), and "prep size" is the directory's
byte size, matching `getPrepSize()` (Forward_Push.java:431-434).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_prep(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """df: (source, target, ppr [, rank]) -> Parquet partitioned by source.

    Explicit-count repartition by source before the write: a dynamic
    partitionBy write parallelizes over TASKS, and an upstream plan that
    collapsed to few partitions (a limit, a broadcast join, or AQE
    coalescing a tiny exchange) would otherwise serialize hundreds of
    per-source directory commits through one task — measured 8.6s -> 3.2s
    for a 512-source prep at sf0.1. The explicit numPartitions is exempt
    from AQE coalescing by design. sortWithinPartitions keeps each
    source's rows descending-ppr inside the file (T5 sorted persist,
    Base_Whole_Graph.java:133-162)."""
    shuffle_n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        df.repartition(shuffle_n, "source")
        .sortWithinPartitions("source", F.desc("ppr"))
        .write.mode(mode)
        .partitionBy("source")
        .parquet(path)
    )


def read_prep(spark: SparkSession, path: str, source: int | None = None) -> DataFrame:
    """Read back; a `source=` predicate is satisfied by partition pruning."""
    df = spark.read.parquet(path)
    if source is not None:
        df = df.where(F.col("source") == int(source))
    return df


def prep_size_bytes(path: str) -> int:
    """Directory byte size (S7), the reference's prep-space metric."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def delete_prep(path: str) -> None:
    """Prep-dir lifecycle (S8)."""
    shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# Legacy text format (reference parity): one `<srcNodeId>.txt` per source,
# lines `nodeId\tppr` (write: Forward_Push.java:317-339; read: 343-362).
# ---------------------------------------------------------------------------


def write_prep_text(df: DataFrame, path: str) -> None:
    """(source, target, ppr) -> per-source text files of `target\\tppr` lines
    (partitioned text sink; one directory per source like the reference's
    one file per source)."""
    (
        df.select(
            "source",
            F.concat_ws("\t", F.col("target").cast("string"), F.col("ppr").cast("string")).alias(
                "value"
            ),
        )
        .write.mode("overwrite")
        .partitionBy("source")
        .text(path)
    )


def read_prep_text(spark: SparkSession, path: str, source: int | None = None) -> DataFrame:
    """Tab-split line parse (P6): `value` -> (source, target, ppr)."""
    df = spark.read.text(path)  # partition column `source` is recovered
    if source is not None:
        df = df.where(F.col("source") == int(source))
    parts = F.split(F.col("value"), "\t")
    return df.select(
        F.col("source").cast("long").alias("source"),
        parts.getItem(0).cast("long").alias("target"),
        parts.getItem(1).cast("double").alias("ppr"),
    )
