"""Streaming hourly anomaly detection (foreachBatch + dirty-bucket store).

Same continuous-rollup shape as `topk_stream`: each microbatch's events
aggregate to per-hour partial counts (map-side combine — only touched
hours move), merge into an hour-partitioned counts store via dynamic
partition overwrite, and the z-score board re-derives from the rollup with
the SAME `functions.monitoring.hourly_anomaly_scores` used by the
oracle-gated `events_anomaly` batch query — streaming and batch cannot
drift because they share the implementation.

The board is rewritten wholesale per batch: the rollup is one row per
HOUR, so the z recompute is a tiny ordered-window job (a dirty hour
changes the z of the following `trailing` hours anyway, so an
incremental board would rewrite most of a day per update regardless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.monitoring import hourly_anomaly_scores


def _hourly_counts(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket"
        )
    ).agg(F.count(F.lit(1)).alias("n"))


def start_streaming_anomaly(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    board_path: str,
    trailing: int = 24,
    min_prev: int = 12,
    query_name: str = "events_anomaly",
):
    """Start the anomaly stream; returns the StreamingQuery."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_hourly = _hourly_counts(batch_df)
        dirty = batch_hourly.select("bucket").distinct().localCheckpoint(eager=True)
        if dirty.isEmpty():
            return
        try:
            # explicit schema: partition-column inference would parse the
            # bucket directory string back into a timestamp
            prior = (
                spark.read.schema(batch_hourly.schema)
                .parquet(store_path)
                .join(dirty, "bucket")
            )
        except Exception:  # first batch: store does not exist yet
            prior = None
        merged = batch_hourly if prior is None else (
            prior.unionByName(batch_hourly)
            .groupBy("bucket")
            .agg(F.sum("n").alias("n"))
        )
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(store_path)
        )
        full = spark.read.schema(merged.schema).parquet(store_path)
        (
            hourly_anomaly_scores(
                full, trailing=trailing, min_prev=min_prev, bucket_col="bucket"
            )
            .write.mode("overwrite")
            .parquet(board_path)
        )

    return (
        events.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_anomalies(spark: SparkSession, board_path: str) -> DataFrame:
    return spark.read.parquet(board_path).orderBy("bucket")
