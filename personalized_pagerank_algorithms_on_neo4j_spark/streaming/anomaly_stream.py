"""Streaming hourly anomaly detection (foreachBatch + per-epoch store).

Each microbatch's events aggregate to per-hour partial counts (map-side
combine — only touched hours move) and land in the counts store as the
`epoch=<epoch_id>` partition via dynamic partition overwrite. foreachBatch
is at-least-once: after a restart the last epoch can replay, and Structured
Streaming replays it with the SAME epoch_id over the SAME offsets — so
overwriting that epoch's partition with recomputed identical counts is
idempotent, where the previous read-merge-overwrite design double-counted
the replayed batch. The hourly rollup is re-derived at read time
(`groupBy(bucket).sum(n)` over the per-epoch partials — one tiny extra
aggregate per batch; long-lived streams bound the partition count with
`compact_store`, which folds every epoch but the newest — the only one
that can replay — into a single merged partition via a whole-directory
swap), and the z-score board recomputes from it
with the SAME `functions.monitoring.hourly_anomaly_scores` used by the
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


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    board_path: str,
    trailing: int = 24,
    min_prev: int = 12,
):
    """The foreachBatch handler, exposed so tests can drive an epoch (and
    replay it) directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        # a crash inside compact_store's swap window can leave the store
        # missing with a _precompact backup beside it; restore it BEFORE
        # writing, or this batch would re-seed the store from one epoch
        recover_store(store_path)
        batch_hourly = _hourly_counts(batch_df).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        )
        if batch_hourly.isEmpty():
            return
        # One partition per epoch: a replayed epoch rewrites ITS OWN
        # partition with identical recomputed counts instead of re-adding
        # them onto a merged total. No store read happens on the write
        # path, so there is no missing-path except to swallow — a genuine
        # store read failure below propagates and fails the batch.
        (
            batch_hourly.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )
        # explicit schema: epoch is a directory-derived long; bucket stays
        # a data column so no partition-value parsing can mangle it
        full = (
            spark.read.schema("bucket string, n bigint, epoch bigint")
            .parquet(store_path)
            .groupBy("bucket")
            .agg(F.sum("n").alias("n"))
        )
        (
            hourly_anomaly_scores(
                full, trailing=trailing, min_prev=min_prev, bucket_col="bucket"
            )
            .write.mode("overwrite")
            .parquet(board_path)
        )

    return merge_batch


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
    merge_batch = make_merge_batch(
        spark, store_path, board_path, trailing=trailing, min_prev=min_prev
    )
    return (
        events.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_anomalies(spark: SparkSession, board_path: str) -> DataFrame:
    return spark.read.parquet(board_path).orderBy("bucket")


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold every epoch partition EXCEPT the newest into one merged
    `epoch=-1` partition (SUM over per-hour counts) via the shared
    crash-safe `_store.compact_epochs` protocol; run while the stream is
    stopped. Returns how many partitions were folded."""
    from ._store import compact_epochs

    return compact_epochs(
        spark,
        store_path,
        "bucket string, n bigint, epoch bigint",
        lambda df: df.groupBy("bucket").agg(F.sum("n").alias("n")),
    )
