"""Streaming windowed top-k leaderboard (foreachBatch + partition overwrite).

Structured Streaming cannot rank inside a streaming aggregation (no window
functions over streaming state), so the leaderboard is maintained the same
way `ppr_refresh.start_incremental_prep_refresh` maintains the prep store:

1. each microbatch is aggregated to per-(time-bucket, key) partial sums
   (map-side combine — the only state that ever moves is k' <= distinct keys
   touched this batch),
2. the partials are merged into a persistent totals store partitioned by
   time bucket — dynamic partition overwrite rewrites ONLY the dirty
   buckets, never the whole history,
3. the k-row leaderboard is re-ranked for the dirty buckets alone and
   upserted into the board table the same way.

At 100 TB this is the standard continuous-rollup shape: the totals store is
the compact rollup (partition-pruned on read), the board is k rows per
bucket, and a late event only ever touches its own bucket's partitions.
Replay safety (foreachBatch is at-least-once): the store holds PER-EPOCH
partials under `bucket=X/epoch=N` — a replayed epoch rewrites its own
(bucket, epoch) partitions with identical recomputed partials instead of
re-adding onto a merged total, the same idempotence design as
`anomaly_stream`. The board re-aggregates the dirty buckets across their
epochs at write time; per-bucket epoch counts are bounded by the batches
that touched the bucket (old buckets stop accruing), and a long-lived
store can fold cold buckets' epochs the same way
`anomaly_stream.compact_store` does. A store written by the pre-epoch
layout must be upgraded ONCE with `migrate_legacy_store` before
restarting the stream (mixed partition depths are invalid to Spark).

Batch twin for the correctness gate: `events_topk_hourly` in
`__spark_entry__.py` (same bucket/cents/rank rules, DuckDB-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _bucketed_totals(df: DataFrame, bucket: str, key_col: str, value_col: str) -> DataFrame:
    """Per-(bucket, key) event count + integer-cents sum (exact merge-able)."""
    return df.groupBy(
        F.date_format(F.window("ts", bucket).start, "yyyy-MM-dd HH:mm:ss").alias(
            "bucket"
        ),
        F.col(key_col).alias("key"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.coalesce(F.col(value_col), F.lit(0.0)) * 100).cast("long")
        ).alias("cents"),
    )


def rank_topk(totals: DataFrame, k: int) -> DataFrame:
    """Per-bucket top-k keys by cents (RANK: ties kept, may exceed k). The
    window is partitioned by bucket — parallel across buckets, never a
    single-partition global sort."""
    w = Window.partitionBy("bucket").orderBy(F.desc("cents"), F.asc("key"))
    return (
        totals.withColumn("rank", F.rank().over(w))
        .where(F.col("rank") <= k)
        .select(
            "bucket",
            "key",
            "n",
            (F.col("cents") / F.lit(100.0)).alias("total"),
            "rank",
        )
    )


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    board_path: str,
    k: int = 10,
    bucket: str = "1 hour",
    key_col: str = "user_id",
    value_col: str = "value",
):
    """The foreachBatch handler, exposed so tests can drive an epoch (and
    replay it) directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        # a crash inside migrate_legacy_store's swap window can leave the
        # store missing with a _premigrate backup beside it; restore it
        # BEFORE writing, or this batch would re-seed the store from one
        # epoch and the board re-rank below would drop all history
        if recover_store(store_path) == "_premigrate":
            # the restored backup is in the LEGACY bucket-only layout —
            # writing epoch partitions into it would create a mixed-depth
            # directory tree Spark refuses to read (and that a later
            # migrate_legacy_store would mistake for already-migrated).
            # Re-run the interrupted migration first; no-op if the backup
            # was already epoch-layout.
            migrate_legacy_store(spark, store_path)
        batch_totals = _bucketed_totals(batch_df, bucket, key_col, value_col)
        dirty = batch_totals.select("bucket").distinct().localCheckpoint(eager=True)
        if dirty.isEmpty():
            return
        store_schema = batch_totals.withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        ).schema
        # per-epoch partials: a replayed epoch (same id, same offsets)
        # rewrites its own (bucket, epoch) partitions with identical
        # recomputed rows — idempotent, where the previous
        # read-merge-overwrite design re-added the replayed batch onto
        # the already-merged totals
        (
            batch_totals.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "epoch")
            .parquet(store_path)
        )
        # board: re-rank the dirty buckets from ALL their epochs. The
        # store exists by construction here (just written), so a read
        # failure is a genuine error and propagates — there is no
        # missing-path case left to swallow.
        totals = (
            spark.read.schema(store_schema)
            .parquet(store_path)
            .join(dirty, "bucket")
            .groupBy("bucket", "key")
            .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        )
        (
            rank_topk(totals, k)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(board_path)
        )

    return merge_batch


def start_streaming_topk(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    board_path: str,
    k: int = 10,
    bucket: str = "1 hour",
    key_col: str = "user_id",
    value_col: str = "value",
    query_name: str = "events_topk",
):
    """Start the leaderboard stream; returns the StreamingQuery.

    `store_path` holds the per-(bucket, key, epoch) partials, `board_path`
    the k-row-per-bucket leaderboard — refreshed with dynamic partition
    overwrite (dirty buckets only)."""
    merge_batch = make_merge_batch(
        spark, store_path, board_path, k=k, bucket=bucket,
        key_col=key_col, value_col=value_col,
    )
    return (
        events.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option(
            "checkpointLocation", store_path.rstrip("/") + "_ckpt"
        )
        .start()
    )


def migrate_legacy_store(spark: SparkSession, store_path: str) -> bool:
    """One-time migration of a pre-epoch totals store (bucket= partitions
    holding merged totals) into the per-epoch layout: the legacy totals
    become the epoch=-1 baseline partition under each bucket. Run while
    the stream is stopped. Returns False if the store is already in the
    epoch layout (no-op). Mixing layouts is never valid — Spark refuses
    conflicting partition-directory depths — hence the whole-directory
    swap. A crash between the swap's two renames leaves no directory at
    the store path (only the `_premigrate` backup); this function and
    `merge_batch` both call `_store.recover_store` first, which restores
    the backup, so the migration can simply be rerun."""
    import glob as _glob
    import os
    import shutil

    from ._store import recover_store

    recover_store(store_path)
    buckets = _glob.glob(os.path.join(store_path, "bucket=*"))
    if not buckets or _glob.glob(os.path.join(store_path, "bucket=*", "epoch=*")):
        return False
    legacy = spark.read.parquet(store_path)
    from pyspark.sql.types import StringType

    if not isinstance(legacy.schema["bucket"].dataType, StringType):
        # partition-column type inference parses the bucket directory as a
        # timestamp; format it back so the rewritten directories match
        legacy = legacy.withColumn(
            "bucket", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss")
        )
    legacy = legacy.withColumn("epoch", F.lit(-1).cast("long"))
    tmp = store_path.rstrip("/") + "_migrating"
    shutil.rmtree(tmp, ignore_errors=True)
    legacy.write.partitionBy("bucket", "epoch").parquet(tmp)
    bak = store_path.rstrip("/") + "_premigrate"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(store_path, bak)
    os.rename(tmp, store_path)
    shutil.rmtree(bak)
    return True


def read_leaderboard(spark: SparkSession, board_path: str, bucket: str | None = None) -> DataFrame:
    """Read the board; a bucket filter partition-prunes to one directory."""
    from pyspark.sql.types import StringType

    df = spark.read.parquet(board_path)
    if not isinstance(df.schema["bucket"].dataType, StringType):
        # partition-column type inference parses the bucket directory string
        # as a timestamp; format it back (same session timezone round-trip)
        df = df.withColumn("bucket", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss"))
    if bucket is not None:
        df = df.where(F.col("bucket") == bucket)
    return df.orderBy("bucket", "rank", "key")
