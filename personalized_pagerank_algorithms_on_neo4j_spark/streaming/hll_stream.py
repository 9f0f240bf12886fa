"""Streaming distinct-count store (foreachBatch + per-epoch HLL registers).

The streaming twin of the oracle-gated `approx_distinct_users` batch query:
each microbatch folds to its own per-(group, bucket) MAX-rho registers and
lands in the store as the `epoch=<epoch_id>` partition via dynamic
partition overwrite (the repo's replay-idempotent store shape —
anomaly_stream/topk_stream/minhash_stream/temporal_stream).  foreachBatch
is at-least-once: a replayed epoch recomputes identical registers from the
same offsets and overwrites ITS OWN partition.  HLL registers are doubly
replay-safe — the read-side fold is MAX, which is idempotent even across
epochs, so duplicate rows could never inflate the estimate the way
duplicate counts would; the per-epoch partition discipline is kept anyway
so this store composes with the shared compaction/recovery machinery and
its guarantees hold without sketch-specific reasoning.

Read path: fold all epoch partitions with ONE max-merge (state is at most
m = 2^p register rows per group regardless of stream length) and apply the
SAME `functions.sketches.hll_estimate` the batch operator uses — streaming
and batch cannot drift because they share the estimator.

Scale shape: per batch, one narrow projection + one map-side-combined
aggregate down to <= m rows per touched group; the store grows by at most
(groups x m) rows per epoch and `compact_store` folds history to one
partition.  Nothing in the pipeline is proportional to distinct values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import hll_estimate, hll_register_rows


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    value_col: str = "user_id",
    group_col: str = "event_type",
    p: int = 12,
):
    """The foreachBatch handler, exposed so tests can drive an epoch (and
    replay it) directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        regs = (
            hll_register_rows(batch_df, value_col, [group_col], p)
            .groupBy(group_col, "_bucket")
            .agg(F.max("_rho").alias("_reg"))
            .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
        )
        if regs.isEmpty():
            return
        (
            regs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )

    return merge_batch


def start_streaming_distinct(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    value_col: str = "user_id",
    group_col: str = "event_type",
    p: int = 12,
    query_name: str = "events_distinct",
):
    """Start the distinct-count stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(
        spark, store_path, value_col=value_col, group_col=group_col, p=p
    )
    return (
        events.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_distinct_board(
    spark: SparkSession,
    store_path: str,
    group_col: str = "event_type",
    p: int = 12,
) -> DataFrame:
    """(group_col, approx_distinct): fold every epoch's registers with one
    MAX-merge and estimate — equals the batch `hll_distinct` over the
    union of all streamed rows, exactly (identical registers, shared
    estimator)."""
    from ._store import recover_store

    recover_store(store_path)
    regs = (
        spark.read.schema(f"{group_col} string, _bucket bigint, _reg int, epoch bigint")
        .parquet(store_path)
        .groupBy(group_col, "_bucket")
        .agg(F.max("_reg").alias("_reg"))
    )
    return hll_estimate(regs, [group_col], p)


def compact_store(
    spark: SparkSession, store_path: str, group_col: str = "event_type"
) -> int:
    """Fold every epoch partition EXCEPT the newest into one merged
    `epoch=-1` partition (MAX over registers) via the shared crash-safe
    `_store.compact_epochs` protocol; run while the stream is stopped.
    Returns how many partitions were folded."""
    from ._store import compact_epochs

    return compact_epochs(
        spark,
        store_path,
        f"{group_col} string, _bucket bigint, _reg int, epoch bigint",
        lambda df: df.groupBy(group_col, "_bucket").agg(
            F.max("_reg").alias("_reg")
        ),
    )
