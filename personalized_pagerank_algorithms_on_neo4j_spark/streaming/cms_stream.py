"""Streaming frequency-sketch store (foreachBatch + per-epoch CMS cells).

The streaming twin of the oracle-gated `heavy_hitter_users` batch query:
each microbatch folds to its own d x w Count-Min cell partials and lands
in the store as the `epoch=<epoch_id>` partition via dynamic partition
overwrite (the repo's replay-idempotent store shape).  CMS cells merge by
SUM, so — unlike the HLL store, whose MAX fold is idempotent by algebra —
the per-epoch partition discipline is the load-bearing replay guarantee
here: a replayed epoch overwrites ITS OWN recomputed partition instead of
re-adding counts.

Read path: fold all epoch partitions with ONE sum-merge (state is at most
d x w cells regardless of stream length) and probe a caller-provided
candidate item set through the SAME `functions.sketches.cms_probe` the
batch operator uses — streaming and batch cannot drift because they share
the probe.  The candidate set is the caller's knob by design (the batch
operator documents the same petabyte-scale advice: probe a pre-filtered
candidate set, the sketch build is unchanged).

Scale shape: per batch, one narrow d-pair projection + one
map-side-combined aggregate down to <= d*w rows; the store grows by at
most d*w rows per epoch and `compact_store` folds history to one
partition.  Nothing anywhere is proportional to distinct values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import cms_probe, cms_sketch


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    value_col: str = "user_id",
    d: int = 4,
    w: int = 2048,
):
    """The foreachBatch handler, exposed so tests can drive an epoch (and
    replay it) directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        cells = cms_sketch(batch_df, value_col, d, w).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        )
        if cells.isEmpty():
            return
        (
            cells.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )

    return merge_batch


def start_streaming_heavy_hitters(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    value_col: str = "user_id",
    d: int = 4,
    w: int = 2048,
    query_name: str = "events_heavy_hitters",
):
    """Start the frequency-sketch stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(spark, store_path, value_col=value_col, d=d, w=w)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_heavy_hitters(
    spark: SparkSession,
    store_path: str,
    items: DataFrame,
    threshold: int,
    value_col: str = "user_id",
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(value_col, est_count >= threshold): sum-fold every epoch's cells
    and probe the candidate ``items`` — equals the batch
    `cms_heavy_hitters` over the union of all streamed rows when probed
    with the same item set, exactly (identical cells, shared probe)."""
    from ._store import recover_store

    recover_store(store_path)
    sketch = (
        spark.read.schema("_r int, _bucket bigint, _n bigint, epoch bigint")
        .parquet(store_path)
        .groupBy("_r", "_bucket")
        .agg(F.sum("_n").alias("_n"))
    )
    return cms_probe(sketch, items, value_col, threshold, d, w)


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold every epoch partition EXCEPT the newest into one merged
    `epoch=-1` partition (SUM over cells) via the shared crash-safe
    `_store.compact_epochs` protocol; run while the stream is stopped.
    Returns how many partitions were folded."""
    from ._store import compact_epochs

    return compact_epochs(
        spark,
        store_path,
        "_r int, _bucket bigint, _n bigint, epoch bigint",
        lambda df: df.groupBy("_r", "_bucket").agg(F.sum("_n").alias("_n")),
    )
