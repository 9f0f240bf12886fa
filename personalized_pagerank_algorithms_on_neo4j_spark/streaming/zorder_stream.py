"""Streaming Z-order skipping manifest (store #11).

The streaming twin of the oracle-gated `zorder_manifest` batch query: as
rows arrive, each microbatch is Morton-mapped against FIXED declared key
bounds (a data-derived domain would silently re-scale old shards as new
extremes arrive — the reason `zorder_layout` grew the ``bounds``
parameter) and folded to its own per-shard (n, min/max a, min/max b)
partial manifest, landing as the `epoch=<epoch_id>` partition via
dynamic partition overwrite — the repo's replay-idempotent store shape.

Replay discipline: `n_rows` merges by SUM, so the per-epoch partition
layout is the LOAD-BEARING replay guarantee (a replayed epoch rewrites
its own partition; a read-merge-overwrite store would double-count —
the CMS store's lesson).  The min/max columns are idempotent by algebra
as well, but the store keeps one discipline for all columns.

Read path: ONE fold over all epoch partitions (SUM counts, MIN/MAX
ranges) — equals the batch `zorder_manifest(zorder_layout(union,
bounds=...))` exactly, because per-shard counts are additive over any
row partition and ranges are associative.  State is at most
``n_shards`` rows per epoch regardless of stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sharding import ZORDER_BITS, zorder_layout, zorder_manifest

_SCHEMA = (
    "shard bigint, n_rows bigint, a_min bigint, a_max bigint,"
    " b_min bigint, b_max bigint, epoch bigint"
)


def _fold(df: DataFrame) -> DataFrame:
    return df.groupBy("shard").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.min("a_min").alias("a_min"),
        F.max("a_max").alias("a_max"),
        F.min("b_min").alias("b_min"),
        F.max("b_max").alias("b_max"),
    )


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    a_col: str,
    b_col: str,
    id_col: str,
    bounds: tuple[int, int, int, int],
    n_shards: int = 64,
    bits: int = ZORDER_BITS,
):
    """The foreachBatch handler, exposed so tests can drive (and replay)
    an epoch directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        part = zorder_manifest(
            zorder_layout(
                batch_df,
                a_col=a_col,
                b_col=b_col,
                id_col=id_col,
                n_shards=n_shards,
                bits=bits,
                bounds=bounds,
            )
        ).withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
        if part.isEmpty():
            return
        (
            part.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )

    return merge_batch


def start_zorder_manifest_stream(
    spark: SparkSession,
    rows: DataFrame,
    store_path: str,
    a_col: str,
    b_col: str,
    id_col: str,
    bounds: tuple[int, int, int, int],
    n_shards: int = 64,
    bits: int = ZORDER_BITS,
    query_name: str = "zorder_manifest",
):
    """Start the manifest stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(
        spark, store_path, a_col, b_col, id_col, bounds, n_shards, bits
    )
    return (
        rows.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_manifest(spark: SparkSession, store_path: str) -> DataFrame:
    """(shard, n_rows, a_min, a_max, b_min, b_max): fold every epoch's
    partial manifest — equals the batch manifest over the union of all
    streamed rows at the same fixed bounds."""
    from ._store import recover_store

    recover_store(store_path)
    return _fold(spark.read.schema(_SCHEMA).parquet(store_path))


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold every epoch partition EXCEPT the newest into one merged
    `epoch=-1` partition via the shared crash-safe `_store.compact_epochs`
    protocol; run while the stream is stopped."""
    from ._store import compact_epochs

    return compact_epochs(spark, store_path, _SCHEMA, _fold)
