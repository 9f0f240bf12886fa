"""Streaming incremental near-dup detection (foreachBatch + signature store).

The near-dup companion to `dedup_stream`'s exact digests: each microbatch
of documents is MinHash-banded (`functions.dedup.minhash_banded` — the
same banding scheme as the batch operators, so streaming and batch cannot
drift), checked against the historical signature store, and its band rows
appended so later batches see them.

Replay safety (the store discipline shared with `anomaly_stream` /
`topk_stream`): band rows land in a per-epoch partition via dynamic
partition overwrite — a replayed epoch rewrites its own partition with
identical recomputed rows. Matching reads ONLY strictly earlier epochs
(so a replay of any epoch — not just the latest — matches exactly the
same history as its original run) and adds in-batch pairs separately;
the flagged-pairs board is itself per-epoch partitioned, so the replay
rewrites its own flags instead of appending duplicates.

Scale shape: the store grows one row per (doc, band); at corpus scale it
is written bucketed by (band, bucket) so the microbatch side is the only
shuffle in the candidate join. The hot-bucket discipline
(`dedup._drop_hot_buckets` — checkpoint + logged drop) applies to BOTH
sides: the history is unbounded, and a boilerplate flood can make a
single microbatch's own bucket quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import MINHASH_BUCKET_CAP, minhash_banded


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    flags_path: str,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = MINHASH_BUCKET_CAP,
):
    """The foreachBatch handler, exposed so tests can drive (and replay)
    an epoch directly without a running stream."""

    store_schema = "doc_id bigint, band int, bucket string, epoch bigint"

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        banded = minhash_banded(
            batch_df, num_hashes, bands, n, text_col, id_col
        ).localCheckpoint(eager=True)  # store write + two match sides read it
        if banded.isEmpty():
            return
        (
            banded.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )
        # history = strictly EARLIER epochs only: a replay of ANY epoch
        # (not just the latest) therefore matches the identical history as
        # its original run — `!=` would let a replayed middle epoch see
        # future epochs' rows and rewrite its flags partition differently
        hist = (
            spark.read.schema(store_schema)
            .parquet(store_path)
            .where(F.col("epoch") < int(epoch_id))
            .select("doc_id", "band", "bucket")
        )
        from ..functions.dedup import _drop_hot_buckets

        if max_bucket_size is not None:
            # the shared cap discipline (checkpoint + logged drop) on BOTH
            # sides: the history is unbounded, and a boilerplate flood can
            # make a single microbatch's own bucket quadratic too
            hist = _drop_hot_buckets(
                hist, max_bucket_size, "minhash_stream:history"
            )
            matchable = _drop_hot_buckets(
                banded, max_bucket_size, "minhash_stream:batch"
            )
        else:
            matchable = banded
        nb = matchable.select(F.col("doc_id").alias("new_id"), "band", "bucket")
        against_hist = (
            nb.join(
                hist.select(F.col("doc_id").alias("old_id"), "band", "bucket"),
                ["band", "bucket"],
            ).select("new_id", "old_id")
        )
        in_batch = (
            nb.join(
                matchable.select(
                    F.col("doc_id").alias("old_id"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .where(F.col("old_id") < F.col("new_id"))
            .select("new_id", "old_id")
        )
        (
            against_hist.unionByName(in_batch)
            .distinct()
            .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(flags_path)
        )

    return merge_batch


def start_streaming_minhash_dedup(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    flags_path: str,
    query_name: str = "minhash_dedup",
    **kwargs,
):
    """Start the incremental near-dup stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(spark, store_path, flags_path, **kwargs)
    return (
        docs.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_flags(spark: SparkSession, flags_path: str) -> DataFrame:
    return (
        spark.read.schema("new_id bigint, old_id bigint, epoch bigint")
        .parquet(flags_path)
    )
