"""Streaming SemDeDup store (#16): incremental embedding near-dedup.

The semantic companion to `minhash_stream`'s shingle LSH: each microbatch
of (vec_id, embedding) rows is assigned to FIXED trained centroids
(`clustering._assign` — the same deterministic nearest-centroid rule as
the batch `semantic_dedup_pairs`), exact-cosine-verified against the
accumulated members of its cluster, and appended so later batches see it.

Centroid discipline: the centroids are trained OFFLINE on a bootstrap
corpus (`clustering.kmeans_fit`) and held fixed while the stream runs —
online Lloyd updates would re-assign historical vectors and silently
invalidate earlier verdicts.  Retraining is a stop-the-stream operation
(like compaction): refit, re-assign the whole store, resume.  With the
batch operator's own centroids, stream flags == batch pairs exactly
(`_dot` widens float elements to double, so the `array<double>` store
column is bit-exact against the parquet floats).

Replay safety (the #14/#15 store discipline): member rows land in a
per-epoch partition via dynamic partition overwrite; a re-delivered
vec_id is dropped by an anti-join against STRICTLY EARLIER epochs
(first delivery wins, so a replay of any epoch recomputes the identical
rows); matching reads only strictly earlier epochs plus in-batch pairs,
and the flags board is itself per-epoch partitioned.  Compaction folds
all-but-newest member partitions into epoch=-1 (`_store.compact_epochs`
— crash-safe build-aside + swap); first-seen dedup keeps winning after
compaction because -1 is strictly earlier than every replayable epoch.

Scale shape: the store grows one row per vector; the per-batch join is
bounded by batch x cluster-cohort, and the cluster cap (the batch
operator's `max_cluster_size` discipline) applies to BOTH sides — an
accumulated hot cluster is excluded from matching (logged), exactly like
`minhash_stream`'s hot-bucket cap, rather than allowed to go quadratic.
At corpus scale, partition the store by cluster so the history side of
the match is partition-pruned to the batch's clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.clustering import _assign
from ..functions.dedup import _dot

STORE_SCHEMA = (
    "vec_id bigint, cluster int, embedding array<double>, epoch bigint"
)
FLAGS_SCHEMA = "new_id bigint, old_id bigint, cosine double, epoch bigint"


def _drop_hot_clusters(df: DataFrame, cap: int, label: str) -> DataFrame:
    """Exclude clusters with more than ``cap`` members from matching —
    the `semantic_dedup_pairs` max_cluster_size discipline on a frame,
    with the no-silent-caps logging of `dedup._drop_hot_buckets`.
    Materializes (the size probe and the match side both read it)."""
    sized = df.localCheckpoint(eager=True)
    hot = (
        sized.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") > cap)
        .localCheckpoint(eager=True)
    )
    dropped = hot.agg(F.count(F.lit(1)), F.sum("_sz")).first()
    if dropped[0]:
        import logging

        logging.getLogger(__name__).warning(
            "%s: excluded %d hot clusters covering %d vectors from "
            "matching (cluster size > %d); refit with a larger k to "
            "cover them",
            label, dropped[0], dropped[1], cap,
        )
    return sized.join(
        F.broadcast(hot.select("cluster")), "cluster", "left_anti"
    )


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    flags_path: str,
    centroids: list[list[float]],
    threshold: float = 0.8,
    max_cluster_size: int = 100_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """The foreachBatch handler, exposed so tests can drive (and replay)
    an epoch directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        import os

        have_store = os.path.exists(store_path)
        arriving = (
            _assign(
                batch_df.select(id_col, vec_col), centroids, vec_col, id_col
            )
            .join(
                batch_df.select(
                    F.col(id_col),
                    F.transform(vec_col, lambda x: x.cast("double")).alias(
                        "embedding"
                    ),
                ),
                id_col,
            )
            .select(F.col(id_col).alias("vec_id"), "cluster", "embedding")
        )
        if have_store:
            hist = (
                spark.read.schema(STORE_SCHEMA)
                .parquet(store_path)
                .where(F.col("epoch") < int(epoch_id))
            )
            # first delivery wins: a vec_id already stored by a strictly
            # earlier epoch is a re-delivery — drop it (replaying THIS
            # epoch recomputes identical rows because its own partition is
            # not part of the history read)
            arriving = arriving.join(
                hist.select("vec_id"), "vec_id", "left_anti"
            )
        arriving = arriving.localCheckpoint(eager=True)
        if arriving.isEmpty():
            return
        (
            arriving.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )
        # cluster-cap discipline on BOTH sides (the accumulated history
        # is unbounded; a batch can also be a flood by itself)
        matchable = _drop_hot_clusters(
            arriving, max_cluster_size, "semdedup_stream:batch"
        )
        if have_store:
            hist_m = _drop_hot_clusters(
                hist.select("vec_id", "cluster", "embedding"),
                max_cluster_size,
                "semdedup_stream:history",
            )
        else:
            hist_m = None
        nb = matchable.select(
            "cluster",
            F.col("vec_id").alias("new_id"),
            F.col("embedding").alias("vn"),
        )
        cos = _dot(F.col("vn"), F.col("vo")) / (
            F.sqrt(_dot(F.col("vn"), F.col("vn")))
            * F.sqrt(_dot(F.col("vo"), F.col("vo")))
        )
        parts = []
        if hist_m is not None:
            parts.append(
                nb.join(
                    hist_m.select(
                        "cluster",
                        F.col("vec_id").alias("old_id"),
                        F.col("embedding").alias("vo"),
                    ),
                    "cluster",
                )
            )
        parts.append(
            nb.join(
                matchable.select(
                    "cluster",
                    F.col("vec_id").alias("old_id"),
                    F.col("embedding").alias("vo"),
                ),
                "cluster",
            ).where(F.col("old_id") < F.col("new_id"))
        )
        flags = None
        for p in parts:
            scored = p.select(
                "new_id", "old_id", F.round(cos, 6).alias("cosine")
            ).where(F.col("cosine") >= threshold)
            flags = scored if flags is None else flags.unionByName(scored)
        (
            flags.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(flags_path)
        )

    return merge_batch


def start_streaming_semdedup(
    spark: SparkSession,
    vecs: DataFrame,
    store_path: str,
    flags_path: str,
    centroids: list[list[float]],
    query_name: str = "semdedup",
    **kwargs,
):
    """Start the incremental semantic-dedup stream; returns the
    StreamingQuery."""
    merge_batch = make_merge_batch(
        spark, store_path, flags_path, centroids, **kwargs
    )
    return (
        vecs.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_flags(spark: SparkSession, flags_path: str) -> DataFrame:
    import os

    if not os.path.exists(flags_path):
        # a store whose every epoch found zero pairs never creates the
        # flags directory — that is an empty board, not an error
        return spark.createDataFrame([], FLAGS_SCHEMA)
    return spark.read.schema(FLAGS_SCHEMA).parquet(flags_path)


def read_survivors(spark: SparkSession, flags_path: str, store_path: str) -> DataFrame:
    """(vec_id, keep): first-arrival survivor election over the flags —
    a vector is dropped iff it was flagged as the LATER side of any pair
    (cross-epoch: the arriving vector is always new_id; in-batch: the
    higher id).  Stable under replay because both boards are per-epoch
    idempotent."""
    from ._store import recover_store

    recover_store(store_path)
    recover_store(flags_path)
    members = (
        spark.read.schema(STORE_SCHEMA).parquet(store_path).select("vec_id")
    )
    dropped = (
        read_flags(spark, flags_path)
        .select(F.col("new_id").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return members.join(dropped, "vec_id", "left").select(
        "vec_id", F.col("_dup").isNull().alias("keep")
    )


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold all-but-newest member partitions into epoch=-1 (stop the
    stream first).  Member rows are unique per vec_id by the first-seen
    anti-join, so the fold is a plain epoch-column drop with a defensive
    first-epoch-wins dedup."""
    from pyspark.sql import Window

    from ._store import compact_epochs

    def fold(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("vec_id").orderBy("epoch")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("vec_id", "cluster", "embedding")
        )

    return compact_epochs(spark, store_path, STORE_SCHEMA, fold)
