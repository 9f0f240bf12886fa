"""Streaming uniform-sample store #12 (foreachBatch + per-epoch k-minimum
-values partials).

The streaming twin of `functions.sampling.exact_k_sample` applied to
the DISTINCT (stratum, id) pairs of the stream: the k ids with the
SMALLEST portable hashes form a uniform k-subset, and k-minimum-values
COMPOSE — the global k smallest over per-epoch k-smallest partials
equals the k smallest over the union — so each microbatch dedupes its
ids, folds to at most k rows per stratum, and lands as its own
`epoch=<id>` partition (the repo's replay-idempotent store shape: a
replayed epoch recomputes the identical partial from the same offsets
and overwrites ITS OWN partition).  Unlike the classic reservoir
(Vitter's Algorithm R, whose RNG state is sequential, replay-hostile,
AND duplicate-sensitive), the hash-rank reservoir is a pure function of
the DISTINCT id set — replay and re-delivery cannot skew the sample.
Ids are carried as strings (the hash's own casting), so any id type
works.  Every partial row records the EFFECTIVE k it survived (write-
time k, lowered by any smaller-k compaction); reads and compactions
REFUSE a larger k (ids ranked past the effective k were discarded —
serving them would be a silent non-uniform over-sample).  This is the
store's first on-disk schema (introduced round 9); no earlier format
ever shipped, so unlike topk_stream there is no legacy migration path
to carry.

The same store doubles as a DISTINCT-COUNT sketch: the k-th smallest
hash of a stratum estimates its cardinality ((k-1) * 2^48 / h_k, the KMV
estimator of Bar-Yossef et al. 2002) — `read_kmv_distinct` serves that
board from the identical partials.

Scale shape: per batch one narrow projection + one per-stratum window
top-k (parallel across strata); the store grows by <= k rows per stratum
per epoch and `compact_store` folds history through the shared
crash-safe `_store.compact_epochs` protocol."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash

_HASH_SPACE = float(1 << 48)


def _k_smallest(df: DataFrame, k: int, group_col: str, id_col: str) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(F.asc("_h"), F.asc(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    k: int = 16,
    seed: int = 0,
    group_col: str = "event_type",
    id_col: str = "event_id",
):
    """The foreachBatch handler, exposed so tests can drive an epoch (and
    replay it) directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        part = _k_smallest(
            batch_df.select(
                group_col,
                F.col(id_col).cast("string").alias("id"),
                portable_hash(F.col(id_col), seed).alias("_h"),
            ).distinct(),  # duplicate ids must not occupy partial slots
            k,
            group_col,
            "id",
        ).withColumn("k", F.lit(int(k)).cast("int")).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        )
        if part.isEmpty():
            return
        (
            part.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )

    return merge_batch


def start_streaming_sample(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    k: int = 16,
    seed: int = 0,
    group_col: str = "event_type",
    id_col: str = "event_id",
    query_name: str = "events_sample",
):
    """Start the sample stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(
        spark, store_path, k=k, seed=seed, group_col=group_col, id_col=id_col
    )
    return (
        events.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def _load_checked(
    spark: SparkSession, store_path: str, k: int, group_col: str, verb: str
) -> DataFrame:
    """Read the store and enforce the k contract in ONE place: refuse any
    requested k above the smallest effective k recorded in the store.
    The guard is one aggregate over the single `k` column (a columnar
    footer-cheap scan) before the fold scan."""
    from ._store import recover_store

    recover_store(store_path)
    rows = spark.read.schema(
        f"{group_col} string, id string, _h bigint, k int, epoch bigint"
    ).parquet(store_path)
    k_min_row = rows.agg(F.min("k")).collect()[0][0]
    if k_min_row is not None and k > int(k_min_row):
        raise ValueError(
            f"{verb} k={k} exceeds the store's effective k={int(k_min_row)}: "
            "ids past that rank were discarded"
        )
    return rows


def _read_folded(
    spark: SparkSession, store_path: str, k: int, group_col: str
) -> DataFrame:
    rows = _load_checked(spark, store_path, k, group_col, "read")
    # same id in several epochs -> identical (group, id, _h) row; collapse
    # before the fold so a long-running stream cannot seat a duplicate
    return _k_smallest(
        rows.select(group_col, "id", "_h").distinct(), k, group_col, "id"
    )


def read_sample(
    spark: SparkSession,
    store_path: str,
    k: int = 16,
    group_col: str = "event_type",
) -> DataFrame:
    """(group_col, id): the per-stratum uniform k-sample over EVERYTHING
    streamed so far — equals the batch `exact_k_sample` over the DISTINCT
    (group, id) pairs of the union, exactly (same hashes, same (h, id)
    order; ids compare as strings in both)."""
    return _read_folded(spark, store_path, k, group_col).select(group_col, "id")


def read_kmv_distinct(
    spark: SparkSession,
    store_path: str,
    k: int = 16,
    group_col: str = "event_type",
) -> DataFrame:
    """(group_col, n_seen, approx_distinct_kmv): the Bar-Yossef KMV
    cardinality estimate from the k-th smallest hash; strata holding
    fewer than k ids report their EXACT count (the sample IS the
    population there)."""
    folded = _read_folded(spark, store_path, k, group_col)
    per = folded.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_seen"),
        F.max("_h").alias("_hk"),
    )
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(
        F.lit((k - 1) * _HASH_SPACE) / F.col("_hk").cast("double")
    )
    return per.select(
        group_col, "n_seen", F.round(est, 4).alias("approx_distinct_kmv")
    )


def compact_store(
    spark: SparkSession,
    store_path: str,
    k: int = 16,
    group_col: str = "event_type",
) -> int:
    """Fold every epoch partition EXCEPT the newest into one merged
    `epoch=-1` partition (k smallest per stratum) via the shared
    crash-safe `_store.compact_epochs` protocol; run while the stream is
    stopped.  Returns how many partitions were folded."""
    from ._store import compact_epochs

    _load_checked(spark, store_path, k, group_col, "compact")

    def fold(df: DataFrame) -> DataFrame:
        # dedupe WITHOUT the k column (the same id written under two
        # different write-time ks must not occupy two top-k slots), then
        # stamp the folded rows with the EFFECTIVE k — the smaller of the
        # fold k and what the rows already survived — so a smaller-k
        # compaction tightens the read-time refusal instead of being
        # silently forgotten (r9 review findings #1/#2)
        k_eff = F.least(F.min("k"), F.lit(int(k))).cast("int")
        folded = _k_smallest(
            df.groupBy(group_col, "id", "_h").agg(k_eff.alias("k")),
            k,
            group_col,
            "id",
        )
        return folded.withColumn(
            "k", F.least(F.col("k"), F.lit(int(k))).cast("int")
        )

    return compact_epochs(
        spark,
        store_path,
        f"{group_col} string, id string, _h bigint, k int, epoch bigint",
        fold,
    )
