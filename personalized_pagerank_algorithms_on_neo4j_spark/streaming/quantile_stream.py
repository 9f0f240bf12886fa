"""Streaming quantile store #13 (foreachBatch + per-epoch level-sampling
partials).

The streaming twin of `functions.quantile_sketch`: each microbatch
computes its own deterministic level-sampling partial (sample rows at
the batch's level + one meta row per stratum with the EXACT batch
count) and lands as its own ``epoch=<id>`` partition — the repo's
replay-idempotent store shape (a replayed epoch recomputes the
identical partial from the same offsets and overwrites ITS OWN
partition).  Because the level filters are NESTED and the counts are
ADDITIVE, the read-side `fold_quantile_partials` reproduces the batch
sketch over everything streamed so far EXACTLY — row-for-row, not
approximately (the mergeability proof lives on the functions module).

k contract (the KMV store's discipline): every partial row records the
EFFECTIVE k it was sampled under (write-time k, lowered by any
smaller-k compaction); reads and compactions REFUSE a larger k — rows
past that sampling budget were discarded, so serving a larger-k read
would silently diverge from the batch-k' sketch it claims to equal.

Unlike classic KLL streaming (sequential compactor buffers + a random
parity coin per compaction — replay-hostile), every partial here is a
pure function of the batch's row set: re-delivery and replay cannot
skew the sample.  Scale shape: per batch one narrow projection + one
per-stratum aggregate + one stratum join; the store grows by <= k
sample rows + 1 meta row per stratum per epoch, and `compact_store`
folds history through the shared crash-safe `_store.compact_epochs`
protocol via `refold_partials` (compaction = raise level + re-filter,
deterministic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quantile_sketch import (
    fold_quantile_partials,
    quantile_partials,
    refold_partials,
)

_SCHEMA = (
    "stratum string, v bigint, h bigint, level bigint, n_total bigint, "
    "is_meta boolean, k int, epoch bigint"
)


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    value_col: str,
    key_col: str,
    stratum_col: str,
    k: int = 128,
    seed: int = 7,
):
    """The foreachBatch handler, exposed so tests can drive an epoch (and
    replay it) directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        part = (
            quantile_partials(
                batch_df, value_col, key_col, stratum_col, k=k, seed=seed
            )
            .withColumn("k", F.lit(int(k)).cast("int"))
            .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
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


def start_streaming_quantiles(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    value_col: str,
    key_col: str,
    stratum_col: str,
    k: int = 128,
    seed: int = 7,
    query_name: str = "quantile_store",
):
    """Start the quantile stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(
        spark, store_path, value_col, key_col, stratum_col, k=k, seed=seed
    )
    return (
        events.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def _load_checked(
    spark: SparkSession, store_path: str, k: int, verb: str
) -> DataFrame:
    """Read the store and enforce the k contract in ONE place: refuse any
    requested k above the smallest effective k recorded in the store."""
    from ._store import recover_store

    recover_store(store_path)
    rows = spark.read.schema(_SCHEMA).parquet(store_path)
    k_min_row = rows.agg(F.min("k")).collect()[0][0]
    if k_min_row is not None and k > int(k_min_row):
        raise ValueError(
            f"{verb} k={k} exceeds the store's effective k={int(k_min_row)}: "
            "rows past that sampling budget were discarded"
        )
    return rows


def read_quantiles(
    spark: SparkSession,
    store_path: str,
    probs: list[float],
    k: int = 128,
) -> DataFrame:
    """(stratum, p, est, level, n_sample, n_total): quantile estimates
    over EVERYTHING streamed so far — equals `quantile_sketch` over the
    union of the epochs' rows, exactly (same hashes, same level rule,
    same rank arithmetic)."""
    rows = _load_checked(spark, store_path, k, "read")
    return fold_quantile_partials(rows.drop("k", "epoch"), probs, k=k)


def compact_store(
    spark: SparkSession,
    store_path: str,
    k: int = 128,
) -> int:
    """Fold every epoch partition EXCEPT the newest into one merged
    ``epoch=-1`` partial via the shared crash-safe `_store.compact_epochs`
    protocol (run while the stream is stopped); the folded rows are
    stamped with the EFFECTIVE k (smaller of the fold k and what the rows
    already survived), so a smaller-k compaction tightens the read-time
    refusal.  Returns how many partitions were folded."""
    from ._store import compact_epochs

    _load_checked(spark, store_path, k, "compact")

    def fold(df: DataFrame) -> DataFrame:
        k_eff = df.agg(
            F.least(F.min("k"), F.lit(int(k))).cast("int")
        ).collect()[0][0]
        folded = refold_partials(df.drop("k", "epoch"), k=k)
        return folded.withColumn("k", F.lit(int(k_eff)).cast("int"))

    return compact_epochs(spark, store_path, _SCHEMA, fold)
