"""Streaming tokenizer-counts store #15 (foreachBatch + per-epoch exact
merge-order BPE application).

The streaming twin of `functions.bpe.bpe_exact_apply_counts`: the merge
table is a FIXED trained artifact (tokenizer vocabularies version like
models, not like data — retraining is a new store), documents arrive on
a stream, and each microbatch tokenizes its own documents with the
exact merge-order argmin pass and lands as its own ``epoch=<id>``
partition — the repo's replay-idempotent store shape (a replayed epoch
recomputes the identical counts from the same offsets and overwrites
ITS OWN partition; the apply is a pure function of the document text,
so re-delivery cannot skew anything).

Duplicate discipline (the dedup-store family's first-seen rule):
documents are keyed by ``doc_id``; a batch deduplicates internally on
the deterministic min-text pick, and the read side keeps each doc's
row from its SMALLEST epoch.  Compaction folds all-but-the-newest
epochs into ``epoch=-1`` after applying the same first-seen rule —
and because -1 sorts below every real epoch, folded history keeps
winning over any future re-delivery, preserving first-seen exactly.

Scale shape: per batch ONE narrow projection (the argmin pass — zero
shuffles beyond the broadcast rule LUT) + one epoch-partition write;
the store grows by one row per new document per epoch.  Read-side
aggregation is one groupBy(doc_id) min-struct + an optional corpus
rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bpe import bpe_exact_apply_counts

_SCHEMA = "doc_id bigint, n_words bigint, n_tokens bigint, epoch bigint"


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The foreachBatch handler, exposed so tests can drive an epoch (and
    replay it) directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        docs = batch_df.groupBy(F.col(id_col)).agg(
            F.min(text_col).alias(text_col)
        )
        part = (
            bpe_exact_apply_counts(
                docs, merges, text_col=text_col, id_col=id_col
            )
            .select(
                F.col(id_col).cast("long").alias("doc_id"),
                "n_words",
                "n_tokens",
            )
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


def start_streaming_token_counts(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    query_name: str = "bpe_token_store",
):
    """Start the tokenizer-counts stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(
        spark, store_path, merges, text_col=text_col, id_col=id_col
    )
    return (
        docs.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def _first_seen(rows: DataFrame) -> DataFrame:
    """One row per doc_id: the row from its smallest epoch (epoch -1 =
    compacted history, which therefore always wins over re-delivery)."""
    return (
        rows.groupBy("doc_id")
        .agg(
            F.min(F.struct("epoch", "n_words", "n_tokens")).alias("r")
        )
        .select(
            "doc_id",
            F.col("r.n_words").alias("n_words"),
            F.col("r.n_tokens").alias("n_tokens"),
        )
    )


def read_token_counts(spark: SparkSession, store_path: str) -> DataFrame:
    """(doc_id, n_words, n_tokens) for every document streamed so far —
    equals `bpe_exact_apply_counts` over the distinct documents, exactly
    (the apply is deterministic in the text; first-seen dedup)."""
    from ._store import recover_store

    recover_store(store_path)
    return _first_seen(spark.read.schema(_SCHEMA).parquet(store_path))


def read_corpus_stats(spark: SparkSession, store_path: str) -> DataFrame:
    """1-row (n_docs, n_words, n_tokens, compression): the corpus rollup
    a tokenizer ablation reports, over everything streamed so far."""
    c = read_token_counts(spark, store_path)
    return c.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(
            F.sum("n_tokens") / F.greatest(F.sum("n_words"), F.lit(1)), 6
        ).alias("compression"),
    )


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold every epoch partition EXCEPT the newest into one ``epoch=-1``
    partition via the shared crash-safe `_store.compact_epochs` protocol
    (run while the stream is stopped), applying the first-seen rule so
    the fold is lossless for reads.  Returns how many partitions were
    folded."""
    from ._store import compact_epochs

    def fold(df: DataFrame) -> DataFrame:
        return _first_seen(df)  # compact_epochs stamps epoch=-1

    return compact_epochs(spark, store_path, _SCHEMA, fold)
