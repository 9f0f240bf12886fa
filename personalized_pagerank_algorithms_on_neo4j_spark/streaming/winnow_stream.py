"""Streaming incremental paragraph-winnow dedup (foreachBatch + fp store).

The sub-document companion to `minhash_stream`'s doc-level near-dups: each
microbatch of documents is re-keyed to fixed token blocks and winnow-
fingerprinted (`text.paragraph_rows` + `text.winnow_fingerprints` — the
SAME derivation as the batch `winnow_paragraph_dups`, so streaming and
batch cannot drift), checked against the historical fingerprint store,
and its (pid, fp_hash) rows appended so later batches see them.

Replay safety (the shared store discipline): fingerprint rows land in a
per-epoch partition via dynamic partition overwrite — a replayed epoch
rewrites its own partition with identical recomputed rows.  Matching
reads ONLY strictly earlier epochs (a replay of ANY epoch matches the
same history as its original run) and adds in-batch pairs separately;
the flags board is itself per-epoch partitioned.

Batch parity (pinned in tests): every cross-document paragraph pair is
flagged exactly once — in the epoch of its LATER member — so, WHILE THE
HOT-FINGERPRINT CAP BINDS ON NEITHER SIDE, the union of all flag
partitions equals `winnow_paragraph_dups` over the union corpus, as
unordered pairs with identical shared-counts.  The cap is applied
per-side (history DF and batch DF separately — the minhash_stream
discipline): a corpus-wide DF is not computable incrementally without
rescanning the store, so a fingerprint whose GLOBAL DF crosses the cap
mid-stream keeps its earlier flags and stops matching from that epoch
on, where the batch op would suppress it everywhere.  That is the
honest streaming semantics, not drift — rerun the batch operator for
the cap-exact answer.

Scale shape: the store grows one row per (paragraph, fingerprint); at
corpus scale it is written bucketed by fp_hash so the microbatch side is
the only shuffle in the candidate join.  The hot-fingerprint discipline
(`text._drop_hot_fingerprints` — logged drop, never silent) applies to
BOTH sides: the history is unbounded, and a boilerplate 16-token block
repeated across the corpus is exactly the d^2 join bomb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    PARA_STRIDE,
    PARA_TOKENS,
    _drop_hot_fingerprints,
    paragraph_rows,
    winnow_fingerprints,
)

STORE_SCHEMA = "pid bigint, fp_hash bigint, epoch bigint"
FLAGS_SCHEMA = (
    "new_doc bigint, new_para int, old_doc bigint, old_para int, "
    "shared bigint, epoch bigint"
)


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    flags_path: str,
    min_shared: int = 2,
    para_tokens: int = PARA_TOKENS,
    k: int = 4,
    w: int = 4,
    max_fp_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The foreachBatch handler, exposed so tests can drive (and replay)
    an epoch directly without a running stream."""

    def _decode(pairs: DataFrame) -> DataFrame:
        from ..functions.text import split_pid

        nd, np_ = split_pid(F.col("new_pid"))
        od, op = split_pid(F.col("old_pid"))
        return pairs.select(
            nd.alias("new_doc"),
            np_.alias("new_para"),
            od.alias("old_doc"),
            op.alias("old_para"),
            "shared",
        ).where(F.col("new_doc") != F.col("old_doc"))

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        paras = paragraph_rows(
            batch_df, para_tokens, id_col=id_col, text_col=text_col
        )
        fps = (
            winnow_fingerprints(paras, id_col="pid", k=k, w=w)
            .select("pid", "fp_hash")
            .distinct()
            .localCheckpoint(eager=True)  # store write + two match sides
        )
        if fps.isEmpty():
            return
        (
            fps.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )
        # strictly EARLIER epochs only (replay of any middle epoch must
        # not see future rows — the minhash_stream rule)
        hist = (
            spark.read.schema(STORE_SCHEMA)
            .parquet(store_path)
            .where(F.col("epoch") < int(epoch_id))
            .select("pid", "fp_hash")
            .localCheckpoint(eager=True)
        )
        if max_fp_df is not None:
            hist = _drop_hot_fingerprints(hist, max_fp_df, "winnow_stream:history")
            matchable = _drop_hot_fingerprints(fps, max_fp_df, "winnow_stream:batch")
        else:
            matchable = fps
        nb = matchable.select(F.col("pid").alias("new_pid"), "fp_hash")
        against_hist = (
            nb.join(hist.select(F.col("pid").alias("old_pid"), "fp_hash"), "fp_hash")
            .groupBy("new_pid", "old_pid")
            .agg(F.count(F.lit(1)).cast("long").alias("shared"))
            .where(F.col("shared") >= min_shared)
        )
        in_batch = (
            nb.join(
                matchable.select(F.col("pid").alias("old_pid"), "fp_hash"),
                "fp_hash",
            )
            .where(F.col("old_pid") < F.col("new_pid"))
            .groupBy("new_pid", "old_pid")
            .agg(F.count(F.lit(1)).cast("long").alias("shared"))
            .where(F.col("shared") >= min_shared)
        )
        (
            _decode(against_hist)
            .unionByName(_decode(in_batch))
            .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(flags_path)
        )

    return merge_batch


def start_streaming_winnow_dedup(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    flags_path: str,
    query_name: str = "winnow_para_dedup",
    **kwargs,
):
    """Start the incremental sub-document dedup stream."""
    merge_batch = make_merge_batch(spark, store_path, flags_path, **kwargs)
    return (
        docs.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_flags(spark: SparkSession, flags_path: str) -> DataFrame:
    return spark.read.schema(FLAGS_SCHEMA).parquet(flags_path)
