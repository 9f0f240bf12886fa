"""Streaming exact-dedup against a persistent digest store (foreachBatch).

The continuous-ingest shape of an LLM training-data pipeline: documents
arrive as files; each microbatch must

1. drop documents whose normalized-text digest already exists in the
   historical digest store OR earlier in the same batch (in-batch survivor =
   smallest doc_id, consistent with `functions.dedup.exact_dedup`),
2. append the survivors to the clean corpus, and
3. append their digests to the store so later batches see them.

Store layout: an append-only Parquet table of digests. The anti join against
it broadcasts while the store is small; at corpus scale the store would be
bucketed by digest (co-located sort-merge anti join) or replaced by a
merge-capable table format — the dataflow here is unchanged either way.
Exactly-once caveat: foreachBatch may retry a batch on failure; digest
appends are idempotent for dedup purposes (a duplicate digest row only
re-suppresses), but corpus appends should go to a transactional sink in
production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import normalized

DOCS_SCHEMA = "doc_id long, text string, lang string, n_chars long"


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _seen_digests(spark: SparkSession, store_path: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(store_path).select("digest")
    except AnalysisException:  # first batch: store does not exist yet
        # ONLY the missing-path case is swallowed: a genuine read failure
        # must propagate — treating it as "no prior" would re-admit every
        # previously-seen duplicate into the clean corpus
        return spark.createDataFrame([], "digest string")


def start_streaming_dedup(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_name: str = "doc_dedup",
):
    """Start the dedup stream; returns the StreamingQuery.

    Survivors land under `out_path` (clean corpus), their digests under
    `store_path`."""

    def dedup_batch(batch_df: DataFrame, epoch_id: int) -> None:
        digested = batch_df.withColumn(
            "digest", F.md5(normalized(F.col(text_col)))
        )
        # in-batch survivor: smallest id per digest
        from pyspark.sql import Window

        win = Window.partitionBy("digest")
        survivors = (
            digested.withColumn("_keep", F.min(id_col).over(win))
            .where(F.col(id_col) == F.col("_keep"))
            .drop("_keep")
        )
        fresh = survivors.join(
            F.broadcast(_seen_digests(spark, store_path)), "digest", "left_anti"
        ).localCheckpoint(eager=True)  # read once, written to two sinks
        if fresh.isEmpty():
            return
        fresh.drop("digest").write.mode("append").parquet(out_path)
        fresh.select("digest").write.mode("append").parquet(store_path)

    return (
        docs.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(dedup_batch)
        .start()
    )
