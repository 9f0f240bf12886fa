"""Streaming corpus-build store (#17): the curation gates on arrival.

The streaming twin of `functions/corpus.corpus_pipeline`'s GATE stages:
each microbatch of documents is quality/language-gated (stateless),
exact-deduped against a digest store, near-dup-flagged against a MinHash
band store, and decontaminated against a FIXED benchmark shingle set
(stateless); survivors land in a kept-documents store.  The GLOBAL
stages (token-budget mixture, sequence packing) are inherently
order-sensitive over the whole corpus, so they run at MATERIALIZE time
over the accumulated kept store — `materialize()` — exactly how a real
pipeline snapshots a training mix from a continuously-curated pool.

Near-dup discipline (the honest streaming rule): a document drops iff it
has an LSH candidate pair with an EARLIER-stored document (or a
smaller-id in-batch partner).  This is intentionally NOT the batch
pipeline's transitive-cluster survivorship — a kept document can never
be retroactively un-kept by a later bridge arrival, which transitive
clustering would require.  The rule equals the batch-expressible "drop
the larger id of every candidate pair" whenever delivery is id-ordered
(the bpe_stream first-seen discipline), which is what the parity test
pins.  Band rows are stored for EVERY exact-survivor (including docs the
near-dup or decon gate later drops): a pair against a dropped document
still drops the later partner, exactly as the per-pair batch rule does.

Replay safety: all three stores are per-epoch partitions written with
dynamic partition overwrite; cross-epoch checks read STRICTLY EARLIER
epochs only, so replays of any epoch (latest or middle) recompute
identical rows; re-delivered documents lose to the digest store's
first-seen row.  Compaction folds history through the shared crash-safe
`_store.compact_epochs` (digests/bands: distinct rows; kept: first
epoch wins per doc_id).

Scale shape: the stateless gates are one narrow projection per batch;
the digest check is an anti-join on a digest-bucketed store; the band
join inherits `minhash_stream`'s hot-bucket cap discipline; the kept
store is the corpus itself (text included — it IS the product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import (
    MINHASH_BUCKET_CAP,
    _drop_hot_buckets,
    minhash_banded,
    normalized,
    shingles_from_tokens,
)
from ..functions.text import langid, quality_score, tokens

DIGEST_SCHEMA = "doc_id bigint, digest string, epoch bigint"
BAND_SCHEMA = "doc_id bigint, band int, bucket string, epoch bigint"
KEPT_SCHEMA = "doc_id bigint, source string, text string, epoch bigint"


def _dirs(store_path: str) -> tuple[str, str, str]:
    base = store_path.rstrip("/")
    return base + "/digests", base + "/bands", base + "/kept"


def bench_shingle_set(bench: DataFrame, n: int = 3) -> DataFrame:
    """The FIXED decontamination target: the benchmark corpus's distinct
    shingle set, computed once offline (a moving benchmark would
    re-litigate already-kept documents)."""
    return (
        bench.select(tokens(normalized(F.col("text"))).alias("_toks"))
        .select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("sh"))
        .distinct()
    )


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    bench_shingles: DataFrame,
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    decon_max: float = 0.6,
    max_bucket_size: int | None = MINHASH_BUCKET_CAP,
):
    """The foreachBatch handler, exposed so tests can drive (and replay)
    an epoch directly.  ``bench_shingles`` is the fixed (sh) frame from
    `bench_shingle_set` — small by definition, broadcast per batch."""
    digests_dir, bands_dir, kept_dir = _dirs(store_path)
    bs = bench_shingles.withColumn("_hit", F.lit(1)).localCheckpoint(
        eager=True
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        from ._store import recover_store

        for d in _dirs(store_path):
            recover_store(d)
        epoch_id = int(epoch_id)
        c = F.col("text")
        gated = (
            batch_df.select("doc_id", "source", "text")
            .where((langid(c) == lang) & (quality_score(c) >= min_quality))
            .withColumn("digest", F.md5(normalized(c)))
        )
        # in-batch exact dedup: min id per digest
        from pyspark.sql import Window

        win = Window.partitionBy("digest")
        gated = (
            gated.withColumn("_keep", F.min("doc_id").over(win))
            .where(F.col("doc_id") == F.col("_keep"))
            .drop("_keep")
        )
        # cross-epoch exact dedup: first-seen digest wins
        if os.path.exists(digests_dir):
            prior_digests = (
                spark.read.schema(DIGEST_SCHEMA)
                .parquet(digests_dir)
                .where(F.col("epoch") < epoch_id)
                .select("digest")
            )
            gated = gated.join(prior_digests, "digest", "left_anti")
        exact = gated.localCheckpoint(eager=True)
        if exact.isEmpty():
            return
        (
            exact.select("doc_id", "digest")
            .withColumn("epoch", F.lit(epoch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(digests_dir)
        )
        banded = minhash_banded(
            exact, num_hashes, bands, n, "text", "doc_id"
        ).localCheckpoint(eager=True)
        (
            banded.withColumn("epoch", F.lit(epoch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(bands_dir)
        )
        # near-dup drop: candidate vs strictly-earlier history, or a
        # smaller-id in-batch partner (the hot-bucket cap on both sides)
        hist = (
            spark.read.schema(BAND_SCHEMA)
            .parquet(bands_dir)
            .where(F.col("epoch") < epoch_id)
            .select("doc_id", "band", "bucket")
        )
        if max_bucket_size is not None:
            hist = _drop_hot_buckets(hist, max_bucket_size, "corpus_stream:history")
            matchable = _drop_hot_buckets(
                banded, max_bucket_size, "corpus_stream:batch"
            )
        else:
            matchable = banded
        nb = matchable.select(F.col("doc_id").alias("new_id"), "band", "bucket")
        dropped_near = (
            nb.join(
                hist.select(F.col("doc_id").alias("old_id"), "band", "bucket"),
                ["band", "bucket"],
            )
            .select(F.col("new_id").alias("doc_id"))
            .unionAll(
                nb.join(
                    matchable.select(
                        F.col("doc_id").alias("old_id"), "band", "bucket"
                    ),
                    ["band", "bucket"],
                )
                .where(F.col("old_id") < F.col("new_id"))
                .select(F.col("new_id").alias("doc_id"))
            )
            .distinct()
        )
        near = exact.join(F.broadcast(dropped_near), "doc_id", "left_anti")
        # decontamination vs the fixed benchmark shingle set (stateless)
        dsh = near.select(
            "doc_id", tokens(normalized(F.col("text"))).alias("_toks")
        ).select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("sh"),
        )
        contaminated = (
            dsh.join(F.broadcast(bs), "sh", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_sh"),
                F.count("_hit").alias("n_common"),
            )
            .where(
                F.round(
                    F.col("n_common").cast("double")
                    / F.col("n_sh").cast("double"),
                    6,
                )
                > decon_max
            )
            .select("doc_id")
        )
        kept = near.join(F.broadcast(contaminated), "doc_id", "left_anti")
        (
            kept.select("doc_id", "source", "text")
            .withColumn("epoch", F.lit(epoch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(kept_dir)
        )

    return merge_batch


def start_streaming_corpus(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    bench_shingles: DataFrame,
    query_name: str = "corpus_build",
    **kwargs,
):
    """Start the curation stream; returns the StreamingQuery."""
    merge_batch = make_merge_batch(spark, store_path, bench_shingles, **kwargs)
    return (
        docs.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_kept(spark: SparkSession, store_path: str) -> DataFrame:
    """(doc_id, source, text): the curated pool (first-seen rows)."""
    from ._store import recover_store

    _, _, kept_dir = _dirs(store_path)
    recover_store(kept_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("epoch")
    return (
        spark.read.schema(KEPT_SCHEMA)
        .parquet(kept_dir)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "source", "text")
    )


def materialize(
    spark: SparkSession,
    store_path: str,
    *,
    mix_budget: int = 700,
    pack_budget: int = 512,
    pack_buckets: int = 4,
    pack_seed: int = 7,
) -> DataFrame:
    """(bucket, pack, n_docs, pack_tokens, first_doc, last_doc): snapshot
    the training mix from the curated pool — the batch pipeline's global
    mixture + packing stages over the kept store (these are whole-corpus
    order-sensitive, so they belong to materialize time, not arrival
    time)."""
    from ..functions.packing import pack_sequences, token_budget_mix

    kept = read_kept(spark, store_path).localCheckpoint(eager=True)
    mix = token_budget_mix(kept, budget=mix_budget)
    packed = pack_sequences(
        mix,
        budget_tokens=pack_budget,
        n_buckets=pack_buckets,
        seed=pack_seed,
        n_tokens_col="n_tok",
    )
    return packed.groupBy("bucket", "pack").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold all-but-newest partitions in all three halves (stop the
    stream first)."""
    from pyspark.sql import Window

    from ._store import compact_epochs

    digests_dir, bands_dir, kept_dir = _dirs(store_path)

    def fold_distinct(df: DataFrame) -> DataFrame:
        return df.drop("epoch").distinct()

    def fold_kept(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy("epoch")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("doc_id", "source", "text")
        )

    n = compact_epochs(spark, digests_dir, DIGEST_SCHEMA, fold_distinct)
    n += compact_epochs(spark, bands_dir, BAND_SCHEMA, fold_distinct)
    n += compact_epochs(spark, kept_dir, KEPT_SCHEMA, fold_kept)
    return n
