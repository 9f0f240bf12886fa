"""Property index (S10) — the Spark equivalent of the reference's B-tree
index on `:Person(name)` (create_index, reference PPR.java:70-119).

In Spark, point lookups by property are broadcast joins against the nodes
table — no index needed for correctness. For repeated name-keyed joins at
scale, a *bucketed* copy of the table removes the shuffle on the bucketed
side (hash-bucket co-location is Spark's durable analogue of an index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import MINHASH_BUCKET_CAP


def create_name_index(
    graph, table_name: str = "nodes_by_name", buckets: int = 16
) -> None:
    """Materialize nodes bucketed+sorted by name into the session catalog.

    Progress reporting (the reference prints % complete while populating
    the index, PPR.java:70-119): a batch engine builds the whole bucket
    table in ONE job, so the honest analogue is start/done log lines with
    the row count — per-row percentages would mean driver-side iteration."""
    import logging

    log = logging.getLogger(__name__)
    log.info("create_name_index: populating %r (%d buckets)...", table_name, buckets)
    (
        graph.nodes.write.mode("overwrite")
        .bucketBy(buckets, "name")
        .sortBy("name")
        .format("parquet")
        .saveAsTable(table_name)
    )
    # graph.n is already cached on the PropertyGraph — no re-scan of the
    # just-written table for a log line
    log.info(
        "create_name_index: %r complete — %d rows indexed (100%%)",
        table_name, graph.n,
    )


def create_signature_index(
    banded: DataFrame, table_name: str = "lsh_signatures", buckets: int = 64
) -> None:
    """Materialize an LSH band table (doc_id, band, bucket) bucketed by its
    join key into the session catalog — the persisted form of the
    signature store the dedup/streaming operators describe 'at scale':
    every future candidate join against it shuffles ONLY the probe side
    (hash-bucket co-location, the same durable-index analogue as the name
    index above)."""
    import logging

    from pyspark.sql import functions as F

    log = logging.getLogger(__name__)
    log.info("create_signature_index: populating %r (%d buckets)...",
             table_name, buckets)
    (
        banded.write.mode("overwrite")
        .bucketBy(buckets, "band", "bucket")
        .sortBy("band", "bucket")
        .format("parquet")
        .saveAsTable(table_name)
    )
    # build-time hot-bucket report: probes exclude oversized keys (see
    # probe_signature_index), so the no-silent-caps log happens ONCE here
    # instead of per probe
    spark = banded.sparkSession
    hot = (
        spark.table(table_name)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > MINHASH_BUCKET_CAP)
        .count()
    )
    if hot:
        log.warning(
            "create_signature_index: %r holds %d (band,bucket) keys over "
            "MINHASH_BUCKET_CAP=%d; probes will exclude them — dedup the "
            "boilerplate (exact_dup_groups) before indexing",
            table_name, hot, MINHASH_BUCKET_CAP,
        )
    log.info("create_signature_index: %r complete (100%%)", table_name)


def probe_signature_index(
    spark: SparkSession,
    probe: DataFrame,
    table_name: str = "lsh_signatures",
    max_bucket_size: int | None = MINHASH_BUCKET_CAP,
) -> DataFrame:
    """(new_id, old_id): candidate pairs for a probe band table (doc_id,
    band, bucket) against the persisted signature index. Only the probe
    side shuffles — the index scan carries its bucketing.

    ``max_bucket_size`` defaults to `dedup.MINHASH_BUCKET_CAP`; ``None``
    DISABLES the cap — the same semantics as every sibling candidate
    generator (`minhash_lsh_candidates`, `cross_corpus_lsh_candidates`,
    `winnow_dup_pairs`), so a caller moving between the inline operator
    and the index probe keeps one cap contract. Capped index keys are
    excluded lazily (a second bucket-local scan of the persisted table,
    no checkpoint); the drop is reported once at index build."""
    from pyspark.sql import functions as F

    idx = spark.table(table_name).select(
        F.col("doc_id").alias("old_id"), "band", "bucket"
    )
    if max_bucket_size is not None:
        hot = (
            spark.table(table_name)
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .where(F.col("_sz") > max_bucket_size)
            .select("band", "bucket")
        )
        idx = idx.join(hot, ["band", "bucket"], "left_anti")
    return (
        probe.select(F.col("doc_id").alias("new_id"), "band", "bucket")
        .join(idx, ["band", "bucket"])
        .select("new_id", "old_id")
        .distinct()
    )


def lookup_by_name(spark: SparkSession, name: str, table_name: str = "nodes_by_name") -> DataFrame:
    return spark.table(table_name).where(F.col("name") == name)


def join_on_name(
    spark: SparkSession, df: DataFrame, table_name: str = "nodes_by_name"
) -> DataFrame:
    """Join an arbitrary (name, ...) DataFrame against the bucketed table;
    only the probe side shuffles."""
    return df.join(spark.table(table_name), "name")
