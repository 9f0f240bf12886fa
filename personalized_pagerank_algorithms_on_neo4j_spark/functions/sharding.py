"""Training-data sharding and curriculum ordering.

The last mile of a pretraining pipeline: after dedup / decontamination /
quality filtering, the corpus is split into fixed shards for the data
loader, and optionally ordered easy-to-hard (curriculum). Both operators
are pure deterministic projections + one aggregate — no joins, no windows,
no global sorts — so they scale to any corpus size at full parallelism:

- shard id = portable_hash(doc_id, seed) % n_shards: stable under
  re-partitioning, reproducible across runs and engines (md5-based, same
  hash the samplers use).
- the manifest is ONE map-side-combinable groupBy over the sharded frame —
  the shard-level row/token totals a loader needs to plan epochs.
- curriculum bucket = quantized quality score (bucket 0 = highest
  quality); the within-bucket order key is a seeded hash, so "sort by
  (bucket, order_key)" inside each shard yields a deterministic
  easy-to-hard schedule with shuffled ties — no global rank is ever
  materialized (a global position column would be a single-partition
  window at corpus scale; the per-shard reader sorts its own shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import portable_hash, quality_score, quality_score_raw, tokens


def shard_assign(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Input columns + `shard` (long in [0, n_shards))."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        "shard", portable_hash(F.col(id_col), seed) % F.lit(n_shards)
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, n_docs, n_tokens, min_id, max_id): the loader-facing summary
    of a hash-sharded corpus. One groupBy, map-side combined; n_shards rows."""
    sharded = shard_assign(df, n_shards, seed, id_col).select(
        "shard",
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("_nt"),
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )


def curriculum_order(
    df: DataFrame,
    n_buckets: int = 10,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, quality, bucket, order_key): curriculum schedule columns.

    bucket = quantized quality (0 = highest-quality = trained first),
    clamped so quality 0.0 still lands in the last bucket; order_key is a
    seeded per-doc hash for a deterministic shuffle within a bucket. The
    consumer sorts its shard by (bucket, order_key, doc_id).

    The bucket quantizes the RAW quality double (bit-exact scalar
    expression in both engines); the rounded `quality` is display-only.
    Deriving the bucket from ROUND(q, 6) would re-open the documented
    .5-boundary divergence (Spark HALF_UPs the decimal string, DuckDB
    rounds the binary double) and flip a boundary doc's bucket
    cross-engine — the same exposure token_budget_mix was redesigned
    around."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    q_raw = quality_score_raw(F.col(text_col))
    bucket = F.least(
        F.floor((F.lit(1.0) - q_raw) * n_buckets).cast("long"),
        F.lit(n_buckets - 1).cast("long"),
    )
    return df.select(
        F.col(id_col),
        quality_score(F.col(text_col)).alias("quality"),
        bucket.alias("bucket"),
        portable_hash(F.col(id_col), seed).alias("order_key"),
    )
