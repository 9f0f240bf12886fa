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


# --- Z-order (Morton) layout clustering --------------------------------------
#
# The table-layout verb a 100 TB engine runs before writing parquet
# (Delta's OPTIMIZE ZORDER BY, Iceberg's sort-order z-curve): interleave
# the bits of two clustering keys so rows close in BOTH dimensions land in
# the same files, keeping per-file min/max ranges tight on each key — the
# scan planner can then skip files for predicates on EITHER column.
# Everything is exact integer arithmetic (min-max scale to a fixed bit
# budget, then bit interleave), so the DuckDB twin is the same formula.

ZORDER_BITS = 16  # per-key resolution; zkey is 2*bits wide (fits BIGINT)


def _interleave_expr(a: str, b: str, bits: int, div: str) -> str:
    """Morton interleave as ONE static expression (no per-bit explode —
    2*bits integer terms, whole-stage-codegen friendly; `div` is the
    engine's integer-division spelling: Spark DIV, DuckDB //)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({b} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _scale_expr(col: str, lo: str, hi: str, bits: int, div: str) -> str:
    """Min-max scale an integer column into [0, 2^bits): exact integer
    ((x - lo) * (2^bits - 1)) div max(1, hi - lo).  Range * 2^bits must
    stay under 2^63 — at bits=16 that allows key ranges up to 2^46."""
    top = (1 << bits) - 1
    return (
        f"((({col}) - ({lo})) * {top}) {div} "
        f"(CASE WHEN ({hi}) > ({lo}) THEN ({hi}) - ({lo}) ELSE 1 END)"
    )


def zorder_layout(
    df: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
    n_shards: int = 64,
    bits: int = ZORDER_BITS,
    bounds: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """(id, zkey, shard): Morton key over (a_col, b_col) and the z-range
    shard each row lands in.  Shards are CONTIGUOUS z-ranges (zkey div
    2^(2*bits)/n_shards) — how layout compaction actually buckets files —
    rather than equal-count splits: an equal-count assignment needs a
    global sort/window, which is a single-partition bottleneck at corpus
    scale; z-range buckets need only the two global min/max scalars
    (one broadcast 1-row aggregate).  Row-count skew across shards is
    data-dependent and visible in the manifest (`zorder_manifest`).

    ``bounds`` = (a_lo, a_hi, b_lo, b_hi) fixes the scaling domain up
    front instead of deriving it — REQUIRED for incremental/streaming
    layouts, where a data-derived domain would silently re-scale old
    shards as new extremes arrive; out-of-bounds values clamp to the
    declared edges (both engines)."""
    if bounds is not None:
        alo, ahi, blo, bhi = (int(x) for x in bounds)
        stats = df.sparkSession.range(1).select(
            F.lit(alo).alias("_alo"),
            F.lit(ahi).alias("_ahi"),
            F.lit(blo).alias("_blo"),
            F.lit(bhi).alias("_bhi"),
        )
        a_in = f"GREATEST(LEAST({a_col}, _ahi), _alo)"
        b_in = f"GREATEST(LEAST({b_col}, _bhi), _blo)"
    else:
        stats = df.agg(
            F.min(a_col).cast("long").alias("_alo"),
            F.max(a_col).cast("long").alias("_ahi"),
            F.min(b_col).cast("long").alias("_blo"),
            F.max(b_col).cast("long").alias("_bhi"),
        )
        a_in, b_in = a_col, b_col
    sa = _scale_expr(a_in, "_alo", "_ahi", bits, "DIV")
    sb = _scale_expr(b_in, "_blo", "_bhi", bits, "DIV")
    zk = _interleave_expr(f"({sa})", f"({sb})", bits, "DIV")
    span = (1 << (2 * bits)) // int(n_shards) or 1
    return (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col).cast("long").alias("id"),
            F.col(a_col).cast("long").alias("a"),
            F.col(b_col).cast("long").alias("b"),
            F.expr(zk).cast("long").alias("zkey"),
        )
        # LEAST clamp: span floors, so for non-power-of-two n_shards the
        # z-key maximum would otherwise land in shard index n_shards
        .select(
            "id", "a", "b", "zkey",
            F.expr(f"LEAST(zkey DIV {span}, {int(n_shards) - 1})").alias("shard"),
        )
    )


def zorder_manifest(layout: DataFrame) -> DataFrame:
    """(shard, n_rows, a_min, a_max, b_min, b_max): the per-shard skipping
    stats a scan planner prunes with — the point of the layout.  One
    map-side-combinable aggregate."""
    return layout.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("a").alias("a_min"),
        F.max("a").alias("a_max"),
        F.min("b").alias("b_min"),
        F.max("b").alias("b_max"),
    )


def _zorder_layout_sql(
    src_sql: str, a: str, b: str, id_col: str, n_shards: int, bits: int
) -> str:
    sa = _scale_expr("a", "alo", "ahi", bits, "//")
    sb = _scale_expr("b", "blo", "bhi", bits, "//")
    zk = _interleave_expr(f"({sa})", f"({sb})", bits, "//")
    span = (1 << (2 * bits)) // int(n_shards) or 1
    return f"""
zsrc AS MATERIALIZED (
  SELECT CAST({id_col} AS BIGINT) AS id, CAST({a} AS BIGINT) AS a,
         CAST({b} AS BIGINT) AS b
  FROM ({src_sql}) zz
),
zstat AS (
  SELECT MIN(a) AS alo, MAX(a) AS ahi, MIN(b) AS blo, MAX(b) AS bhi FROM zsrc
),
zlay AS MATERIALIZED (
  SELECT id, a, b, CAST({zk} AS BIGINT) AS zkey
  FROM zsrc CROSS JOIN zstat
)"""


def zorder_layout_oracle_sql(
    src_sql: str,
    a: str,
    b: str,
    id_col: str,
    n_shards: int = 64,
    bits: int = ZORDER_BITS,
) -> str:
    span = (1 << (2 * bits)) // int(n_shards) or 1
    return f"""
WITH {_zorder_layout_sql(src_sql, a, b, id_col, n_shards, bits)}
SELECT id, a, b, zkey,
       CAST(LEAST(zkey // {span}, {int(n_shards) - 1}) AS BIGINT) AS shard
FROM zlay
"""


def zorder_manifest_oracle_sql(
    src_sql: str,
    a: str,
    b: str,
    id_col: str,
    n_shards: int = 64,
    bits: int = ZORDER_BITS,
) -> str:
    span = (1 << (2 * bits)) // int(n_shards) or 1
    return f"""
WITH {_zorder_layout_sql(src_sql, a, b, id_col, n_shards, bits)}
SELECT CAST(LEAST(zkey // {span}, {int(n_shards) - 1}) AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(a) AS a_min, MAX(a) AS a_max, MIN(b) AS b_min, MAX(b) AS b_max
FROM zlay GROUP BY 1
"""


def curriculum_order_oracle_sql(
    n_buckets: int,
    len_sql: str,
    sw_sql: str,
    punct_sql: str,
    quality_sql: str,
    quality_raw_sql: str,
    order_key_sql: str,
) -> str:
    """DuckDB twin of ``curriculum_order``; the engine-shared quality /
    hash fragments are passed in (they live beside the other oracles'
    shared fragments in the entry registry).  The bucket quantizes the
    RAW quality — bucketing the ROUND(q, 6) display value would re-open
    the cross-engine .5-boundary flip."""
    return f"""
WITH b AS (
  SELECT doc_id,
    {len_sql} AS len_score,
    {sw_sql} AS sw_raw,
    {punct_sql} AS punct_raw
  FROM documents
),
q AS (
  SELECT doc_id,
         {quality_sql} AS quality,
         {quality_raw_sql} AS q_raw
  FROM b
)
SELECT doc_id, quality,
       least(CAST(floor((1.0 - q_raw) * {int(n_buckets)}) AS BIGINT),
             {int(n_buckets) - 1}) AS bucket,
       {order_key_sql} AS order_key
FROM q
"""
