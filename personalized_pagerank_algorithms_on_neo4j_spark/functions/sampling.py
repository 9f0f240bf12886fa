"""Deterministic sampling / splitting for training-data curation.

At 100 TB, sampling must be (a) reproducible across runs, partition layouts
and engines, (b) a pure per-row filter — no shuffle, no driver state, fully
pushdown-friendly — and (c) consistent: re-running over a grown corpus keeps
every previously-selected row selected (the hash decides, not position).
Spark's `DataFrame.sample` gives none of these (partition-order dependent,
non-portable RNG), so everything here keys off `portable_hash` — the md5-based
48-bit hash shared with the DuckDB oracles.

Integer-bucket discipline: a row's bucket is `hash % 1_000_000` and every
rate is converted to an integer ppm threshold once, driver-side — the
engine-side comparison is pure integer arithmetic, so no cross-engine float
rounding can flip a row (see the repo's float-discipline notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import portable_hash

BUCKETS = 1_000_000  # ppm resolution: rates are exact to 1e-6


def _bucket(id_col: Column, seed: int) -> Column:
    return portable_hash(id_col, seed) % F.lit(BUCKETS)


def hash_sample(
    df: DataFrame,
    rate: float,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff hash(id, seed) lands in the first `rate` ppm buckets.

    A Bernoulli(rate) sample that is a pure deterministic filter: selection
    survives repartitioning, engine changes, and corpus growth (new rows get
    new hashes; old rows keep their verdict). Use a different `seed` for an
    independent re-draw."""
    threshold = int(round(rate * BUCKETS))
    return df.where(_bucket(F.col(id_col), seed) < F.lit(threshold))


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Add a `split` column ("train"/"val"/"test"/...) by cumulative hash
    buckets. Weights must sum to ~1; the last split absorbs ppm rounding so
    every row is assigned exactly one split. Assignment is per-id determinism:
    the same document always lands in the same split — the property that
    prevents train/test leakage when the pipeline reruns."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = list(weights)
    cums: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cums.append(int(round(acc * BUCKETS)))
    bucket = _bucket(F.col(id_col), seed)
    expr = F.lit(names[-1])
    for name, cum in zip(reversed(names[:-1]), reversed(cums)):
        expr = F.when(bucket < F.lit(cum), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    seed: int = 0,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. downsample dominant languages,
    keep all of a rare one). Still a pure per-row filter: the stratum picks
    an integer ppm threshold (tiny literal CASE — no join, no shuffle), the
    hash decides. Strata absent from `rates` use `default_rate`."""
    bucket = _bucket(F.col(id_col), seed)
    thr = F.lit(int(round(default_rate * BUCKETS)))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(round(rate * BUCKETS)))
        ).otherwise(thr)
    return df.where(bucket < thr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    base_rate: float = 1.0,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with probability `weight * base_rate` where `weight` is
    a per-row [0,1] column (e.g. a quality score) — the soft-filter used for
    corpus mixing (high-quality docs oversampled, low-quality downweighted
    instead of hard-dropped). Still a pure per-row filter: the float weight
    converts to an integer bucket threshold with ROUND-half-up (identical
    for positives in Spark and DuckDB; the product of two cross-engine-equal
    doubles is bitwise equal, so the threshold is too)."""
    thr = F.round(F.col(weight_col) * F.lit(float(base_rate) * BUCKETS), 0).cast(
        "long"
    )
    return df.where(_bucket(F.col(id_col), seed) < thr)


def sampling_oracle_fragments(seed: int = 0, id_expr: str = "doc_id") -> str:
    """DuckDB expression for the row bucket — mirrors `_bucket` exactly."""
    return (
        f"CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR) || '#' || "
        f"'{seed}'), 1, 12)) AS BIGINT) % {BUCKETS}"
    )


def exact_k_sample(
    df: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
    strata_col: str | None = None,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum (or globally), chosen as
    the k smallest hashes — the distributed, rerun-stable equivalent of
    reservoir sampling (Vitter's Algorithm R keeps a uniform k-subset via
    RNG state; ordering by a per-id hash yields the same uniform-k semantics
    with no sequential state and no partition-order dependence, and the
    chosen set is stable under repartitioning and engine changes).

    Scale shape: per-stratum selection is a window partitioned by the
    stratum (parallel across strata); the global variant is
    `orderBy(hash).limit(k)` — TakeOrderedAndProject, a per-partition top-k
    plus a k-way driver merge, never a single-partition global sort."""
    h = portable_hash(F.col(id_col), seed).alias("_h")
    if strata_col is None:
        return (
            df.select("*", h)
            .orderBy(F.asc("_h"), F.asc(id_col))
            .limit(k)
            .drop("_h")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.asc("_h"), F.asc(id_col))
    return (
        df.select("*", h)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_h", "_rn")
    )
