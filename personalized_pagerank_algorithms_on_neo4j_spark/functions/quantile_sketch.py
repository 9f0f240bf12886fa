"""Mergeable quantile sketch — deterministic hash-level sampling.

The sketches family (`functions.sketches`: HLL, CMS, KMV) lacked a
mergeable QUANTILE member: `histogram_quantiles` is exact but needs a
bounded value domain.  KLL (Karnin/Lang/Liberty 2016) is the standard
unbounded-domain answer, but its compactor keeps *sequential* buffer
state and flips a coin per compaction — replay-hostile and
order-sensitive, the same reasons `kmv_stream` rejected Vitter's
reservoir.  This module computes KLL's level structure with the KMV
trick instead: every row gets a seeded 48-bit `portable_hash`, and the
LEVEL-l sample is simply the rows with ``hash < 2**(48-l)`` — a
2**-l-rate uniform sample whose members each stand for ``2**l`` rows.
The sketch picks the smallest level whose sample fits ``k`` rows and
estimates rank(v) as ``2**level x |sample <= v|`` against the EXACT
total count (one cheap aggregate).

Why this is mergeable EXACTLY (not just approximately): the level-l
survivor sets are NESTED (``hash < t`` is monotone in t), so any
partial sampled at level L_w contains every survivor of every level
``l >= L_w``.  `fold_quantile_partials` therefore re-filters the union
of partials at ``max(write levels) + #{l >= max : survivors_l > k}``
— provably the level the whole-data sketch would have chosen (epoch
counts <= full counts, so no epoch's write level can exceed the batch
level; survivor counts at levels >= every write level are computable
from the partials alone).  ``fold(partials) == sketch(all data)``
row-for-row, pinned by test.  "Compaction" = raising the level and
re-filtering — the deterministic seeded-hash generalization of KLL's
random parity coin.

Estimate rule (identical in Spark / DuckDB / the streaming fold): sort
the sample by (value, hash), give row i cumulative weight
``i x 2**level``; the p-quantile estimate is the smallest sampled value
whose cumulative weight reaches ``ceil(p x n_total)``, falling back to
the sample maximum when sampling variance undershoots the target.
Standard level-sampling bounds give rank error O(n/sqrt(k)) w.h.p.;
the accuracy test pins the realized error on the gate fixture.

Scale shape: one narrow projection + ONE per-stratum aggregate (41
conditional sums — a single JVM pass, map-side combinable) + a
stratum-keyed join back + a per-stratum window over <= k sampled rows.
No global window, no Python, no collect.  ``MAX_LEVEL = 40`` caps the
level scan: a stratum would need > k x 2**40 (~10**14 x k) rows to
outgrow it — the guard test asserts the cap never binds at gate scale
and the level formula leaves headroom visible in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import portable_hash

HASH_BITS = 48
MAX_LEVEL = 40


def _pow2_long(e):
    """2**e as an exact BIGINT from an integer column (e <= 48 < 53, so
    the double pow is exact in both engines)."""
    return F.pow(F.lit(2.0), e).cast("long")


def sketch_base(
    df: DataFrame,
    value_col,
    key_col,
    stratum_col,
    seed: int = 7,
) -> DataFrame:
    """(stratum, v, h): long values + the seeded 48-bit row hash.
    ``key_col`` must identify rows uniquely (duplicate keys would
    correlate survival and bias the sample)."""
    return df.select(
        F.col(stratum_col).alias("stratum") if isinstance(stratum_col, str)
        else stratum_col.alias("stratum"),
        (F.col(value_col) if isinstance(value_col, str) else value_col)
        .cast("long")
        .alias("v"),
        portable_hash(
            F.col(key_col) if isinstance(key_col, str) else key_col, seed
        ).alias("h"),
    )


def _level_stats(base: DataFrame, k: int) -> DataFrame:
    """(stratum, n_total, level): exact count + the smallest level whose
    survivor count fits k, computed as SUM over l of [survivors_l > k]
    (survivor counts are non-increasing in l, so the indicators form a
    prefix and the sum IS the argmin — branch-free and SQL-portable)."""
    sums = [
        F.sum(
            F.when(F.col("h") < F.lit(1 << (HASH_BITS - l)), 1).otherwise(0)
        ).alias(f"c{l}")
        for l in range(MAX_LEVEL + 1)
    ]
    stats = base.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"), *sums
    )
    level = sum(
        F.when(F.col(f"c{l}") > k, 1).otherwise(0) for l in range(MAX_LEVEL + 1)
    )
    return stats.select(
        "stratum", "n_total", level.cast("long").alias("level")
    )


def quantile_partials(
    df: DataFrame,
    value_col,
    key_col,
    stratum_col,
    k: int = 128,
    seed: int = 7,
) -> DataFrame:
    """One epoch's partial: (stratum, v, h, level, n_total, is_meta).
    Sample rows carry the values; ONE meta row per stratum carries the
    exact count even when the sample is empty (a stratum of k+1
    large-hash rows can legally sample to zero rows).  Partials COMPOSE
    under `fold_quantile_partials` — see module docstring."""
    base = sketch_base(df, value_col, key_col, stratum_col, seed=seed)
    stats = base.join(_level_stats(base, k), "stratum")
    sample = stats.where(
        F.col("h") < _pow2_long(F.lit(HASH_BITS) - F.col("level"))
    ).select(
        "stratum", "v", "h", "level", "n_total", F.lit(False).alias("is_meta")
    )
    meta = _level_stats(base, k).select(
        "stratum",
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("long").alias("h"),
        "level",
        "n_total",
        F.lit(True).alias("is_meta"),
    )
    return sample.unionAll(meta)


def _estimate(
    sample: DataFrame, totals: DataFrame, probs: list[float]
) -> DataFrame:
    """Shared estimate step: ``sample`` = (stratum, v, h, level),
    ``totals`` = (stratum, n_total, level).  Returns
    (stratum, p, est, level, n_sample, n_total)."""
    w = Window.partitionBy("stratum").orderBy("v", "h")
    ranked = sample.select(
        "stratum",
        "v",
        (F.row_number().over(w).cast("long") * _pow2_long(F.col("level"))).alias(
            "cumw"
        ),
    )
    caps = ranked.groupBy("stratum").agg(
        F.max("v").alias("max_v"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    )
    targets = totals.select(
        "stratum",
        "n_total",
        "level",
        F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"),
    ).withColumn("t", F.ceil(F.col("p") * F.col("n_total")).cast("long"))
    cand = (
        targets.join(ranked, "stratum")
        .where(F.col("cumw") >= F.col("t"))
        .groupBy("stratum", "p")
        .agg(F.min("v").alias("est0"))
    )
    return (
        targets.join(cand, ["stratum", "p"], "left")
        .join(caps, "stratum", "left")
        .select(
            "stratum",
            "p",
            F.coalesce("est0", "max_v").alias("est"),
            F.col("level").cast("long").alias("level"),
            F.coalesce("n_sample", F.lit(0)).cast("long").alias("n_sample"),
            "n_total",
        )
    )


def quantile_sketch(
    df: DataFrame,
    value_col,
    key_col,
    stratum_col,
    probs: list[float],
    k: int = 128,
    seed: int = 7,
) -> DataFrame:
    """(stratum, p, est, level, n_sample, n_total): per-stratum quantile
    estimates from the deterministic level-sampling sketch."""
    base = sketch_base(df, value_col, key_col, stratum_col, seed=seed)
    totals = _level_stats(base, k)
    sample = base.join(totals.select("stratum", "level"), "stratum").where(
        F.col("h") < _pow2_long(F.lit(HASH_BITS) - F.col("level"))
    )
    return _estimate(sample, totals, probs)


def refold_partials(partials: DataFrame, k: int = 128) -> DataFrame:
    """Fold epoch partials (the `quantile_partials` schema, any number of
    epochs — counts in the meta rows are ADDITIVE) into ONE partial in
    the same schema: level = max(write levels) + #{l >= that : survivors
    at l > k} (the batch level formula restricted to levels the partials
    can answer — see module docstring), sample re-filtered at it, counts
    summed.  Idempotent (a second refold at the same k is a no-op) and
    the compaction primitive of the streaming store."""
    meta = partials.where("is_meta")
    totals0 = meta.groupBy("stratum").agg(
        F.sum("n_total").cast("long").alias("n_total"),
        F.max("level").alias("lw"),  # max write level
    )
    rows = partials.where(~F.col("is_meta")).select("stratum", "v", "h")
    # survivor counts at candidate levels >= lw (computable from partials
    # alone: level filters are nested), folded to the batch level formula
    sums = [
        F.sum(
            F.when(F.col("h") < F.lit(1 << (HASH_BITS - l)), 1).otherwise(0)
        ).alias(f"c{l}")
        for l in range(MAX_LEVEL + 1)
    ]
    counts = rows.groupBy("stratum").agg(*sums)
    lvl_terms = [
        F.when(
            (F.lit(l) >= F.col("lw")) & (F.col(f"c{l}") > k), 1
        ).otherwise(0)
        for l in range(MAX_LEVEL + 1)
    ]
    totals = (
        totals0.join(counts, "stratum", "left")
        .select(
            "stratum",
            "n_total",
            (F.col("lw") + sum(lvl_terms)).cast("long").alias("level"),
        )
    )
    sample = rows.join(totals.select("stratum", "level"), "stratum").where(
        F.col("h") < _pow2_long(F.lit(HASH_BITS) - F.col("level"))
    )
    return sample.select(
        "stratum", "v", "h", "level",
        F.lit(None).cast("long").alias("n_total"),
        F.lit(False).alias("is_meta"),
    ).unionAll(
        totals.select(
            "stratum",
            F.lit(None).cast("long").alias("v"),
            F.lit(None).cast("long").alias("h"),
            "level",
            "n_total",
            F.lit(True).alias("is_meta"),
        )
    )


def fold_quantile_partials(
    partials: DataFrame, probs: list[float], k: int = 128
) -> DataFrame:
    """Fold epoch partials into the same output as `quantile_sketch` over
    the union of the epochs' data.  Exact equality, not approximation —
    see module docstring."""
    folded = refold_partials(partials, k)
    sample = folded.where(~F.col("is_meta")).select(
        "stratum", "v", "h", "level"
    )
    totals = folded.where("is_meta").select("stratum", "n_total", "level")
    return _estimate(sample, totals, probs)


def quantile_sketch_oracle_sql(
    values_sql: str,
    probs: list[float],
    k: int = 128,
    seed: int = 7,
) -> str:
    """DuckDB twin of `quantile_sketch`: ``values_sql`` yields
    (stratum, key, v) with v already BIGINT; identical hash, level rule,
    rank arithmetic, and undershoot fallback."""
    probs_values = ", ".join(f"({float(p)})" for p in probs)
    return f"""
WITH qs_in AS ({values_sql}),
qs_base AS (
  SELECT stratum, CAST(v AS BIGINT) AS v,
         CAST(('0x' || substring(md5(CAST(key AS VARCHAR) || '#' || '{seed}'),
                                 1, 12)) AS BIGINT) AS h
  FROM qs_in),
qs_lc AS (
  SELECT stratum, l, COUNT(*) AS c
  FROM qs_base
  CROSS JOIN (SELECT unnest(range(0, {MAX_LEVEL + 1})) AS l) lv
  WHERE h < CAST(pow(2, {HASH_BITS} - l) AS BIGINT)
  GROUP BY 1, 2),
qs_tot AS (
  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_total FROM qs_base
  GROUP BY 1),
qs_lvl AS (
  SELECT t.stratum, t.n_total,
         CAST(COALESCE(SUM(CASE WHEN c > {k} THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS level
  FROM qs_tot t LEFT JOIN qs_lc USING (stratum)
  GROUP BY 1, 2),
qs_samp AS (
  SELECT b.stratum, b.v, b.h, l.level
  FROM qs_base b JOIN qs_lvl l USING (stratum)
  WHERE b.h < CAST(pow(2, {HASH_BITS} - l.level) AS BIGINT)),
qs_rank AS (
  SELECT stratum, v,
         CAST(ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY v, h)
              AS BIGINT) * CAST(pow(2, level) AS BIGINT) AS cumw
  FROM qs_samp),
qs_caps AS (
  SELECT stratum, MAX(v) AS max_v, CAST(COUNT(*) AS BIGINT) AS n_sample
  FROM qs_rank GROUP BY 1),
qs_tgt AS (
  SELECT l.stratum, l.n_total, l.level, pr.p,
         CAST(ceil(pr.p * l.n_total) AS BIGINT) AS t
  FROM qs_lvl l CROSS JOIN (
    SELECT CAST(p AS DOUBLE) AS p FROM (VALUES {probs_values}) pv(p)) pr),
qs_cand AS (
  SELECT g.stratum, g.p, MIN(r.v) AS est0
  FROM qs_tgt g JOIN qs_rank r USING (stratum)
  WHERE r.cumw >= g.t
  GROUP BY 1, 2)
SELECT g.stratum, g.p, COALESCE(c.est0, cp.max_v) AS est,
       g.level, COALESCE(cp.n_sample, 0) AS n_sample, g.n_total
FROM qs_tgt g
LEFT JOIN qs_cand c ON g.stratum = c.stratum AND g.p = c.p
LEFT JOIN qs_caps cp ON g.stratum = cp.stratum
"""
