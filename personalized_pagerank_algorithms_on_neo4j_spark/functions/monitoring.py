"""Pipeline monitoring primitives shared by batch and streaming surfaces.

`hourly_anomaly_scores` is the single implementation behind the
oracle-gated `events_anomaly` driver query AND the streaming anomaly
detector (`streaming.anomaly_stream`): z-scores of a per-bucket count
series against its trailing window, with mean/variance computed from
explicit sum/sumsq so every engine runs the identical arithmetic
(stddev built-ins differ in accumulation order).

Scale shape: the input is ALREADY a per-bucket rollup (one row per hour),
so the ordered window runs over a tiny series; the per-event shuffle is
the upstream groupBy that produced the rollup. Integer sums stay exact
cross-engine; s*s and sum(n*n) fit in long up to ~3e9 events per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..plans.windows import bounded_global_window

__all__ = ["hourly_anomaly_scores"]


def hourly_anomaly_scores(
    hourly: DataFrame,
    trailing: int = 24,
    min_prev: int = 12,
    bucket_col: str = "hour",
    count_col: str = "n",
) -> DataFrame:
    """(bucket, n, n_prev, mean_prev, z) for every bucket with at least
    `min_prev` trailing buckets. The bucket column only needs a total
    order (timestamp or 'yyyy-MM-dd HH:mm:ss' string sort identically)."""
    # over |buckets| rows (hours, not events) — bounded by the time
    # range; the per-bucket counts feeding it come from a fully
    # parallel groupBy
    w = bounded_global_window(bucket_col).rowsBetween(-trailing, -1)
    with_stats = hourly.select(
        bucket_col,
        count_col,
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum(count_col).over(w).alias("s"),
        F.sum(F.col(count_col) * F.col(count_col)).over(w).alias("ss"),
    )
    mean = F.col("s") / F.col("n_prev")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n_prev")) / F.col("n_prev")
    return with_stats.where(F.col("n_prev") >= min_prev).select(
        bucket_col,
        count_col,
        F.col("n_prev").cast("long").alias("n_prev"),
        F.round(mean, 6).alias("mean_prev"),
        F.round(
            F.when(var > 0, (F.col(count_col) - mean) / F.sqrt(var)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("z"),
    )


def hourly_anomaly_oracle_sql(window: int, min_prev: int = 12) -> str:
    """DuckDB twin of the rolling-z hourly anomaly scorer: trailing
    ``window``-hour mean/stddev (population), z only where >= ``min_prev``
    prior hours exist (keep in lockstep with the Spark twin's
    parameter)."""
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1
),
st AS (
  SELECT hour, n,
         COUNT(*) OVER w AS n_prev,
         SUM(n) OVER w AS s,
         SUM(n * n) OVER w AS ss
  FROM hourly
  WINDOW w AS (ORDER BY hour ROWS BETWEEN {int(window)} PRECEDING AND 1 PRECEDING)
)
SELECT hour, n, CAST(n_prev AS BIGINT) AS n_prev,
       ROUND(s / CAST(n_prev AS DOUBLE), 6) AS mean_prev,
       ROUND(CASE WHEN (ss - s * s / CAST(n_prev AS DOUBLE)) / n_prev > 0
                  THEN (n - s / CAST(n_prev AS DOUBLE))
                       / sqrt((ss - s * s / CAST(n_prev AS DOUBLE)) / n_prev)
                  ELSE 0.0 END, 6) AS z
FROM st WHERE n_prev >= {int(min_prev)}
"""
