"""Range (interval) join: match fact rows to band rows with lo <= v < hi.

Spark has no native range-join operator — a plain inequality join plans
as BroadcastNestedLoopJoin, O(|facts| x |bands|) comparisons, which is
fine for a ten-row band table and catastrophic for a real one. The
bucketized plan is the standard fix (same trick Databricks' range-join
hints apply): pick a bucket width, EXPLODE each band over the buckets
its interval covers, bucket each fact by floor(v / width), equi-join on
the bucket, and apply the exact interval predicate as a residual filter.
Cost becomes O(|facts| + sum of band spans / width) rows through one
equi-join shuffle — hash-partitionable, AQE-skew-splittable, everything
a nested loop is not.

Bands may overlap (a fact matches every covering band) and gaps are
allowed (unmatched facts drop out, inner-join semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = None,
) -> DataFrame:
    """Inner-join facts to every band with lo <= value < hi.

    ``bucket_width`` defaults to the smallest band width (one tiny
    aggregate over the band table — dimension-sized by definition).
    Candidate buckets cover [floor(lo/w), floor(hi/w)] inclusive; the
    residual predicate removes boundary false positives, so any positive
    width is CORRECT and width only tunes the candidate blow-up."""
    if bucket_width is None:
        # min over POSITIVE widths only: a degenerate lo == hi band (an
        # empty interval, which matches nothing) must not collapse the
        # width to zero and explode wide bands into millions of buckets
        row = bands.agg(
            F.min(
                F.when(
                    F.col(hi_col) > F.col(lo_col), F.col(hi_col) - F.col(lo_col)
                )
            ).alias("w")
        ).first()
        if row is None or row["w"] is None:
            raise ValueError(
                "cannot infer bucket_width: no band has hi > lo; pass one"
            )
        bucket_width = float(row["w"])
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))
    exploded = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    bucketed = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / w).cast("long")
    )
    return (
        bucketed.join(exploded, "_bucket")
        .where(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )
