"""Skew-mitigation helpers for hub-heavy graphs.

High-degree hubs (a celebrity node with 10^7 in-edges) make the reverse-
expansion join `state.node == edges.dst` explode one shuffle partition. AQE's
skew-join split handles moderate skew automatically (enabled in session.py);
`salted_join` is the explicit treatment for extreme keys: replicate the small
side R ways, scatter the big side uniformly across the R salt buckets, join
on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small on `key`, with the hot-key partitions split `salt_buckets`
    ways. Output columns = big's + small's (minus the duplicate key)."""
    big_s = big.withColumn(
        "_salt", (F.floor(F.rand(42) * salt_buckets)).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
