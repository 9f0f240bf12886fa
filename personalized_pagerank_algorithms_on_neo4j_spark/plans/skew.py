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
from pyspark.sql.types import MapType


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small on `key`, with the hot-key partitions split `salt_buckets`
    ways. Output columns = big's + small's (minus the duplicate key).

    The salt is DETERMINISTIC per row — `pmod(hash(<all big columns>), R)`
    — never `F.rand`: SURVEY §4's randomness rule ("pin partitioning before
    rand") applies because a rand-salted row re-routes on task retry / AQE
    re-execution, and while an inner/left join's *result* is salt-invariant,
    any consumer that samples or checkpoints mid-plan would see retry
    flutter. Hashing ONLY the key would be wrong the other way (every row
    of a hot key lands in one bucket — no split at all); hashing the whole
    row scatters a hot key's distinct rows uniformly. Exact duplicate rows
    share a bucket — residual skew only if the big side is dominated by
    bit-identical rows, which upstream exact-dedup owns.

    MapType columns are excluded from the hash (F.hash rejects maps since
    Spark 3.0) — fine for scatter quality as long as at least one non-map
    column varies; a big side with ONLY map columns is rejected."""
    hashable = [
        f.name for f in big.schema.fields if not isinstance(f.dataType, MapType)
    ]
    if not hashable:
        raise ValueError(
            "salted_join: big side has only MapType columns — no hashable "
            "salt input (F.hash cannot consume maps)"
        )
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.hash(*[F.col(c) for c in hashable]), F.lit(salt_buckets))
        .cast("int"),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
