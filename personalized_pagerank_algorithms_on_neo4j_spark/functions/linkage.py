"""Fuzzy record linkage: blocked edit-distance name matching.

Entity resolution's candidate-variant step for training-data pipelines
(merging near-identical source/author/entity names before dedup or
aggregation).  Everything is built-in `pyspark.sql.functions`
(`F.levenshtein` is JVM-side and matches DuckDB's `levenshtein` exactly),
so every result has a DuckDB oracle twin.

Scale shape — the one that survives 100 TB:

1. The O(|data|) stage is a single partial-aggregated ``groupBy(lower
   (name))`` count, whose shuffle is bounded by |distinct names|, never
   by |rows|.
2. The quadratic stage (blocked self-join + Levenshtein filter) runs on
   the DISTINCT-NAME table only.  Blocks are keyed by the name's first
   token; a block larger than ``block_cap`` is excluded with a logged
   drop (the no-silent-caps rule, same discipline as the MinHash
   hot-bucket cap) — a hot token like "john" at corpus scale would emit
   O(k^2) pairs that no downstream verifier wants.
3. The join is left unhinted: AQE broadcasts the distinct-name side
   automatically while it fits (it does for any realistic name
   vocabulary) and falls back to a shuffle join when it does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Variant blocks larger than this are dropped from pairing (logged).  Far
# above any gate-scale block; tests guard the cap can never bind there.
NAME_BLOCK_CAP = 10_000


def name_variant_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 3,
    block_cap: int | None = NAME_BLOCK_CAP,
) -> DataFrame:
    """Candidate name-variant pairs: distinct lowercased names that share a
    first token and sit within Levenshtein distance ``max_dist``, each with
    its record count.

    Output: (name_a, name_b, dist int, n_a long, n_b long) with
    name_a < name_b.  Blocking contract (documented recall bound, standard
    for ER candidate generation): pairs whose names differ in their first
    token are NOT candidates — a variant pair must agree on its leading
    token exactly.
    """
    names = (
        df.select(F.lower(F.trim(F.col(name_col))).alias("nm"))
        .where(F.length("nm") > 0)
        .groupBy("nm")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("nm", "n", F.split(F.col("nm"), " +").getItem(0).alias("tok"))
    )
    if block_cap is not None:
        # EAGER like dedup._drop_hot_buckets: the names frame feeds the size
        # aggregate and both join sides; checkpoint once instead of three
        # re-derivations of the upstream count shuffle.
        names = names.localCheckpoint(eager=True)
        hot = (
            names.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .where(F.col("_sz") > block_cap)
            .localCheckpoint(eager=True)
        )
        dropped = hot.agg(F.count(F.lit(1)), F.sum("_sz")).first()
        if dropped[0]:
            import logging

            logging.getLogger(__name__).warning(
                "name_variant_pairs: dropped %d hot first-token blocks "
                "covering %d distinct names (block size > %d)",
                dropped[0], dropped[1], block_cap,
            )
        names = names.join(hot.select("tok"), ["tok"], "left_anti")
    a = names.select(
        F.col("tok"), F.col("nm").alias("name_a"), F.col("n").alias("n_a")
    )
    b = names.select(
        F.col("tok"), F.col("nm").alias("name_b"), F.col("n").alias("n_b")
    )
    return (
        a.join(b, ["tok"])
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
            "n_a",
            "n_b",
        )
        .where(F.col("dist") <= max_dist)
    )


def name_variant_oracle_sql(
    src_sql: str, name_col: str, max_dist: int = 3
) -> str:
    """DuckDB twin of `name_variant_pairs` — cap-free (the cap is
    guard-tested never to bind at the compare scale)."""
    return f"""
WITH d AS (
  SELECT lower(trim({name_col})) AS nm, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({src_sql}) GROUP BY 1
),
b AS (
  SELECT nm, n, string_split_regex(nm, ' +')[1] AS tok
  FROM d WHERE length(nm) > 0
)
SELECT a.nm AS name_a, b2.nm AS name_b,
       CAST(levenshtein(a.nm, b2.nm) AS INT) AS dist,
       a.n AS n_a, b2.n AS n_b
FROM b a JOIN b b2 ON a.tok = b2.tok AND a.nm < b2.nm
WHERE levenshtein(a.nm, b2.nm) <= {max_dist}
"""
