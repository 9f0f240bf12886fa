"""Weisfeiler-Lehman color refinement — structural node fingerprints.

The 1-WL (color refinement) iteration labels every node by the multiset
of its neighbours' previous labels; after k rounds, two nodes share a
color only if their k-hop neighbourhood structures are indistinguishable
to 1-WL.  It is the standard structural fingerprint for graph dedup /
near-isomorphism screening (WL graph kernels) and the theoretical
ceiling of message-passing GNN expressiveness — the natural companion to
this engine's FastRP/node2vec embeddings for a corpus of many small
graphs or for role discovery on one large graph.

Exact-integer contract: the multiset combine is a SUM of per-neighbour
hashes — commutative, so no sort and no collect_list; deterministic and
bit-identical in both engines.  Colors live in [0, 2^31): with
h(c) < 2^31, a degree-D sum is < D * 2^31, BIGINT-safe for any D < 2^32
(ANSI mode throws loudly beyond).  Sum-combine is a (documented)
relaxation of the injective multiset hash — colliding multisets can
share a color — which only ever MERGES refinement classes, never splits
one, so equal-structure nodes still always agree.

Rounds are FIXED (not convergence-driven): fixed-depth refinement is the
standard kernel usage, and it makes the DuckDB twin an exact unroll of
the same rounds.

Scale shape: round state is one (node, color) frame; each round is one
edges⋈colors equi join + one node-keyed sum aggregate — the identical
partitioning profile as the engine's PageRank supersteps — run under the
superstep discipline with stats-reset checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.iterative import (
    loop_shuffle_partitions,
    static_superstep_plan,
    stats_reset_checkpoint,
)

WL_MOD = 2_147_483_647  # 2^31 - 1 (prime): colors stay below 2^31
WL_MIX = 2_654_435_761  # Knuth multiplicative mix
WL_STEP = 1_000_003


def _h(col):
    return (F.col(col) % WL_MOD * WL_MIX) % WL_MOD


def wl_colors(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """(node, color): 1-WL refinement colors after ``rounds`` iterations
    over the UNDIRECTED reading of ``edges(src, dst)``.

    color_0 = degree; color_{t+1} = (color_t * WL_STEP +
    sum over neighbours of h(color_t(neighbour))) % WL_MOD."""
    spark = edges.sparkSession
    und = stats_reset_checkpoint(
        edges.select(F.col("src").cast("long").alias("a"),
                     F.col("dst").cast("long").alias("b"))
        .unionAll(
            edges.select(F.col("dst").cast("long").alias("a"),
                         F.col("src").cast("long").alias("b"))
        )
    )
    colors = stats_reset_checkpoint(
        und.groupBy(F.col("a").alias("node")).agg(
            (F.count("*") % WL_MOD).alias("color")
        )
    )
    n0 = colors.count()
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, n0)):
        for _ in range(int(rounds)):
            nb = (
                und.join(
                    colors.select(
                        F.col("node").alias("b"), _h("color").alias("_hc")
                    ),
                    "b",
                )
                .groupBy(F.col("a").alias("node"))
                .agg(F.sum("_hc").alias("_s"))
            )
            colors = stats_reset_checkpoint(
                colors.join(nb, "node").select(
                    "node",
                    (
                        (F.col("color") * WL_STEP + F.col("_s")) % WL_MOD
                    ).alias("color"),
                )
            )
    return colors


def wl_oracle_sql(edges_sql: str, rounds: int = 3) -> str:
    """DuckDB twin: the identical recurrence unrolled to ``rounds`` CTEs.
    SUM over BIGINT returns HUGEINT in DuckDB — reduced mod WL_MOD before
    the cast, matching Spark's in-range BIGINT sum exactly."""
    parts = [
        f"""WITH wl_und AS MATERIALIZED (
  SELECT CAST(src AS BIGINT) AS a, CAST(dst AS BIGINT) AS b FROM ({edges_sql}) we
  UNION ALL
  SELECT CAST(dst AS BIGINT), CAST(src AS BIGINT) FROM ({edges_sql}) we
),
wl_c0 AS MATERIALIZED (
  SELECT a AS node, CAST(COUNT(*) % {WL_MOD} AS BIGINT) AS color
  FROM wl_und GROUP BY a
)"""
    ]
    for r in range(int(rounds)):
        parts.append(f""",
wl_c{r + 1} AS MATERIALIZED (
  SELECT c.node,
         CAST((c.color * {WL_STEP} + s.hsum) % {WL_MOD} AS BIGINT) AS color
  FROM wl_c{r} c
  JOIN (
    SELECT u.a AS node,
           CAST(SUM(cc.color % {WL_MOD} * {WL_MIX} % {WL_MOD}) % {WL_MOD} AS BIGINT) AS hsum
    FROM wl_und u JOIN wl_c{r} cc ON u.b = cc.node
    GROUP BY u.a
  ) s ON s.node = c.node
)""")
    parts.append(f"\nSELECT node, color FROM wl_c{int(rounds)}")
    return "".join(parts)
