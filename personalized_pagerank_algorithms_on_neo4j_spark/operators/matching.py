"""Distributed maximal matching — greedy hash-priority edge selection
(the Israeli-Itai 1986 / locally-greedy family, made deterministic with
the engine's portable md5 priorities, exactly like the Luby MIS).

Round r over the UNDIRECTED active edge set (edges whose BOTH endpoints
are still unmatched):
  priority(e=(u,v), u<v) = (portable_hash("u_v", seed*1000 + r), u, v);
  e joins the matching iff its priority is the MINIMUM among active
  edges at BOTH endpoints (a strict total order makes the local minimum
  unique, so two winners can never share an endpoint);
  winners' endpoints leave, incident edges deactivate.

Maximality: an edge only deactivates when an endpoint gets matched, so
every unmatched edge has a matched endpoint.  Expected rounds are
O(log m); the loop raises past ``max_rounds`` instead of returning a
non-maximal matching (the strict-mode discipline), and the oracle
unrolls exactly ``max_rounds`` rounds — no-ops once the active set is
empty.  The pipeline use: pairing near-duplicate documents one-to-one
(each doc merged with at most one partner), the matching-not-clustering
flavor of dedup.

Scale shape per round: explode each active edge to its two endpoint
rows, one (node)-keyed MIN aggregate, two joins back — edge-bounded
state that strictly shrinks."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash
from ..plans.iterative import (
    loop_shuffle_partitions,
    static_superstep_plan,
    stats_reset_checkpoint,
)


def maximal_matching(
    edges: DataFrame,
    seed: int = 37,
    max_rounds: int = 8,
) -> DataFrame:
    """(u, v): a maximal matching of the undirected simple view of
    ``edges`` (src, dst) — u < v per pair, no two pairs share a node,
    every unmatched edge touches a matched node.  Deterministic for a
    given ``seed`` (module doc)."""
    spark = edges.sparkSession
    active = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    m0 = active.count()
    won_frames: list[DataFrame] = []
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, m0 * 2)):
        active = stats_reset_checkpoint(active)
        for r in range(max_rounds):
            if active.isEmpty():
                break
            pri = active.select(
                "u",
                "v",
                F.struct(
                    portable_hash(
                        F.concat_ws("_", F.col("u"), F.col("v")),
                        seed * 1000 + r,
                    ).alias("h"),
                    F.col("u").alias("pu"),
                    F.col("v").alias("pv"),
                ).alias("p"),
            )
            ep = pri.select(F.col("u").alias("node"), "p").unionAll(
                pri.select(F.col("v").alias("node"), "p")
            )
            node_min = ep.groupBy("node").agg(F.min("p").alias("pmin"))
            winners = (
                pri.join(
                    node_min.select(F.col("node").alias("u"), F.col("pmin").alias("mu")),
                    "u",
                )
                .join(
                    node_min.select(F.col("node").alias("v"), F.col("pmin").alias("mv")),
                    "v",
                )
                .where((F.col("p") == F.col("mu")) & (F.col("p") == F.col("mv")))
                .select("u", "v")
            )
            winners = stats_reset_checkpoint(winners)
            won_frames.append(winners)
            matched = winners.select(F.col("u").alias("node")).unionAll(
                winners.select(F.col("v").alias("node"))
            )
            active = stats_reset_checkpoint(
                active.join(
                    matched.select(F.col("node").alias("u")), "u", "left_anti"
                ).join(
                    matched.select(F.col("node").alias("v")), "v", "left_anti"
                )
            )
        else:
            if not active.isEmpty():
                raise RuntimeError(
                    f"maximal_matching did not converge in {max_rounds} rounds"
                )
    from ._result import union_frames

    return union_frames(won_frames, spark, "u long, v long")


def matching_oracle_sql(
    edges_sql: str,
    seed: int = 37,
    max_rounds: int = 8,
) -> str:
    """DuckDB twin: ``max_rounds`` unrolled rounds with the identical
    md5 edge priorities and both-endpoint-minimum win rule."""

    def h(r: int) -> str:
        return (
            "CAST(('0x' || substring(md5(CAST(u AS VARCHAR) || '_' || "
            f"CAST(v AS VARCHAR) || '#' || '{seed * 1000 + r}'), 1, 12)) AS BIGINT)"
        )

    ctes = [
        f"""mm_a0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM ({edges_sql}) e WHERE src <> dst)"""
    ]
    win_parts = []
    for r in range(max_rounds):
        ctes.append(
            f"""mm_p{r} AS MATERIALIZED (
  SELECT u, v, ROW({h(r)}, u, v) AS p FROM mm_a{r})"""
        )
        ctes.append(
            f"""mm_n{r} AS MATERIALIZED (
  SELECT node, MIN(p) AS pmin FROM (
    SELECT u AS node, p FROM mm_p{r}
    UNION ALL
    SELECT v AS node, p FROM mm_p{r}
  ) q GROUP BY 1)"""
        )
        ctes.append(
            f"""mm_w{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM mm_p{r} e
  JOIN mm_n{r} a ON a.node = e.u
  JOIN mm_n{r} b ON b.node = e.v
  WHERE e.p = a.pmin AND e.p = b.pmin)"""
        )
        ctes.append(
            f"""mm_a{r + 1} AS (
  SELECT u, v FROM mm_a{r}
  WHERE u NOT IN (SELECT u FROM mm_w{r} UNION ALL SELECT v FROM mm_w{r})
    AND v NOT IN (SELECT u FROM mm_w{r} UNION ALL SELECT v FROM mm_w{r}))"""
        )
        win_parts.append(f"SELECT u, v FROM mm_w{r}")
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(win_parts)
    )
