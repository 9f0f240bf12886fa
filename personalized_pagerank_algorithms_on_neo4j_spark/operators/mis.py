"""Luby's maximal independent set — the classic O(log n)-round
distributed symmetry-breaking primitive (Luby 1986), deterministic here
via per-round seeded hash priorities (the engine's portable md5 hash, so
Spark and the DuckDB oracle draw IDENTICAL priorities and the result is
exact, not statistical).

Round r over the UNDIRECTED active graph:
  priority(v) = (portable_hash(v, seed*1000 + r), v)   — a strict total
  order (the node id breaks hash collisions);
  v joins the MIS iff its priority is smaller than every ACTIVE
  neighbour's priority (isolated active nodes join unconditionally);
  winners and their neighbours deactivate.

Independence: two adjacent winners would each need the smaller priority
— impossible under a strict order.  Maximality: a node only deactivates
as a winner or a winner's neighbour, so every non-member has a member
neighbour.  Expected rounds are O(log n) (Luby); the loop raises
RuntimeError past ``max_rounds`` instead of returning a non-maximal set
(the strict-mode discipline of the k-core/DAG loops), and the oracle
unrolls exactly ``max_rounds`` rounds — no-ops once the active set is
empty, so any Spark early exit below the budget stays hash-equal.

Scale shape per round: one broadcast-gated join of the active-edge view
with the priority frame, one (node)-keyed MIN aggregate, two anti-joins
to deactivate.  State is node-bounded and strictly shrinks every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LOCAL_EDGE_THRESHOLD
from ..functions.text import portable_hash
from ..plans.iterative import (
    loop_shuffle_partitions,
    static_superstep_plan,
    stats_reset_checkpoint,
)


def _undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def luby_mis(
    nodes: DataFrame,
    edges: DataFrame,
    seed: int = 29,
    max_rounds: int = 12,
) -> DataFrame:
    """(node, in_mis): Luby's maximal independent set over the undirected
    view of ``edges`` (src, dst), covering every node in ``nodes``
    (column `node`; isolated nodes always join).  Deterministic for a
    given ``seed`` (module doc)."""
    spark = nodes.sparkSession
    und = _undirected(edges)
    active = nodes.select("node")
    n0 = active.count()
    mis = _luby_mis_core(spark, und, active, n0, seed, max_rounds)
    return nodes.select("node").join(
        mis.select("node", F.lit(True).alias("in_mis")), "node", "left"
    ).select("node", F.coalesce("in_mis", F.lit(False)).alias("in_mis"))


def _luby_mis_core(
    spark: SparkSession,
    und: DataFrame,
    active: DataFrame,
    n_hint: int,
    seed: int,
    max_rounds: int,
) -> DataFrame:
    """The Luby round loop over a pre-materialized undirected edge view;
    returns the MIS members as a (node) frame."""
    # Driver-local kernel under the edge cutoff (the louvain/lpa idiom):
    # Luby's rounds are pure integer logic over md5 priorities — the
    # EXACT same 48-bit hashes the Spark expressions draw — so the replay
    # is bit-identical, round for round, including the strict raise.
    # Replaces ~6 Spark jobs per round (priority build, semi+inner join,
    # min aggregate, two checkpoints, the anti-join); the coloring
    # operator pays that per LAYER.  Above the gate the loop below runs
    # unchanged.
    if und.count() <= LOCAL_EDGE_THRESHOLD:
        return _luby_mis_local(spark, und, active, seed, max_rounds)
    mis_frames: list[DataFrame] = []
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, n_hint)):
        active = stats_reset_checkpoint(active)
        for r in range(max_rounds):
            if active.isEmpty():
                break
            pri = active.select(
                "node",
                portable_hash(F.col("node"), seed * 1000 + r).alias("h"),
            )
            # smallest active-neighbour priority per active node: keep only
            # edges whose BOTH endpoints are active, carry the dst priority
            act_edges = (
                und.join(
                    pri.select(F.col("node").alias("src")), "src", "left_semi"
                )
                .join(
                    pri.select(
                        F.col("node").alias("dst"),
                        F.col("h").alias("nh"),
                    ),
                    "dst",
                )
            )
            nbr_min = act_edges.groupBy(F.col("src").alias("node")).agg(
                F.min(F.struct(F.col("nh").alias("h"), F.col("dst").alias("node"))).alias(
                    "nmin"
                )
            )
            winners = (
                pri.join(nbr_min, "node", "left")
                .where(
                    F.col("nmin").isNull()
                    | (
                        F.struct(F.col("h"), F.col("node"))
                        < F.col("nmin")
                    )
                )
                .select("node")
            )
            winners = stats_reset_checkpoint(winners)
            mis_frames.append(winners)
            removed = winners.unionAll(
                und.join(
                    winners.select(F.col("node").alias("src")), "src", "left_semi"
                ).select(F.col("dst").alias("node"))
            ).distinct()
            active = stats_reset_checkpoint(
                active.join(removed, "node", "left_anti")
            )
        else:
            if not active.isEmpty():
                raise RuntimeError(
                    f"luby_mis did not converge in {max_rounds} rounds"
                )
    from ._result import union_frames

    return union_frames(mis_frames, spark, "node long")


def _luby_mis_local(
    spark: SparkSession,
    und: DataFrame,
    active: DataFrame,
    seed: int,
    max_rounds: int,
) -> DataFrame:
    """Bit-exact numpy replay of the Luby round loop: same md5
    priorities, same (h, node) strict order, same winner/removal rule,
    same strict raise."""
    import hashlib

    import numpy as np
    import pandas as pd

    from .._nputil import lexsort_stable

    apd = active.select("node").toPandas()["node"].to_numpy(dtype=np.int64)
    ids = np.sort(apd, kind="stable")
    n = len(ids)
    epd = und.select("src", "dst").toPandas()
    es_o = epd["src"].to_numpy(dtype=np.int64)
    ed_o = epd["dst"].to_numpy(dtype=np.int64)
    es = np.searchsorted(ids, es_o)
    ed = np.searchsorted(ids, ed_o)
    # endpoints outside the ACTIVE node frame can never matter (the
    # active set only shrinks): drop those edges once
    ok = (
        (es < n)
        & (ed < n)
        & (ids[np.minimum(es, n - 1)] == es_o)
        & (ids[np.minimum(ed, n - 1)] == ed_o)
    )
    es, ed = es[ok], ed[ok]
    act = np.ones(n, dtype=bool)
    mis_parts: list[np.ndarray] = []

    def _hash48(vals: np.ndarray, s: int) -> np.ndarray:
        out = np.empty(len(vals), dtype=np.int64)
        suffix = f"#{s}".encode()
        md5 = hashlib.md5
        for i, v in enumerate(vals.tolist()):
            out[i] = int(
                md5(b"%d%s" % (v, suffix)).hexdigest()[:12], 16
            )
        return out

    for r in range(max_rounds):
        if not act.any():
            break
        h = np.full(n, -1, dtype=np.int64)
        av = np.nonzero(act)[0]
        h[av] = _hash48(ids[av], seed * 1000 + r)
        em = act[es] & act[ed]
        se, de = es[em], ed[em]
        # per-src min of (h[dst], dst): first row under (src, h, dst) —
        # the strict total order the struct-min aggregate encodes
        order = lexsort_stable((ids[de], h[de], se))
        ss, ds2 = se[order], de[order]
        first = np.ones(len(ss), dtype=bool)
        if len(ss):
            first[1:] = ss[1:] != ss[:-1]
        min_src = ss[first]
        min_h = h[ds2[first]]
        min_node = ids[ds2[first]]
        # winners: isolated actives, or (h, node) strictly below the min
        nh = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        nn = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        nh[min_src] = min_h
        nn[min_src] = min_node
        win = act & ((h < nh) | ((h == nh) & (ids < nn)))
        mis_parts.append(ids[win])
        # deactivate winners and every neighbour of a winner
        act = act & ~win
        act[ed[win[es]]] = False
    else:
        if act.any():
            raise RuntimeError(
                f"luby_mis did not converge in {max_rounds} rounds"
            )
    members = (
        np.concatenate(mis_parts) if mis_parts else np.empty(0, np.int64)
    )
    return spark.createDataFrame(
        pd.DataFrame({"node": members}), "node long"
    )


def jones_plassmann_coloring(
    nodes: DataFrame,
    edges: DataFrame,
    seed: int = 31,
    max_colors: int = 6,
    max_rounds: int = 12,
) -> DataFrame:
    """(node, color): greedy graph coloring by ITERATED MIS — the
    Jones-Plassmann (1993) distributed-coloring scheme: color c goes to a
    maximal independent set of the still-uncolored subgraph, so no two
    adjacent nodes ever share a color and every node is colored after at
    most max-degree+1 layers (usually far fewer).  Each layer reuses the
    Luby core with a layer-salted seed (seed*100 + c), so the whole
    coloring is deterministic and the oracle replays it exactly.

    Strict-mode discipline: raises past ``max_colors`` layers (or past
    ``max_rounds`` inside any layer) rather than returning a partial
    coloring; the paired oracle unrolls exactly these budgets, and layers
    past convergence see an empty active set — no-ops, so a Spark early
    exit stays hash-equal.  Budgets are a per-scale knob: the gate graph
    needs 4 layers, the sf0.1 graph 11 (measured)."""
    spark = nodes.sparkSession
    und = _undirected(edges)
    active = nodes.select("node")
    n0 = active.count()
    colored: list[DataFrame] = []
    for c in range(max_colors):
        if active.isEmpty():
            break
        mis = _luby_mis_core(
            spark, und, active, n0, seed * 100 + c, max_rounds
        )
        colored.append(
            mis.select("node", F.lit(c).cast("int").alias("color"))
        )
        # no checkpoint here: the core checkpoints its active frame on
        # entry, so one materialization per layer suffices
        active = active.join(mis, "node", "left_anti")
    else:
        if not active.isEmpty():
            raise RuntimeError(
                f"jones_plassmann_coloring needs more than {max_colors} colors"
            )
    from ._result import union_frames

    return union_frames(colored, spark, "node long, color int")


def _und_edges_cte(edges_sql: str) -> str:
    return f"""mis_e AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM ({edges_sql}) e1 WHERE src <> dst
    UNION
    SELECT dst, src FROM ({edges_sql}) e2 WHERE src <> dst
  ) u)"""


def _mis_round_ctes(
    pfx: str, seed: int, max_rounds: int
) -> tuple[list[str], str]:
    """The unrolled Luby rounds reading active set ``{pfx}a0`` against
    ``mis_e``; returns (ctes, winners-union CTE name ``{pfx}all``)."""

    def h(expr: str, r: int) -> str:
        return (
            f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR) || '#' || "
            f"'{seed * 1000 + r}'), 1, 12)) AS BIGINT)"
        )

    ctes: list[str] = []
    win_parts = []
    for r in range(max_rounds):
        ctes.append(
            f"""{pfx}p{r} AS MATERIALIZED (
  SELECT node, {h('node', r)} AS h FROM {pfx}a{r})"""
        )
        ctes.append(
            f"""{pfx}w{r} AS MATERIALIZED (
  SELECT p.node FROM {pfx}p{r} p
  LEFT JOIN (
    SELECT e.src AS node, MIN(ROW(q.h, q.node)) AS nmin
    FROM mis_e e
    JOIN {pfx}p{r} s ON s.node = e.src
    JOIN {pfx}p{r} q ON q.node = e.dst
    GROUP BY 1
  ) nm ON nm.node = p.node
  WHERE nm.nmin IS NULL OR ROW(p.h, p.node) < nm.nmin)"""
        )
        ctes.append(
            f"""{pfx}a{r + 1} AS (
  SELECT node FROM {pfx}a{r}
  WHERE node NOT IN (SELECT node FROM {pfx}w{r})
    AND node NOT IN (
      SELECT e.dst FROM mis_e e JOIN {pfx}w{r} w ON w.node = e.src
    ))"""
        )
        win_parts.append(f"SELECT node FROM {pfx}w{r}")
    ctes.append(f"{pfx}all AS (" + "\nUNION ALL\n".join(win_parts) + ")")
    return ctes, f"{pfx}all"


def luby_mis_oracle_sql(
    nodes_sql: str,
    edges_sql: str,
    seed: int = 29,
    max_rounds: int = 12,
) -> str:
    """DuckDB twin: ``max_rounds`` unrolled Luby rounds with the identical
    md5 priorities; rounds past convergence see an empty active set and
    are no-ops."""
    ctes = [
        _und_edges_cte(edges_sql),
        f"mis_a0 AS (SELECT node FROM ({nodes_sql}) n)",
    ]
    round_ctes, wins = _mis_round_ctes("mis_", seed, max_rounds)
    ctes.extend(round_ctes)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT n.node, (m.node IS NOT NULL) AS in_mis
FROM ({nodes_sql}) n LEFT JOIN {wins} m ON m.node = n.node
"""
    )


def coloring_oracle_sql(
    nodes_sql: str,
    edges_sql: str,
    seed: int = 31,
    max_colors: int = 6,
    max_rounds: int = 12,
) -> str:
    """DuckDB twin of `jones_plassmann_coloring`: ``max_colors`` unrolled
    MIS layers (each layer the unrolled Luby rounds with the layer-salted
    seed), colors assigned by layer index; layers past convergence see an
    empty active set and are no-ops."""
    ctes = [
        _und_edges_cte(edges_sql),
        f"col_c0_a0 AS (SELECT node FROM ({nodes_sql}) n)",
    ]
    parts = []
    for c in range(max_colors):
        pfx = f"col_c{c}_"
        round_ctes, wins = _mis_round_ctes(pfx, seed * 100 + c, max_rounds)
        ctes.extend(round_ctes)
        parts.append(f"SELECT node, {c} AS color FROM {wins}")
        if c < max_colors - 1:
            ctes.append(
                f"""col_c{c + 1}_a0 AS (
  SELECT node FROM {pfx}a0
  WHERE node NOT IN (SELECT node FROM {wins}))"""
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(parts)
    )
