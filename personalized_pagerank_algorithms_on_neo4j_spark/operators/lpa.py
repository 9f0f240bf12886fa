"""Synchronous label propagation — the `gds.labelPropagation` community verb.

The reference's graph lives in Neo4j, whose GDS library ships label
propagation next to the PageRank family it benchmarks (Neo4j_Method.java:35
calls into the same `gds.*` procedure surface); this module supplies that
verb over the engine's derived property graph with the repo's iterative
execution discipline (AQE off + state-scaled shuffle partitions inside the
loop, localCheckpoint lineage truncation, broadcast-gated state joins —
plans/iterative.py).

Semantics (deterministic synchronous variant): every node starts with its
own id as its label; each round every node adopts the label carried by the
PLURALITY of its (undirected, deduplicated) neighbors, ties broken toward
the SMALLEST label, isolated nodes keeping their current label. A fixed
round count keeps the recurrence replayable as chained CTEs — the DuckDB
oracle (`lpa_oracle_sql`) unrolls the identical rounds, and every quantity
is integral, so cross-engine equality is exact (no float rounding gate
needed).

Scale shape: per round ONE (node,label)-keyed count aggregate and ONE
node-keyed plurality pick — the pick is a `max(struct(c, -label, label))`
aggregate, not a window, so it partial-aggregates map-side and never sorts
a partition. The label vector is node-bounded: under
``BROADCAST_NODE_BOUND`` it broadcasts into the edge join so the
undirected edge table never re-exchanges; above the bound the edge join
shuffles on the session's cluster-sized partitioning (the 100x plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import PropertyGraph
from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    SuperstepLoop,
    loop_shuffle_partitions,
    static_superstep_plan,
)


def _lpa_numpy(src_arr, dst_arr, nodes_arr, rounds: int):
    """Driver-local replay of the plurality rounds below over the
    (src_arr, dst_arr) undirected deduplicated edge arrays, vectorized
    in numpy (the LocalGraph precedent).  All quantities are integral —
    the neighbor-label counts, the (count desc, label asc) pick, the
    keep-on-isolated rule — so the replay is bit-exact per round."""
    import numpy as np

    nodes = np.sort(nodes_arr.astype(np.int64), kind="stable")
    n = len(nodes)
    lab = np.arange(n, dtype=np.int64)  # label == own id initially
    if n == 0:
        return nodes, nodes

    def _idx(vals):
        pos = np.searchsorted(nodes, vals)
        ok = (pos < n) & (nodes[np.minimum(pos, n - 1)] == vals)
        return pos, ok

    src = np.asarray(src_arr, dtype=np.int64)
    dst = np.asarray(dst_arr, dtype=np.int64)
    pu, oku = _idx(src)
    pv, okv = _idx(dst)
    # endpoints outside the node table behave like the distributed loop:
    # a missing src contributes no vote (inner label join), a missing dst
    # has no labels row to update (left join keyed on labels)
    keep = oku & okv
    eu, ev = pu[keep], pv[keep]
    from .._nputil import group_count, pick_max_per_group

    for _ in range(rounds):
        if len(eu) == 0:
            break
        key = ev * n + lab[eu]
        # one stable-sort groupby + segment argmax — same (count desc,
        # label asc) pick the lexsort idiom encoded, without numpy's
        # default quicksort (pathological on SIMD-poor CPUs, _nputil)
        uniq, c = group_count(key)
        v = uniq // n
        lb = uniq % n
        pick = pick_max_per_group(v, lb, c)
        new = lab.copy()
        new[v[pick]] = lb[pick]
        lab = new
    return nodes, nodes[lab]


def label_propagation(graph: PropertyGraph, rounds: int = 5) -> DataFrame:
    """(node, label) after ``rounds`` synchronous plurality-update rounds
    over the undirected deduplicated edge set, seeded with label = node id.
    """
    spark = graph.spark
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    small = graph.n <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, graph.n) if small else None
    labels = graph.nodes.select(
        F.col("id").alias("node"), F.col("id").alias("label")
    )
    # Driver-local kernel under the LocalGraph cutoff (bit-exact integer
    # replay — see _lpa_numpy); above it the superstep loop below runs
    # unchanged — the 100x plan.  The undirected deduplicated edge view
    # derives from the CACHED CSR snapshot (one stable sort) instead of
    # a per-query Spark symmetrize job + 2m-row collect — on this class
    # of graph that was the dominant cost of the local path.
    if graph.fits_local():
        import numpy as np
        import pandas as pd

        from .._nputil import unique_stable

        lg = graph.local
        sm = lg.edge_src != lg.edge_dst
        a = np.concatenate([lg.edge_src[sm], lg.edge_dst[sm]])
        b = np.concatenate([lg.edge_dst[sm], lg.edge_src[sm]])
        uk = unique_stable(a * np.int64(lg.n) + b)
        nd, lb = _lpa_numpy(
            lg.ids[uk // lg.n], lg.ids[uk % lg.n], lg.ids, rounds
        )
        return spark.createDataFrame(
            pd.DataFrame({"node": nd, "label": lb}),
            "node long, label long",
        )
    loop = SuperstepLoop(checkpoint_every=2)
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        und = und.localCheckpoint(eager=True)
        labels = labels.localCheckpoint(eager=True)
        for _ in range(rounds):
            lj = F.broadcast(labels) if small else labels
            cnt = (
                und.join(lj, und.src == lj["node"])
                .groupBy(und.dst.alias("nbr_of"), F.col("label"))
                .agg(F.count(F.lit(1)).alias("c"))
            )
            # plurality pick with smallest-label tiebreak as ONE aggregate:
            # max over (count, -label) == max count then min label; the
            # third struct field carries the winner out without a re-join
            pick = (
                cnt.groupBy("nbr_of")
                .agg(
                    F.max(
                        F.struct(
                            F.col("c").alias("c"),
                            (-F.col("label")).alias("neg"),
                            F.col("label").alias("label"),
                        )
                    ).alias("m")
                )
                .select(F.col("nbr_of"), F.col("m.label").alias("new_label"))
            )
            pj = F.broadcast(pick) if small else pick
            labels = labels.join(
                pj, labels.node == pj["nbr_of"], "left"
            ).select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            labels = loop.materialize(labels)
    return labels.select("node", "label")


def lpa_oracle_sql(edges_sql: str, nodes_sql: str, rounds: int = 5) -> str:
    """DuckDB twin replaying the identical synchronous plurality rounds
    (window row_number pick — same max-count/min-label order the Spark
    struct-max encodes; all quantities integral, so equality is exact)."""
    ctes = [
        f"e_raw AS MATERIALIZED ({edges_sql})",
        """und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e_raw WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM e_raw WHERE src <> dst))""",
        f"""l0 AS MATERIALIZED (
  SELECT id AS node, id AS label FROM ({nodes_sql}))""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""cnt{i} AS (
  SELECT u.dst AS nbr_of, l.label, COUNT(*) AS c
  FROM und u JOIN l{i} l ON u.src = l.node
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""pick{i} AS (
  SELECT nbr_of, label AS new_label FROM (
    SELECT nbr_of, label,
           ROW_NUMBER() OVER (PARTITION BY nbr_of
                              ORDER BY c DESC, label ASC) AS rn
    FROM cnt{i})
  WHERE rn = 1)"""
        )
        ctes.append(
            f"""l{i + 1} AS MATERIALIZED (
  SELECT p.node, COALESCE(k.new_label, p.label) AS label
  FROM l{i} p LEFT JOIN pick{i} k ON p.node = k.nbr_of)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT node, label FROM l{rounds}
"""
