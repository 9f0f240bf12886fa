"""Yen's K shortest loopless paths — the `gds.shortestPath.yens` verb.

Neo4j GDS ships Yen's algorithm beside Dijkstra on the same procedure
surface the reference's host platform exposes (the precedent used for
the shortestPath/spanningTree verbs; reference scope itself is the PPR
family, e.g. Fora_Query.java).  Yen is a driver-orchestrated loop by
nature — path k+1 is chosen from spur deviations off path k — but each
iteration's inner work distributes completely:

* ALL spur computations of one iteration run as ONE batched multi-state
  SSSP superstep loop (the `sssp_weighted_multi` landmark-batching
  pattern): state is (qid, node, dist, path), one row per spur query per
  reached node, merged per (qid, node) by MIN(struct(dist, path)) — the
  struct order makes every tie deterministic (lowest cost, then
  lexicographically-smallest node array, in both engines).
* Per-spur graph edits are BROADCAST EXCLUSION TABLES, not edge-table
  rewrites: banned nodes (the spur's root prefix) and banned edges (the
  root's continuations along already-accepted paths) are O(K * path_len)
  rows anti-joined against candidate extensions — the edge table itself
  is never copied or filtered per spur.
* Paths ride along as array columns bounded by the hop budget, so
  "reconstruct the path" is free and looplessness is one
  array_contains filter.

Driver traffic per iteration: one <= path_len-row seed createDataFrame
and one <= path_len-row candidate collect — the same bounded-artifact
class as the trainer collects elsewhere in the engine.  No per-round
emptiness probe: the loop is hop-bounded by a small max_hops.

Semantics: the K cheapest SIMPLE paths of at most ``max_hops`` hops
from source to target under the strict (cost, path) total order.  With
positive integer costs this equals the top-K of brute-force simple-path
enumeration — which is exactly what the DuckDB oracle does
(`kpaths_oracle_sql`), making the gate a true cross-algorithm check:
Spark runs Yen, the oracle never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LOCAL_EDGE_THRESHOLD
from ..plans.iterative import (
    loop_shuffle_partitions,
    static_superstep_plan,
    stats_reset_checkpoint,
)

_STATE_SCHEMA = "qid int, node long, dist long, path array<long>"


def _batched_path_sssp_local(
    adj: dict,
    seeds: list[tuple[int, int, int, list[int]]],
    banned_nodes: list[tuple[int, int]],
    banned_edges: list[tuple[int, int, int]],
    target: int,
    max_hops: int,
) -> list[tuple[int, int, list[int]]]:
    """Driver-local literal replay of ``_batched_path_sssp``'s superstep
    recurrence (the LocalGraph precedent, graph.py): same loopless/hop
    filters, same per-(qid, node) min over the (dist, path) total order —
    Python tuple/list comparison IS the Spark struct/array order for
    integer fields — same full-round count, so the returned candidate set
    is identical row for row.  Used when the (already materialized) edge
    list fits the driver; above the gate the Spark loop runs unchanged."""
    bn = set(banned_nodes)
    be = set(banned_edges)
    state: dict[tuple[int, int], tuple[int, list[int]]] = {
        (q, n): (d, list(p)) for q, n, d, p in seeds
    }
    frontier = dict(state)
    for _ in range(max_hops):
        ext: dict[tuple[int, int], tuple[int, list[int]]] = {}
        for (q, u), (d, p) in frontier.items():
            if len(p) > max_hops:
                continue
            for v, w in adj.get(u, ()):
                if v in p or (q, v) in bn or (q, u, v) in be:
                    continue
                cand = (d + w, p + [v])
                k = (q, v)
                if k not in ext or cand < ext[k]:
                    ext[k] = cand
        frontier = {}
        for k, cand in ext.items():
            old = state.get(k)
            if old is None or cand < old:
                state[k] = cand
                frontier[k] = cand
    return [
        (q, d, p) for (q, n), (d, p) in state.items() if n == target
    ]


def _batched_path_sssp(
    spark: SparkSession,
    edges: DataFrame,
    seeds: list[tuple[int, int, int, list[int]]],
    banned_nodes: list[tuple[int, int]],
    banned_edges: list[tuple[int, int, int]],
    target: int,
    max_hops: int,
    n_hint: int,
) -> list[tuple[int, int, list[int]]]:
    """Run every spur query of one Yen iteration in one superstep loop.

    ``seeds``: (qid, node, dist, path) initial states — the spur's root
    prefix, cost included.  ``banned_nodes``/``banned_edges``: per-qid
    exclusions (broadcast anti-joined).  Returns the per-qid best
    (dist, path) rows that reached ``target``, hop-bounded so every
    emitted path has at most ``max_hops`` edges."""
    state = spark.createDataFrame(
        [(q, n, d, p) for q, n, d, p in seeds], _STATE_SCHEMA
    )
    bn = spark.createDataFrame(
        banned_nodes or [(-1, -1)], "qid int, node long"
    )
    be = spark.createDataFrame(
        banned_edges or [(-1, -1, -1)], "qid int, src long, dst long"
    )
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, n_hint)):
        state = stats_reset_checkpoint(state)
        frontier = state
        for _ in range(max_hops):
            ext = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .where(
                    (~F.array_contains("path", F.col("dst")))
                    & (F.size("path") <= F.lit(max_hops))
                )
                .join(
                    F.broadcast(bn.select("qid", F.col("node").alias("dst"))),
                    ["qid", "dst"],
                    "left_anti",
                )
                .join(F.broadcast(be), ["qid", "src", "dst"], "left_anti")
                .groupBy("qid", F.col("dst").alias("node"))
                .agg(
                    F.min(
                        F.struct(
                            (F.col("dist") + F.col("w")).alias("dist"),
                            F.array_append("path", F.col("dst")).alias("path"),
                        )
                    ).alias("c")
                )
            )
            merged = (
                state.join(
                    ext.select(
                        "qid", "node", F.col("c.dist").alias("cdist"),
                        F.col("c.path").alias("cpath"),
                    ),
                    ["qid", "node"],
                    "full_outer",
                )
                .select(
                    "qid",
                    "node",
                    F.struct("dist", "path").alias("old"),
                    F.struct(
                        F.col("cdist").alias("dist"), F.col("cpath").alias("path")
                    ).alias("new"),
                )
                .select(
                    "qid",
                    "node",
                    F.when(
                        F.col("old.dist").isNull()
                        | (F.col("new.dist").isNotNull() & (F.col("new") < F.col("old"))),
                        F.col("new"),
                    )
                    .otherwise(F.col("old"))
                    .alias("best"),
                    (
                        F.col("old.dist").isNull()
                        | (F.col("new.dist").isNotNull() & (F.col("new") < F.col("old")))
                    ).alias("improved"),
                )
                .select(
                    "qid",
                    "node",
                    F.col("best.dist").alias("dist"),
                    F.col("best.path").alias("path"),
                    "improved",
                )
            )
            merged = stats_reset_checkpoint(merged)
            frontier = merged.where("improved").select(
                "qid", "node", "dist", "path"
            )
            state = merged.select("qid", "node", "dist", "path")
            # no per-round emptiness probe: the loop is hop-bounded by a
            # SMALL max_hops (a k-paths query is a short-chain verb), so
            # the probe's per-round job costs more than the bounded tail
            # of no-op rounds it could save
    return [
        (int(r["qid"]), int(r["dist"]), [int(x) for x in r["path"]])
        for r in state.where(F.col("node") == target).collect()
    ]


def yen_k_shortest(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    target: int,
    k: int = 3,
    max_hops: int = 6,
    n_hint: int | None = None,
) -> DataFrame:
    """(rank, cost, path): the ``k`` cheapest simple source->target paths
    of at most ``max_hops`` hops over a positive-integer-weighted edge
    list (src, dst, w), in strict (cost, path) order; path rendered as
    "a->b->c".  Fewer than ``k`` rows when the graph has fewer such
    paths."""
    # materialize the edge list ONCE: every Yen iteration (spur batch,
    # root-cost lookup) reuses it — without this the derivation (e.g. a
    # kNN build) would re-run per batched SSSP call
    edges = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    out_schema = "rank int, cost long, path string"

    # Driver-local replay under the LocalGraph edge cutoff: every Yen
    # iteration then costs zero Spark jobs instead of max_hops checkpointed
    # supersteps + a candidate collect.  Above the gate the superstep loop
    # below runs unchanged — the 100x plan.
    adj: dict | None = None
    wmap: dict = {}
    if edges.count() <= LOCAL_EDGE_THRESHOLD:
        adj = {}
        for r in edges.toPandas().itertuples(index=False):
            s_, d_, w_ = int(r.src), int(r.dst), int(r.w)
            adj.setdefault(s_, []).append((d_, w_))
            wmap[(s_, d_)] = min(w_, wmap.get((s_, d_), w_))
    else:
        n_hint = n_hint or max(1, edges.select("src").distinct().count())

    def _sssp(seeds, bnodes, bedges):
        if adj is not None:
            return _batched_path_sssp_local(
                adj, seeds, bnodes, bedges, int(target), max_hops
            )
        return _batched_path_sssp(
            spark, edges, seeds, bnodes, bedges, int(target), max_hops, n_hint
        )

    first = _sssp([(0, int(source), 0, [int(source)])], [], [])
    if not first:
        return spark.createDataFrame([], out_schema)
    accepted: list[tuple[int, list[int]]] = [
        (first[0][1], first[0][2])
    ]
    pool: dict[tuple[int, ...], int] = {}

    # per-edge costs of accepted paths, for exact root-prefix costs; the
    # lookup is a bounded collect over <= k * max_hops ordered pairs
    # (free when the edge list is already on the driver)
    def _edge_costs(path: list[int]) -> list[int]:
        pairs = list(zip(path, path[1:]))
        if adj is not None:
            return [wmap[p] for p in pairs]
        cond = None
        for u, v in pairs:
            c = (F.col("src") == u) & (F.col("dst") == v)
            cond = c if cond is None else (cond | c)
        rows = edges.where(cond).collect()
        w = {(int(r["src"]), int(r["dst"])): int(r["w"]) for r in rows}
        return [w[p] for p in pairs]

    while len(accepted) < k:
        prev = accepted[-1][1]
        costs = _edge_costs(prev)
        seeds, bnodes, bedges = [], [], []
        for i in range(len(prev) - 1):
            root = prev[: i + 1]
            seeds.append((i, root[-1], sum(costs[:i]), root))
            bnodes.extend((i, n) for n in root[:-1])
            for _, p in accepted:
                if p[: i + 1] == root and len(p) > i + 1:
                    bedges.append((i, p[i], p[i + 1]))
        cands = _sssp(seeds, bnodes, bedges)
        done = {tuple(p) for _, p in accepted}
        for _, dist, path in cands:
            key = tuple(path)
            if key not in done:
                pool[key] = dist
        if not pool:
            break
        best = min(pool.items(), key=lambda kv: (kv[1], kv[0]))
        del pool[best[0]]
        accepted.append((best[1], list(best[0])))

    return spark.createDataFrame(
        [
            (i + 1, c, "->".join(str(n) for n in p))
            for i, (c, p) in enumerate(accepted)
        ],
        out_schema,
    )


def kpaths_oracle_sql(
    edges_sql: str,
    source_sql: str,
    target_sql: str,
    k: int = 3,
    max_hops: int = 6,
) -> str:
    """DuckDB twin by a DIFFERENT algorithm: enumerate every simple
    source->target path of <= max_hops hops with a recursive CTE and take
    the top-k under the identical (cost, path) order (integer-list
    comparison is lexicographic in both engines)."""
    return f"""
WITH RECURSIVE kp_s AS (SELECT CAST(({source_sql}) AS BIGINT) AS s),
kp_t AS (SELECT CAST(({target_sql}) AS BIGINT) AS t),
kp_e AS MATERIALIZED (SELECT src, dst, w FROM ({edges_sql}) q),
kp_walks AS (
  SELECT [s] AS path, CAST(0 AS BIGINT) AS cost, s AS node, 1 AS n FROM kp_s
  UNION ALL
  SELECT list_append(w.path, e.dst), w.cost + e.w, e.dst, w.n + 1
  FROM kp_walks w JOIN kp_e e ON e.src = w.node
  WHERE NOT list_contains(w.path, e.dst) AND w.n <= {max_hops}
),
kp_top AS (
  SELECT cost, path FROM kp_walks, kp_t WHERE node = t
  ORDER BY cost, path LIMIT {k}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cost, path) AS INT) AS rank,
       cost, array_to_string(path, '->') AS path
FROM kp_top
"""
