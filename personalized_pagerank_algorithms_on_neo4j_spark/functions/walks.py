"""Graph sampling for GNN / graph-embedding training pipelines.

Two verbs a training pipeline runs over a graph before any model sees it:

* ``sample_neighbors`` — GraphSAGE-style per-node fanout sampling: keep at
  most ``k`` neighbors per source node, chosen deterministically.  The
  sampler is the first stage of every mini-batch GNN pipeline; at 100 TB
  the only property that matters is that the choice is a pure function of
  (src, dst, seed) — reproducible across runs, partition layouts and
  engines, exactly like ``functions/sampling.py``'s corpus samplers.

* ``walk_corpus`` — DeepWalk-style random-walk corpus generation: one
  fixed-length walk per start node over the symmetrized graph, the text
  corpus that skip-gram embedding trainers consume.  The walk is
  deterministic (next hop = argmin over neighbors of a per-step portable
  hash), so the full path string is byte-comparable against a DuckDB
  replay — the same determinism discipline as the Monte-Carlo walk
  kernels (operators/monte_carlo.py) but with a hash in place of an RNG,
  which is what makes the walk *oracle-checkable* and replay-stable under
  task retries.

Both verbs key their choices off ``portable_hash`` (functions/text.py) —
the md5-based 48-bit hash shared with every DuckDB oracle in the repo.

Scale shape:

* ``sample_neighbors`` is one hash projection plus one per-src top-k
  (``row_number`` window).  The window shuffles the edge table once on
  ``src``; each partition group holds one node's adjacency, bounded by the
  max degree — the same per-key top-k shape as ``operators/topk.py``.
  Extreme hubs are a data problem, not a plan problem: compose with a hub
  cap upstream if a single adjacency list cannot fit one task.
* ``walk_corpus`` state is one row per walk; each of the L supersteps
  joins the O(walks) frontier against the cached symmetrized edge table
  and reduces per-walk with a ``MIN(struct(h, dst, path))`` aggregate —
  a map-side-combinable argmin, so the shuffle carries one row per
  (walk, partition) rather than the walks x degree candidate fan-out —
  under the iterative-loop discipline of plans/iterative.py (AQE off,
  state-scaled partitions, broadcast-gated frontier), identical to the
  PageRank/SSSP loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    SuperstepLoop,
    loop_shuffle_partitions,
    static_superstep_plan,
)
from .text import portable_hash

__all__ = [
    "sample_neighbors",
    "sample_neighbors_oracle_sql",
    "walk_corpus",
    "walk_corpus_oracle_sql",
]


def _edge_hash(src, dst, step: int, seed: int):
    """48-bit portable hash of one (src, dst, step) choice point."""
    payload = F.concat(
        src.cast("string"),
        F.lit("|"),
        dst.cast("string"),
        F.lit("|"),
        F.lit(str(step)),
    )
    return portable_hash(payload, seed)


def _edge_hash_sql(src: str, dst: str, step: str, seed: int) -> str:
    """DuckDB twin of ``_edge_hash`` (same md5 payload, same 48-bit slice)."""
    payload = (
        f"CAST({src} AS VARCHAR) || '|' || CAST({dst} AS VARCHAR) "
        f"|| '|' || {step}"
    )
    return (
        f"CAST(('0x' || substring(md5({payload} || '#' || '{seed}'), 1, 12)) "
        f"AS BIGINT)"
    )


def sample_neighbors(edges: DataFrame, k: int = 5, seed: int = 0) -> DataFrame:
    """(src, dst, sample_rank): at most ``k`` out-neighbors per source,
    ranked by the portable per-edge hash — the GraphSAGE fanout sampler.

    Deterministic and consistent: a neighbor's keep/drop verdict depends
    only on (src, dst, seed) and the node's other neighbors, never on
    partitioning or row order; re-running over a grown graph re-ranks only
    the nodes whose adjacency actually changed.  Ties (astronomically
    unlikely in 48 bits) break on ``dst`` so the order stays total."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    h = _edge_hash(F.col("src"), F.col("dst"), 0, seed)
    w = Window.partitionBy("src").orderBy(h.asc(), F.col("dst").asc())
    return (
        e.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.lit(k))
        .select("src", "dst", F.col("sample_rank").cast("int").alias("sample_rank"))
    )


def sample_neighbors_oracle_sql(edges_sql: str, k: int = 5, seed: int = 0) -> str:
    """DuckDB twin of ``sample_neighbors`` over any (src, dst) edge SQL."""
    h = _edge_hash_sql("src", "dst", "'0'", seed)
    return f"""
WITH raw AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
ranked AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY {h}, dst) AS sample_rank
  FROM e
)
SELECT src, dst, CAST(sample_rank AS INTEGER) AS sample_rank
FROM ranked WHERE sample_rank <= {k}
"""


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: both directions of every edge, self-loops dropped,
    distinct — the graph DeepWalk walks on."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionAll(rev).where(F.col("src") != F.col("dst")).distinct()


def walk_corpus(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    seed: int = 0,
) -> DataFrame:
    """(walk_id, end_node, path): one ``length``-hop deterministic walk per
    node over the symmetrized graph — the DeepWalk corpus generator.

    Next hop from ``cur`` at step ``t`` is the neighbor minimizing
    ``portable_hash(cur|dst|t, seed)`` (ties on ``dst``): a pure function
    of the adjacency, so the walk replays identically under task retries,
    repartitioning, and in the DuckDB oracle.  Step ``t`` participates in
    the hash so the walk is not a fixed successor map — revisiting a node
    at a different step can exit differently, which is what gives the
    corpus path diversity (a hash-greedy walk without ``t`` collapses
    into cycles of a single successor function).

    Every node of the symmetrized graph has degree >= 1, so walks never
    die; ``path`` is the ``->``-joined node sequence (length+1 ids) —
    the sentence an embedding trainer consumes."""
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    und = _symmetrize(edges).localCheckpoint(eager=True)  # read every superstep
    state = (
        und.select("src")
        .distinct()
        .select(
            F.col("src").alias("walk_id"),
            F.col("src").alias("cur"),
            F.col("src").cast("string").alias("path"),
        )
    )
    n_walks = state.count()
    loop = SuperstepLoop(checkpoint_every=4)
    small = n_walks <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, n_walks) if small else None
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        for t in range(1, length + 1):
            # The next hop from node v at step t is the SAME for every walk
            # currently at v (the hash keys on (v, dst, t), never walk_id),
            # so the superstep computes a successor map over the DISTINCT
            # occupied nodes and maps walks through it.  Two scale wins over
            # the naive frontier-x-adjacency expansion: the hash fan-out is
            # bounded by m (each adjacency list scored once, even when
            # thousands of walks pile onto one hub), and the argmin is a
            # MIN(struct(h, dst)) aggregate — map-side-combinable, so the
            # shuffle carries one row per (node, partition), never the
            # candidate fan-out a row_number window would sort.
            occ = state.select(F.col("cur").alias("v")).distinct()
            oj = F.broadcast(occ) if small else occ
            pick = F.struct(
                _edge_hash(F.col("v"), F.col("dst"), t, seed).alias("h"),
                F.col("dst").alias("dst"),
            )
            succ = (
                oj.join(und, oj.v == und.src)
                .groupBy("v")
                .agg(F.min(pick).alias("p"))
                .select("v", F.col("p.dst").alias("nxt"))
            )
            sj = F.broadcast(succ) if small else succ
            state = state.join(sj, state.cur == sj.v).select(
                "walk_id",
                F.col("nxt").alias("cur"),
                F.concat(
                    F.col("path"), F.lit("->"), F.col("nxt").cast("string")
                ).alias("path"),
            )
            state = loop.materialize(state)
    return state.select("walk_id", F.col("cur").alias("end_node"), "path")


def walk_corpus_oracle_sql(edges_sql: str, length: int = 8, seed: int = 0) -> str:
    """DuckDB twin of ``walk_corpus``: the same walk unrolled as ``length``
    chained CTEs, each replaying one argmin-hash hop."""
    ctes = [
        f"raw AS ({edges_sql})",
        """und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  ) WHERE src <> dst)""",
        """w0 AS (
  SELECT DISTINCT src AS walk_id, src AS cur, CAST(src AS VARCHAR) AS path
  FROM und)""",
    ]
    for t in range(1, length + 1):
        h = _edge_hash_sql("t.cur", "u.dst", f"'{t}'", seed)
        ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT walk_id, cur, path FROM (
    SELECT t.walk_id, u.dst AS cur,
           t.path || '->' || CAST(u.dst AS VARCHAR) AS path,
           ROW_NUMBER() OVER (PARTITION BY t.walk_id ORDER BY {h}, u.dst) AS rn
    FROM w{t - 1} t JOIN und u ON t.cur = u.src
  ) WHERE rn = 1)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT walk_id, cur AS end_node, path FROM w{length}
"""
