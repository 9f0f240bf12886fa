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
  builds a successor map over the DISTINCT occupied nodes (the hash keys
  on (node, dst, t), never walk_id) with a ``MIN(struct(h, dst))``
  aggregate — map-side combinable, fan-out bounded by m even when
  thousands of walks pile onto one hub — and maps walks through it,
  under the iterative-loop discipline of plans/iterative.py (AQE off,
  state-scaled partitions, broadcast-gated frontier), identical to the
  PageRank/SSSP loops.  ``node2vec_walk_corpus`` is the second-order
  variant: the map keys on (prev, cur) pairs and the hash is scaled by
  the node2vec class multiplier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.iterative import (
    BROADCAST_EDGE_BOUND,
    BROADCAST_NODE_BOUND,
    SuperstepLoop,
    loop_shuffle_partitions,
    static_superstep_plan,
)
from .graphstats import symmetrize_edges
from .text import portable_hash

__all__ = [
    "sample_neighbors",
    "sample_neighbors_oracle_sql",
    "walk_corpus",
    "walk_corpus_oracle_sql",
    "node2vec_walk_corpus",
    "node2vec_oracle_sql",
    "skipgram_pairs",
    "skipgram_oracle_sql",
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


def _edge_hash_col(src, dst, step_col, seed: int):
    """`_edge_hash` with the step as a COLUMN: casting an int column to
    string renders the same decimal text as the per-step literal, so the
    md5 payload — and therefore every pick — is identical."""
    payload = F.concat(
        src.cast("string"),
        F.lit("|"),
        dst.cast("string"),
        F.lit("|"),
        step_col.cast("string"),
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


# the graph both walk generators walk on: the shared undirected view
_symmetrize = symmetrize_edges

# gate for walk_corpus's single-pass successor-map plan (separate name so
# tests/plan captures can force the superstep loop without disturbing the
# loop's own broadcast gating)
_SINGLE_PASS_BOUND = BROADCAST_NODE_BOUND


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
    # Single-pass plan when the FULL (node, step) successor map is
    # broadcast-sized: the per-step successor is a pure function of the
    # adjacency (hash keys on (v, dst, t), never on walk state), so ONE
    # aggregate computes succ(v, t) for every node and step — the same
    # min(struct(hash, dst)) expression, the same "v|dst|t" hash payload —
    # and the walk becomes `length` chained broadcast joins in a single
    # job: 2 shuffles total (successor aggregate + nothing per step)
    # instead of 2 shuffles and ~4 jobs per step.  Unoccupied (v, t)
    # entries are computed but unused — identical walk output.
    if n_walks * length <= _SINGLE_PASS_BOUND:
        steps = spark.range(1, length + 1).select(
            F.col("id").cast("int").alias("t")
        )
        h_all = _edge_hash_col(F.col("src"), F.col("dst"), F.col("t"), seed)
        pick_all = F.struct(h_all.alias("h"), F.col("dst").alias("dst"))
        succ_all = (
            und.crossJoin(F.broadcast(steps))
            .groupBy("src", "t")
            .agg(F.min(pick_all).alias("p"))
            .select(
                F.col("src").alias("v"), "t", F.col("p.dst").alias("nxt")
            )
            .localCheckpoint(eager=True)
        )
        for t in range(1, length + 1):
            s_t = succ_all.where(F.col("t") == t).select("v", "nxt")
            state = state.join(
                F.broadcast(s_t), state.cur == s_t.v
            ).select(
                "walk_id",
                F.col("nxt").alias("cur"),
                F.concat(
                    F.col("path"), F.lit("->"), F.col("nxt").cast("string")
                ).alias("path"),
            )
        return state.select("walk_id", F.col("cur").alias("end_node"), "path")
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


def node2vec_walk_corpus(
    spark: SparkSession,
    edges: DataFrame,
    length: int = 8,
    seed: int = 0,
    p_mult: int = 4,
    q_mult: int = 2,
) -> DataFrame:
    """(walk_id, end_node, path): one ``length``-hop SECOND-ORDER biased
    walk per node — the deterministic analogue of node2vec's (p, q) walk
    (`gds.node2vec` on the reference's host platform; Grover & Leskovec,
    KDD'16).

    Bias without randomness: from ``cur`` with predecessor ``prev``, each
    candidate's 48-bit portable hash is SCALED by its node2vec class
    multiplier — ``p_mult`` for the backtrack (x == prev), 1 for a common
    neighbor of prev (BFS-ish), ``q_mult`` otherwise (DFS-ish) — and the
    argmin wins.  A larger multiplier makes a class proportionally less
    likely to hold the minimum, reproducing the 1/p / 1 / 1/q preference
    ordering as a pure function of the adjacency, so the walk is
    replay-stable and oracle-checkable exactly like ``walk_corpus``.  The
    first hop has no predecessor and is the plain first-order pick.
    Multipliers are capped at 16384 so the scaled key (48-bit hash x
    multiplier) stays under 2^62 — no BIGINT overflow in either engine.

    Scale shape: the successor map keys on DISTINCT occupied (prev, cur)
    pairs; candidates fan out per pair's adjacency and the common-neighbor
    flag is one broadcast-gated membership join against the edge table —
    the inherent second-order cost (first-order walks collapse on cur
    alone).  Multiplied keys stay in BIGINT (hash < 2^48, multiplier
    small)."""
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    if not (1 <= p_mult <= 16384 and 1 <= q_mult <= 16384):
        raise ValueError("p_mult and q_mult must be in [1, 16384]")
    und = _symmetrize(edges).localCheckpoint(eager=True)  # read every superstep
    n_edges = und.count()
    state = (
        und.select("src")
        .distinct()
        .select(
            F.col("src").alias("walk_id"),
            F.col("src").alias("prev"),
            F.col("src").alias("cur"),
            F.col("src").cast("string").alias("path"),
        )
    )
    n_walks = state.select("walk_id").count()
    loop = SuperstepLoop(checkpoint_every=4)
    small = n_walks <= BROADCAST_NODE_BOUND
    edge_small = n_edges <= BROADCAST_EDGE_BOUND
    loop_parts = loop_shuffle_partitions(spark, n_walks) if small else None
    nbr = und.select(
        F.col("src").alias("prev"), F.col("dst").alias("x"), F.lit(1).alias("is_nbr")
    )
    # Candidate pruning for the biased hops (t >= 2).  The scaled key is
    # mult * h with mult in {1, p_mult, q_mult} and h >= 0, so a candidate
    # with h > cmax * hmin(cur, t)  (cmax = max(p_mult, q_mult), hmin the
    # raw-hash minimum over cur's FULL adjacency) scores STRICTLY above
    # the hmin candidate's scaled key (<= cmax * hmin) no matter which
    # class either lands in — it can neither win nor tie, so dropping it
    # cannot change the argmin or its (h, x) tie-break.  With 48-bit
    # hashes ~cmax candidates per (cur, t) survive in expectation, so the
    # (prev, cur)-pair fan-out and the prev-neighbor membership join
    # carry ~cmax rows per pair instead of deg(cur) — the second-order
    # walk's dominant join shrinks by ~avg-degree at every scale.  The
    # survivor table is computed for ALL steps in ONE combinable
    # aggregate over the edge table (the walk_corpus single-pass trick:
    # h keys on (cur, x, t), never on walk state).
    cmax = max(p_mult, q_mult)
    pruned_all = None
    if length > 1:
        steps2 = spark.range(2, length + 1).select(
            F.col("id").cast("int").alias("t")
        )
        adj = und.crossJoin(F.broadcast(steps2)).select(
            "src",
            F.col("dst").alias("x"),
            "t",
            _edge_hash_col(F.col("src"), F.col("dst"), F.col("t"), seed).alias(
                "h"
            ),
        )
        hmin = adj.groupBy("src", "t").agg(F.min("h").alias("hmin"))
        hb = n_walks * (length - 1) <= BROADCAST_NODE_BOUND
        pruned_all = (
            adj.join(F.broadcast(hmin) if hb else hmin, ["src", "t"])
            .where(F.col("h") <= F.lit(cmax) * F.col("hmin"))
            .select(F.col("src").alias("cur"), "x", "t", "h")
            .localCheckpoint(eager=True)
        )
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        for t in range(1, length + 1):
            occ = state.select("prev", "cur").distinct()
            oj = F.broadcast(occ) if small else occ
            if t > 1:
                pr_t = pruned_all.where(F.col("t") == t).select(
                    "cur", "x", "h"
                )
                cand = oj.join(pr_t, "cur").select("prev", "cur", "x", "h")
                nj = F.broadcast(nbr) if edge_small else nbr
                cand = cand.join(nj, ["prev", "x"], "left")
                mult = (
                    F.when(F.col("x") == F.col("prev"), F.lit(p_mult))
                    .when(F.col("is_nbr") == 1, F.lit(1))
                    .otherwise(F.lit(q_mult))
                )
                pick = F.struct(
                    (F.col("h") * mult).alias("h"), F.col("x").alias("x")
                )
            else:
                # no predecessor yet: the plain first-order argmin over the
                # full adjacency (mult == 1 for every candidate)
                cand = oj.join(und, oj.cur == und.src).select(
                    "prev", "cur", F.col("dst").alias("x")
                )
                pick = F.struct(
                    _edge_hash(F.col("cur"), F.col("x"), t, seed).alias("h"),
                    F.col("x").alias("x"),
                )
            succ = (
                cand.groupBy("prev", "cur")
                .agg(F.min(pick).alias("p"))
                .select("prev", "cur", F.col("p.x").alias("nxt"))
            )
            sj = F.broadcast(succ) if small else succ
            state = state.join(sj, ["prev", "cur"]).select(
                "walk_id",
                F.col("cur").alias("prev"),
                F.col("nxt").alias("cur"),
                F.concat(
                    F.col("path"), F.lit("->"), F.col("nxt").cast("string")
                ).alias("path"),
            )
            state = loop.materialize(state)
    return state.select("walk_id", F.col("cur").alias("end_node"), "path")


def node2vec_oracle_sql(
    edges_sql: str,
    length: int = 8,
    seed: int = 0,
    p_mult: int = 4,
    q_mult: int = 2,
) -> str:
    """DuckDB twin of ``node2vec_walk_corpus``: the identical biased hops
    unrolled as chained CTEs (hash x class multiplier, argmin per walk)."""
    ctes = [
        f"raw AS ({edges_sql})",
        """und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  ) WHERE src <> dst)""",
        """w0 AS (
  SELECT DISTINCT src AS walk_id, src AS prev, src AS cur,
         CAST(src AS VARCHAR) AS path
  FROM und)""",
    ]
    for t in range(1, length + 1):
        h = _edge_hash_sql("t.cur", "u.dst", f"'{t}'", seed)
        if t > 1:
            mult = (
                f"CASE WHEN u.dst = t.prev THEN {p_mult} "
                f"WHEN nb.src IS NOT NULL THEN 1 ELSE {q_mult} END"
            )
            nbjoin = "LEFT JOIN und nb ON nb.src = t.prev AND nb.dst = u.dst"
        else:
            mult = "1"
            nbjoin = ""
        ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT walk_id, prev, cur, path FROM (
    SELECT t.walk_id, t.cur AS prev, u.dst AS cur,
           t.path || '->' || CAST(u.dst AS VARCHAR) AS path,
           ROW_NUMBER() OVER (PARTITION BY t.walk_id
                              ORDER BY {h} * ({mult}), u.dst) AS rn
    FROM w{t - 1} t JOIN und u ON t.cur = u.src
    {nbjoin}
  ) WHERE rn = 1)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT walk_id, cur AS end_node, path FROM w{length}
"""


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n_pairs): skip-gram co-occurrence counts over a
    walk corpus — the training pairs a word2vec-style embedding trainer
    consumes, extracted from ``walk_corpus``/``node2vec_walk_corpus``
    output (any frame with a ``->``-joined ``path`` column of node ids).

    Join-free: for each offset d in 1..window the path's token array is
    zipped against its d-shifted self (both orientations emitted), so the
    whole extraction is per-row JVM array arithmetic + ONE count
    aggregate — no self-join, no window, no Python.  Pair counts are
    integral; cross-engine equality is exact."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = F.transform(F.split(F.col("path"), "->"), lambda s: s.cast("long"))
    # clamp the slice length at 0: a walk shorter than the window offset
    # contributes no pairs at that offset (negative lengths throw in ANSI
    # mode; the DuckDB twin's i + d <= len(toks) guard is the same rule)
    offset_pairs = [
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - d, F.lit(0))),
            F.slice(toks, d + 1, F.greatest(F.size(toks) - d, F.lit(0))),
            lambda a, b: F.struct(a.alias("u"), b.alias("v")),
        )
        for d in range(1, window + 1)
    ]
    fwd = F.flatten(F.array(*offset_pairs))
    pairs = walks.select(F.explode(fwd).alias("pr")).select(
        F.col("pr.u").alias("u"), F.col("pr.v").alias("v")
    )
    both = pairs.select(F.col("u").alias("center"), F.col("v").alias("context")).unionAll(
        pairs.select(F.col("v").alias("center"), F.col("u").alias("context"))
    )
    return both.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def skipgram_oracle_sql(walks_sql: str, window: int = 2) -> str:
    """DuckDB twin of ``skipgram_pairs`` over any SELECT with a ``path``
    column (``->``-joined ids)."""
    return f"""
WITH w AS ({walks_sql}),
tok AS (SELECT string_split(path, '->') AS toks FROM w),
fwd AS (
  SELECT CAST(toks[i] AS BIGINT) AS u, CAST(toks[i + d] AS BIGINT) AS v
  FROM tok,
       LATERAL (SELECT UNNEST(generate_series(1, len(toks))) AS i) pos,
       LATERAL (SELECT UNNEST(generate_series(1, {window})) AS d) off
  WHERE i + d <= len(toks)),
both_dir AS (
  SELECT u AS center, v AS context FROM fwd
  UNION ALL
  SELECT v AS center, u AS context FROM fwd)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM both_dir GROUP BY center, context
"""
