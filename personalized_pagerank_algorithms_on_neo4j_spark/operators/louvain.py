"""Deterministic two-level Louvain — the `gds.louvain` community verb.

The reference's graph lives in Neo4j, whose GDS library ships Louvain as its
flagship community-detection procedure next to the PageRank family the
reference benchmarks (Neo4j_Method.java:35 calls into the same `gds.*`
procedure surface); this module supplies that verb over the engine's derived
property graph.

Semantics (deterministic synchronous variant of Louvain's two phases, the
parallel-Louvain shape used by Grappolo/Gemini-style implementations):

* **Local moving** — every node starts in its own community; each round
  the SCHEDULED nodes simultaneously pick, among the communities of their
  neighbors plus their own, the one maximizing the Newman modularity gain
  evaluated against the PREVIOUS round's assignment.  With m2 = |directed
  undirected-edge rows| = 2m, deg(v) the undirected degree, d_c the
  community degree sum and w_vc the count of v's neighbors in c, the gain
  of joining c is (up to the positive constant 1/m2² and terms independent
  of c) the EXACT BIGINT

      score(v, c) = m2 * w_vc - deg(v) * (d_c - [c = L(v)] * deg(v)),

  ties broken toward the smallest community label.  Rounds alternate
  between the two node-id parity classes (round t moves only nodes with
  id % 2 == t % 2) — the standard parallel-Louvain remedy for the
  synchronous pair-swap oscillation (two nodes that each improve by
  joining the other's community swap labels forever under a fully
  synchronous schedule; a colored move schedule makes the swap one-sided
  and lets it settle — the same reason Grappolo-style implementations
  gate moves on a vertex coloring, with id parity as the cheapest
  deterministic 2-coloring of the SCHEDULE, not of the graph).  Node ids
  are assumed non-negative (true for every graph this engine derives).
  A fixed round count keeps the recurrence replayable as chained CTEs.
* **Aggregation** — communities contract to supernodes; the contracted
  edge (a, b) carries weight W(a,b) = inter-community directed rows, and a
  supernode's strength s(a) = Σ_b W(a,b) (self-loops included) equals the
  sum of its members' degrees, so Σ s = m2 is invariant and the SAME gain
  formula applies with w_ac = Σ_{b≠a, L(b)=c} W(a,b) (self-loop weight is
  internal mass and moves with the supernode — it never counts toward a
  candidate).  A second fixed-round local-moving pass runs on the
  contracted graph and final labels project back through the contraction.

Every quantity is integral — cross-engine equality is exact, no float
rounding gate (the modularity/betweenness discipline).  Overflow-safe while
m2 * max(w) < 2^63, i.e. ~4m² < 2^63 at level 2 (m < ~1.5e9 undirected
edges per partition of the id space), far beyond the oracle scale and
checked cheaply at runtime nowhere hot.

Scale shape: per round ONE edge⋈label join feeding a (node, candidate)
aggregate (edge-bounded, map-side combinable), two node-bounded joins
(degree, own label), one label-keyed degree rollup, and ONE struct-max
argmax aggregate — never a window, never a driver loop over nodes.  All
node-bounded sides broadcast under ``BROADCAST_NODE_BOUND``; above it they
shuffle on the node key (the 100x plan).  The contraction itself is one
double label join + aggregate, after which every level-2 round runs on the
community-bounded contracted graph — the classic Louvain scale win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._nputil import group_sum_int, pick_max_per_group
from ..config import LOCAL_EDGE_THRESHOLD
from ..graph import PropertyGraph
from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    SuperstepLoop,
    loop_shuffle_partitions,
    static_superstep_plan,
)


def _local_moving_numpy(
    edges_pdf, strength_pdf, labels_pdf, m2: int, rounds: int
):
    """Driver-local replay of the synchronous gain recurrence below,
    vectorized in numpy (the LocalGraph precedent).  Every quantity is
    integral — the BIGINT score, the (score desc, cand asc) argmax, the
    parity schedule — so the replay is BIT-EXACT per round, not merely
    equivalent at the fixed point.  Returns the labels as (node, label)
    int64 arrays."""
    import numpy as np

    nodes = np.sort(
        labels_pdf["node"].to_numpy(dtype=np.int64), kind="stable"
    )
    n = len(nodes)
    lab_in = labels_pdf["node"].to_numpy(dtype=np.int64)
    lab_val = labels_pdf["label"].to_numpy(dtype=np.int64)
    # labels as INDICES into nodes (initial labels are node ids by
    # construction at both levels: labels0/comm select node AS label)
    lab = np.empty(n, dtype=np.int64)
    lab[np.searchsorted(nodes, lab_in)] = np.searchsorted(nodes, lab_val)
    deg = np.zeros(n, dtype=np.int64)
    if len(strength_pdf) and n:
        sn = strength_pdf["node"].to_numpy(dtype=np.int64)
        si = np.searchsorted(nodes, sn)
        ok = (si < n) & (nodes[np.minimum(si, n - 1)] == sn)
        deg[si[ok]] = strength_pdf["deg"].to_numpy(dtype=np.int64)[ok]
    if len(edges_pdf) and n:
        es = edges_pdf["src"].to_numpy(dtype=np.int64)
        ed = edges_pdf["dst"].to_numpy(dtype=np.int64)
        pu = np.searchsorted(nodes, es)
        pv = np.searchsorted(nodes, ed)
        # endpoints outside the label table contribute nothing — the
        # distributed round's inner label joins drop them the same way
        keep = (
            (pu < n)
            & (pv < n)
            & (nodes[np.minimum(pu, n - 1)] == es)
            & (nodes[np.minimum(pv, n - 1)] == ed)
        )
        eu, ev = pu[keep], pv[keep]
        ew = edges_pdf["w"].to_numpy(dtype=np.int64)[keep]
    else:
        eu = ev = ew = np.empty(0, dtype=np.int64)
    lab = _local_moving_rounds(nodes, lab, deg, eu, ev, ew, m2, rounds)
    return nodes, nodes[lab]


def _local_moving_rounds(nodes, lab, deg, eu, ev, ew, m2: int, rounds: int):
    """Index-space core of the local-moving replay: ``nodes`` are the
    SORTED original ids (they key the parity schedule and the candidate
    tie order), ``lab``/``deg`` are per-position int64 arrays, and
    ``eu``/``ev``/``ew`` the kept symmetric edges as position indices.
    Returns the final per-position labels (positions, not ids)."""
    import numpy as np

    n = len(nodes)
    node_par = nodes % 2
    for t in range(rounds):
        par = t % 2
        # candidate w sums for the scheduled class: neighbor labels
        # (edge-bounded) + every scheduled node's own label at w 0
        sched_e = node_par[eu] == par
        su, sc, sw = eu[sched_e], lab[ev[sched_e]], ew[sched_e]
        own_v = np.nonzero(node_par == par)[0]
        key = np.concatenate([su * n + sc, own_v * n + lab[own_v]])
        wts = np.concatenate([sw, np.zeros(len(own_v), dtype=np.int64)])
        # one stable-sort groupby (int64-exact reduceat sums) — replaces
        # np.unique + add.at, whose default quicksort is pathological on
        # SIMD-poor CPUs (_nputil)
        uniq, wsum = group_sum_int(key, wts)
        v = uniq // n
        c = uniq % n
        # community degree sums from the PREVIOUS assignment (exact int64)
        dc = np.zeros(n, dtype=np.int64)
        np.add.at(dc, lab, deg)
        own_bonus = np.where(c == lab[v], deg[v], 0)
        score = m2 * wsum - deg[v] * (dc[c] - own_bonus)
        # argmax per v under (score desc, cand asc); cand is an index but
        # index order == id order (nodes sorted ascending); rows are
        # already (v asc, cand asc) from the groupby
        pick = pick_max_per_group(v, c, score)
        lab = lab.copy()
        lab[v[pick]] = c[pick]
    return lab


def _local_moving(
    spark,
    edges: DataFrame,
    strength: DataFrame,
    labels: DataFrame,
    m2: int,
    rounds: int,
    small: bool,
    loop_parts: int | None,
) -> DataFrame:
    """The shared synchronous gain-based local-moving loop over a weighted
    (src, dst, w) edge list with self-pairs already excluded; ``strength``
    is (node, deg) covering every edge endpoint (labels may cover more —
    isolated nodes ride through with deg 0 and only their own candidate).

    checkpoint_every=1: each round reads ``labels`` from FIVE consumers
    (neighbor join, own-candidate union, community degree rollup,
    own-label join, carry-through left join) — a lazy round re-derives
    the previous round's plan per consumer (the unshared-subtree
    recompute), which costs far more than one eager checkpoint of the
    node-bounded label vector per round."""
    # Driver-local kernel under the LocalGraph edge cutoff: the gain
    # recurrence is all-integer, so the numpy replay is bit-exact per
    # round — and replaces ~10 Spark jobs per round (5 broadcast builds,
    # the three aggregates, the checkpoint).  Above the gate the
    # superstep rounds below run unchanged — the 100x plan.
    if small:
        e_ck = edges.localCheckpoint(eager=True)
        if e_ck.count() <= LOCAL_EDGE_THRESHOLD:
            nodes, labs = _local_moving_numpy(
                e_ck.toPandas(),
                strength.toPandas(),
                labels.toPandas(),
                m2,
                rounds,
            )
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame({"node": nodes, "label": labs}),
                "node long, label long",
            )
        edges = e_ck
    loop = SuperstepLoop(checkpoint_every=1)
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        edges = edges.localCheckpoint(eager=True)
        strength = strength.localCheckpoint(eager=True)
        labels = labels.localCheckpoint(eager=True)
        dv = strength.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
        for t in range(rounds):
            par = t % 2
            lj = F.broadcast(labels) if small else labels
            # candidate weights for THIS round's parity class (the move
            # schedule): neighbors' communities (edge-bounded rows), plus
            # every scheduled node's own community at weight 0 so "stay"
            # is always on the ballot — ONE aggregate over the union
            nbr = edges.join(lj, edges.dst == lj.node).select(
                edges.src.alias("v"),
                F.col("label").alias("cand"),
                F.col("w").alias("w"),
            )
            own = labels.select(
                F.col("node").alias("v"),
                F.col("label").alias("cand"),
                F.lit(0).cast("long").alias("w"),
            )
            cands = (
                nbr.unionByName(own)
                .where((F.col("v") % 2) == par)
                .groupBy("v", "cand")
                .agg(F.sum("w").cast("long").alias("w"))
            )
            # community degree sums from the PREVIOUS assignment
            dcur = (
                labels.join(
                    F.broadcast(strength) if small else strength, "node", "left"
                )
                .groupBy("label")
                .agg(
                    F.sum(F.coalesce(F.col("deg"), F.lit(0)))
                    .cast("long")
                    .alias("dc")
                )
                .select(F.col("label").alias("cand"), "dc")
            )
            lv = labels.select(F.col("node").alias("v"), F.col("label").alias("own"))
            deg_v = F.coalesce(F.col("dv"), F.lit(0))
            score = F.lit(m2) * F.col("w") - deg_v * (
                F.col("dc")
                - F.when(F.col("cand") == F.col("own"), deg_v).otherwise(F.lit(0))
            )
            scored = (
                cands.join(F.broadcast(lv) if small else lv, "v")
                .join(F.broadcast(dv) if small else dv, "v", "left")
                # every candidate label is a current label -> inner is total
                .join(F.broadcast(dcur) if small else dcur, "cand")
                .select("v", "cand", score.alias("score"))
            )
            pick = (
                scored.groupBy("v")
                .agg(
                    F.max(
                        F.struct(
                            F.col("score").alias("score"),
                            (-F.col("cand")).alias("neg"),
                            F.col("cand").alias("cand"),
                        )
                    ).alias("m")
                )
                .select(F.col("v").alias("node"), F.col("m.cand").alias("new_label"))
            )
            # unscheduled nodes keep their label
            pj = F.broadcast(pick) if small else pick
            labels = labels.join(pj, "node", "left").select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            labels = loop.materialize(labels)
    return labels


def _louvain_two_level_local(
    spark, ids, eu, ev, ew, m2: int, rounds1: int, rounds2: int
) -> DataFrame:
    """Fully driver-local two-level Louvain: level-1 local moving, the
    community contraction, level-2 local moving and the projection — the
    whole pipeline the Spark orchestration below runs, replayed on index
    arrays.  Every step is integer groupby-sum algebra, so the result is
    BIT-EXACT vs the distributed path (the contraction's e2/strength
    sums are the same int64 group sums; the level cores are the shared
    `_local_moving_rounds`).  ``ids`` are the sorted node ids, ``eu/ev``
    the symmetric self-loop-free edge view as positions, ``ew`` int64
    weights, ``m2`` the total symmetrized weight."""
    import numpy as np
    import pandas as pd

    from .._nputil import unique_stable

    n = len(ids)
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, eu, ew)
    lab1 = _local_moving_rounds(
        ids, np.arange(n, dtype=np.int64), deg, eu, ev, ew, m2, rounds1
    )
    # contraction: e2 keyed on (label(src), label(dst)) — self-pairs KEPT
    # (they feed strength2), exactly the distributed groupBy
    key2 = lab1[eu] * n + lab1[ev]
    uk, w2 = group_sum_int(key2, ew)
    a2, b2 = uk // n, uk % n
    comm = unique_stable(lab1)  # ascending positions == ascending ids
    ids2 = ids[comm]
    n2 = len(comm)
    ra = np.searchsorted(comm, a2)
    rb = np.searchsorted(comm, b2)
    deg2 = np.zeros(n2, dtype=np.int64)
    np.add.at(deg2, ra, w2)  # strength INCLUDES self-loop weight
    sm = a2 != b2  # level-2 edges exclude self-loops
    lab2 = _local_moving_rounds(
        ids2,
        np.arange(n2, dtype=np.int64),
        deg2,
        ra[sm],
        rb[sm],
        w2[sm],
        m2,
        rounds2,
    )
    final = ids2[lab2[np.searchsorted(comm, lab1)]]
    return spark.createDataFrame(
        pd.DataFrame({"node": ids, "label": final}),
        "node long, label long",
    )


def louvain(
    graph: PropertyGraph, rounds1: int = 4, rounds2: int = 2
) -> DataFrame:
    """(node, label) after ``rounds1`` local-moving rounds on the original
    graph, contraction, ``rounds2`` rounds on the contracted graph, and
    projection back — one full Louvain level plus a refinement level.
    Round counts should be even so both parity classes get equal turns."""
    spark = graph.spark
    # Fully driver-local path under the LocalGraph cutoff: the symmetric
    # deduped unit-weight edge view derives from the CACHED CSR snapshot
    # (no symmetrize job, no per-level collect), and the two levels plus
    # contraction/projection run as one numpy pass — replaces the ~10
    # inter-level Spark jobs AND the per-level kernel collects.  Above
    # the cutoff the distributed orchestration below runs unchanged.
    if graph.fits_local():
        import numpy as np

        from .._nputil import unique_stable

        lg = graph.local
        sm0 = lg.edge_src != lg.edge_dst
        a = np.concatenate([lg.edge_src[sm0], lg.edge_dst[sm0]])
        b = np.concatenate([lg.edge_dst[sm0], lg.edge_src[sm0]])
        uk = unique_stable(a * np.int64(lg.n) + b)
        eu, ev = uk // lg.n, uk % lg.n
        ew = np.ones(len(eu), dtype=np.int64)
        return _louvain_two_level_local(
            spark, lg.ids, eu, ev, ew, len(eu), rounds1, rounds2
        )
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # both levels + contraction read it
    )
    m2 = und.count()
    small = graph.n <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, graph.n) if small else None
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    labels0 = graph.nodes.select(
        F.col("id").alias("node"), F.col("id").alias("label")
    )
    l1 = _local_moving(
        spark,
        und.select("src", "dst", F.lit(1).cast("long").alias("w")),
        deg,
        labels0,
        m2,
        rounds1,
        small,
        loop_parts,
    ).localCheckpoint(eager=True)  # contraction joins + final projection

    # ---- aggregation: contract communities to supernodes -----------------
    ls = l1.select(F.col("node").alias("src"), F.col("label").alias("la"))
    ld = l1.select(F.col("node").alias("dst"), F.col("label").alias("lb"))
    e2 = (
        und.join(F.broadcast(ls) if small else ls, "src")
        .join(F.broadcast(ld) if small else ld, "dst")
        .groupBy(F.col("la").alias("src"), F.col("lb").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)  # strength aggregate + loop edges
    )
    # strength includes self-loop weight; communities of isolated nodes
    # never appear in e2 and ride through at strength 0
    s2 = e2.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").cast("long").alias("deg")
    )
    comm = l1.select(F.col("label").alias("node")).distinct()
    strength2 = comm.join(s2, "node", "left").select(
        "node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg")
    )
    labels2_0 = comm.select("node", F.col("node").alias("label"))
    l2 = _local_moving(
        spark,
        e2.where(F.col("src") != F.col("dst")),
        strength2,
        labels2_0,
        m2,
        rounds2,
        small,
        loop_parts,
    )

    # ---- project back through the contraction ----------------------------
    proj = l2.select(F.col("node").alias("c1"), F.col("label").alias("final"))
    return l1.join(F.broadcast(proj) if small else proj, l1.label == proj.c1).select(
        "node", F.col("final").alias("label")
    )


def louvain_weighted(
    edges_w: DataFrame, rounds1: int = 4, rounds2: int = 2
) -> DataFrame:
    """(node, label): two-level Louvain over a WEIGHTED edge list
    (src, dst, weight) — the gds.louvain relationshipWeightProperty mode.
    Weights must be positive INTEGERS (the exact-recurrence contract:
    m2 = total symmetrized weight, strengths and gains stay BIGINT);
    parallel edges and both directions sum.  Node set = edge endpoints
    (an edge-list input names no isolated nodes).  Same deterministic
    parity-scheduled recurrence as `louvain` — with unit weights the two
    agree exactly on edge-incident nodes."""
    spark = edges_w.sparkSession
    # materialize the (possibly expensive, lazily derived) edge input
    # ONCE: the validation scan, both union branches of the symmetrize,
    # and the local-path collect would otherwise each re-derive it
    e = edges_w.select(
        "src", "dst", F.col("weight").cast("long").alias("w")
    ).where(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    bad = e.where(F.col("w").isNull() | (F.col("w") <= 0)).limit(1).count()
    if bad:
        raise ValueError("louvain_weighted: weights must be positive integers")
    # Fully driver-local path under the edge cutoff (see `louvain`): one
    # collect of the checkpointed edge list, then the whole two-level
    # pipeline in numpy — bit-exact integer algebra throughout.
    if e.count() <= LOCAL_EDGE_THRESHOLD:
        import numpy as np

        from .._nputil import unique_stable

        epd = e.toPandas()
        es_o = epd["src"].to_numpy(dtype=np.int64)
        ed_o = epd["dst"].to_numpy(dtype=np.int64)
        wv = epd["w"].to_numpy(dtype=np.int64)
        ids = unique_stable(np.concatenate([es_o, ed_o]))
        n = len(ids)
        pu = np.searchsorted(ids, es_o)
        pv = np.searchsorted(ids, ed_o)
        # symmetric weight-summed view (parallel edges and both
        # directions sum — the distributed groupBy over the union)
        key = np.concatenate([pu * n + pv, pv * n + pu])
        uk, uw = group_sum_int(key, np.concatenate([wv, wv]))
        eu, ev = uk // n, uk % n
        return _louvain_two_level_local(
            spark, ids, eu, ev, uw, int(uw.sum()), rounds1, rounds2
        )
    und = (
        e.unionAll(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    m2 = und.agg(F.sum("w")).first()[0]
    nodes = und.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    small = n <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, n) if small else None
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").cast("long").alias("deg")
    )
    l1 = _local_moving(
        spark,
        und,
        deg,
        nodes.select("node", F.col("node").alias("label")),
        int(m2),
        rounds1,
        small,
        loop_parts,
    ).localCheckpoint(eager=True)
    ls = l1.select(F.col("node").alias("src"), F.col("label").alias("la"))
    ld = l1.select(F.col("node").alias("dst"), F.col("label").alias("lb"))
    e2 = (
        und.join(F.broadcast(ls) if small else ls, "src")
        .join(F.broadcast(ld) if small else ld, "dst")
        .groupBy(F.col("la").alias("src"), F.col("lb").alias("dst"))
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    s2 = e2.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").cast("long").alias("deg")
    )
    comm = l1.select(F.col("label").alias("node")).distinct()
    strength2 = comm.join(s2, "node", "left").select(
        "node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg")
    )
    l2 = _local_moving(
        spark,
        e2.where(F.col("src") != F.col("dst")),
        strength2,
        comm.select("node", F.col("node").alias("label")),
        int(m2),
        rounds2,
        small,
        loop_parts,
    )
    proj = l2.select(F.col("node").alias("c1"), F.col("label").alias("final"))
    return l1.join(F.broadcast(proj) if small else proj, l1.label == proj.c1).select(
        "node", F.col("final").alias("label")
    )


def _moving_round_sql(
    i: int,
    prefix: str,
    edges: str,
    strength: str,
    m2_expr: str,
) -> list[str]:
    """One unrolled local-moving round: candidate weights for round i's
    parity class, community degree sums, integer gain scores, row_number
    argmax (score DESC, label ASC — the same order the Spark struct-max
    encodes), unscheduled nodes carried through a LEFT join."""
    p = prefix
    par = i % 2
    return [
        f"""{p}cn{i} AS (
  SELECT e.src AS v, l.label AS cand, CAST(SUM(e.w) AS BIGINT) AS w
  FROM {edges} e JOIN {p}l{i} l ON e.dst = l.node
  GROUP BY 1, 2)""",
        f"""{p}ca{i} AS (
  SELECT v, cand, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT v, cand, w FROM {p}cn{i}
    UNION ALL
    SELECT node AS v, label AS cand, 0 AS w FROM {p}l{i}
  ) WHERE (v % 2) = {par} GROUP BY 1, 2)""",
        f"""{p}cd{i} AS (
  SELECT l.label AS cand, CAST(SUM(COALESCE(d.deg, 0)) AS BIGINT) AS dc
  FROM {p}l{i} l LEFT JOIN {strength} d ON l.node = d.node
  GROUP BY 1)""",
        f"""{p}sc{i} AS (
  SELECT c.v, c.cand,
         {m2_expr} * c.w - COALESCE(d.deg, 0) * (dc.dc
           - CASE WHEN c.cand = l.label THEN COALESCE(d.deg, 0) ELSE 0 END)
         AS score
  FROM {p}ca{i} c
  JOIN {p}l{i} l ON c.v = l.node
  LEFT JOIN {strength} d ON c.v = d.node
  JOIN {p}cd{i} dc ON c.cand = dc.cand)""",
        f"""{p}pk{i} AS (
  SELECT v AS node, cand AS new_label FROM (
    SELECT v, cand,
           ROW_NUMBER() OVER (PARTITION BY v
                              ORDER BY score DESC, cand ASC) AS rn
    FROM {p}sc{i})
  WHERE rn = 1)""",
        f"""{p}l{i + 1} AS MATERIALIZED (
  SELECT o.node, COALESCE(k.new_label, o.label) AS label
  FROM {p}l{i} o LEFT JOIN {p}pk{i} k ON o.node = k.node)""",
    ]


def _two_level_tail_sql(rounds1: int, rounds2: int) -> tuple[list[str], str]:
    """The shared oracle tail over prebuilt lv_und(src, dst, w) / lv_m /
    lv_deg / lv_l0 CTEs: level-1 rounds, contraction (edge weights SUM —
    correct for unit and general integer weights alike), level-2 rounds.
    Returns (ctes, level-1 result name)."""
    m2 = "(SELECT m2 FROM lv_m)"
    ctes: list[str] = []
    for i in range(rounds1):
        ctes += _moving_round_sql(i, "lv_", "lv_und", "lv_deg", m2)
    r1 = f"lv_l{rounds1}"
    ctes += [
        f"""lv_e2 AS MATERIALIZED (
  SELECT ls.label AS src, ld.label AS dst, CAST(SUM(u.w) AS BIGINT) AS w
  FROM lv_und u
  JOIN {r1} ls ON u.src = ls.node
  JOIN {r1} ld ON u.dst = ld.node
  GROUP BY 1, 2)""",
        f"""lv_s2 AS MATERIALIZED (
  SELECT c.label AS node, COALESCE(t.s, 0) AS deg
  FROM (SELECT DISTINCT label FROM {r1}) c
  LEFT JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS s FROM lv_e2 GROUP BY 1) t
         ON c.label = t.src)""",
        "lv_e2x AS MATERIALIZED (SELECT * FROM lv_e2 WHERE src <> dst)",
        """ss_l0 AS MATERIALIZED (SELECT node, node AS label FROM lv_s2)""",
    ]
    for i in range(rounds2):
        ctes += _moving_round_sql(i, "ss_", "lv_e2x", "lv_s2", m2)
    return ctes, r1


def louvain_oracle_sql(
    edges_sql: str, nodes_sql: str, rounds1: int = 4, rounds2: int = 2
) -> str:
    """DuckDB twin of `louvain`: the identical unrolled two-level
    recurrence (all quantities integral — exact equality)."""
    ctes = [
        f"lv_e_raw AS MATERIALIZED ({edges_sql})",
        """lv_und AS MATERIALIZED (
  SELECT src, dst, CAST(1 AS BIGINT) AS w FROM (
    SELECT DISTINCT src, dst FROM (
      SELECT src, dst FROM lv_e_raw WHERE src <> dst
      UNION ALL
      SELECT dst AS src, src AS dst FROM lv_e_raw WHERE src <> dst)))""",
        "lv_m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM lv_und)",
        """lv_deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM lv_und GROUP BY 1)""",
        f"""lv_l0 AS MATERIALIZED (
  SELECT id AS node, id AS label FROM ({nodes_sql}))""",
    ]
    tail, r1 = _two_level_tail_sql(rounds1, rounds2)
    ctes += tail
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT l1.node, s.label
FROM {r1} l1 JOIN ss_l{rounds2} s ON l1.label = s.node
"""


def louvain_weighted_oracle_sql(
    edges_w_sql: str, rounds1: int = 4, rounds2: int = 2
) -> str:
    """DuckDB twin of `louvain_weighted` over any (src, dst, weight) SQL:
    parallel edges and both directions SUM; node set = edge endpoints."""
    ctes = [
        f"""lv_e_raw AS MATERIALIZED (
  SELECT src, dst, CAST(weight AS BIGINT) AS w FROM ({edges_w_sql})
  WHERE src <> dst)""",
        """lv_und AS MATERIALIZED (
  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT src, dst, w FROM lv_e_raw
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM lv_e_raw
  ) GROUP BY 1, 2)""",
        "lv_m AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM lv_und)",
        """lv_deg AS MATERIALIZED (
  SELECT src AS node, CAST(SUM(w) AS BIGINT) AS deg FROM lv_und GROUP BY 1)""",
        """lv_l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM lv_und)""",
    ]
    tail, r1 = _two_level_tail_sql(rounds1, rounds2)
    ctes += tail
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT l1.node, s.label
FROM {r1} l1 JOIN ss_l{rounds2} s ON l1.label = s.node
"""


def louvain_refined(
    graph: PropertyGraph,
    rounds1: int = 4,
    rounds2: int = 2,
    max_iters: int = 12,
) -> DataFrame:
    """(node, label): Louvain communities refined so that EVERY community
    is internally connected — the headline guarantee that distinguishes
    Leiden from Louvain (Traag/Waltman/van Eck 2019, "From Louvain to
    Leiden: guaranteeing well-connected communities" [public]: Louvain
    can emit arbitrarily badly disconnected communities; Leiden's
    refinement phase repairs them).  This is the DETERMINISTIC core of
    that repair — each Louvain community is split into its connected
    components (label = smallest member node) — not the full randomized
    Leiden loop (whose theta-sampled refinement and re-aggregation
    rounds are replay-hostile by design; the connectivity guarantee is
    the part a deterministic cross-engine gate can carry).

    Scale shape: one `louvain` run + ONE min-label propagation over the
    INTRA-community edge subset (edges never cross communities, so a
    single global propagation computes all per-community components at
    once — no per-community loop); singleton/isolated nodes keep their
    own id.  Reuses `dedup_clusters` as the component engine (the
    graph_wcc precedent)."""
    from ..functions.dedup import dedup_clusters

    labels = louvain(graph, rounds1=rounds1, rounds2=rounds2).localCheckpoint(
        eager=True
    )
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    la = labels.select(
        F.col("node").alias("src"), F.col("label").alias("_ls")
    )
    lb = labels.select(
        F.col("node").alias("dst"), F.col("label").alias("_ld")
    )
    intra = (
        e.join(la, "src")
        .join(lb, "dst")
        .where(F.col("_ls") == F.col("_ld"))
        .select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    )
    comp = dedup_clusters(intra, max_iters=max_iters, strict=True)
    return labels.join(
        comp, labels.node == comp.doc_id, "left"
    ).select(
        "node",
        F.coalesce(F.col("cluster_id"), F.col("node")).alias("label"),
    )
