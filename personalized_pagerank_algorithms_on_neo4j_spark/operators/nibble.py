"""PPR-Nibble local clustering: approximate-PPR sweep cut.

Andersen, Chung & Lang 2006 ("Local Graph Partitioning using PageRank
Vectors", FOCS): push an approximate PPR vector from a seed on the
UNDIRECTED graph, order the support by pi(v)/deg(v), and return the
prefix S_i with the minimum conductance phi(S_i) = cut(S_i) /
min(vol(S_i), vol(G) - vol(S_i)).  The whole point of the algorithm is
LOCALITY: every post-push stage operates on the push SUPPORT (size
O(1/(alpha*rmax)), independent of graph size), so the global rank window
is bounded by construction — `bounded_global_window` applies.

Incremental cut identity (what makes the sweep one pass instead of a
per-prefix cut recount): when v joins S,
    cut(S + v) = cut(S) + deg(v) - 2 * e(v, S)
where e(v, S) is the number of v's neighbors already in S — computed for
every v in ONE join of the symmetrized edges against the rank map
(support-bounded on both sides), then cut/vol are running sums over the
ranked support.  Prefixes with vol = 0 or vol = vol(G) have no cut to
score and are excluded (the ACL sweep stops at vol(G)/2; scoring the
complement via the min() denominator is the standard generalization).

Reference parity note: the push is the engine's I1 forward push
(operators/forward_push, Forward_Push.java:52-148 semantics) over the
symmetrized edge set; the sweep is new surface with a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_ALPHA
from ..graph import PropertyGraph
from ..plans.windows import bounded_global_window


def symmetrize(edges: DataFrame) -> DataFrame:
    """(src, dst): the undirected reading — both directions, distinct,
    self-loops dropped (a self-loop contributes to neither cut nor the
    sweep ordering's degree normalization in the ACL formulation)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def ppr_nibble(
    graph: PropertyGraph,
    seed: int,
    rmax: float = 1e-5,
    alpha: float = DEFAULT_ALPHA,
    mode: str = "auto",
) -> DataFrame:
    """(rank, node, score, cut, vol, phi, in_best): the full sweep profile
    over the push support, ordered by score = pi(v)/deg(v) descending
    (ties to the lower node id), with `in_best` marking the minimum-
    conductance prefix (ties to the SMALLEST prefix).  `phi` is the
    conductance of the prefix ENDING at this row; rows whose prefix has
    vol 0 or vol(G) carry phi = NULL and never win.

    Scale shape: one forward push (the audited I1 loop) + support-bounded
    joins and windows; the only graph-sized jobs are the symmetrize
    distinct and the degree aggregate, both one shuffle."""
    from .forward_push import forward_push

    sym = symmetrize(graph.edges).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    vol_g = sym.count()  # = sum of degrees = 2 * |und edges|
    ug = PropertyGraph(graph.spark, graph.nodes, sym)
    pi = forward_push(ug, int(seed), rmax, alpha, mode=mode)
    support = (
        pi.where(F.col("ppr") > 0)
        .join(deg, "node", "left")
        .select(
            "node",
            "ppr",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            # ordering key rounded to 12: the raw reserve carries ~1e-15
            # cross-engine summation noise that could flip near-tied
            # ranks; 12 decimals absorbs the noise while separating
            # genuinely distinct scores (>= 1e-8 at the driver's rmax),
            # and equal rounded scores tie-break on node id identically
            # in both engines
            F.round(
                F.col("ppr")
                / F.greatest(F.col("deg"), F.lit(1)).cast("double"),
                12,
            ).alias("score"),
        )
    )
    w = bounded_global_window(F.desc("score"), F.asc("node"))
    ranked = support.select(
        F.row_number().over(w).alias("rank"), "node", "deg", "score"
    ).localCheckpoint(eager=True)  # feeds the e(v,S) join AND the sweep
    # e(v, S_{rank(v)-1}): neighbors of v ranked strictly earlier — the
    # symmetrized edges give exactly one (v, u) row per undirected edge
    ev = (
        sym.join(
            ranked.select(F.col("node").alias("src"), F.col("rank").alias("rv")),
            "src",
        )
        .join(
            ranked.select(F.col("node").alias("dst"), F.col("rank").alias("ru")),
            "dst",
        )
        .where(F.col("ru") < F.col("rv"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    from pyspark.sql import Window

    ws = bounded_global_window("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow  # running cut/vol sums
    )
    sweep = (
        ranked.join(ev, "node", "left")
        .select(
            "rank",
            "node",
            "score",
            "deg",
            (F.col("deg") - 2 * F.coalesce("e_in", F.lit(0))).alias("_dcut"),
        )
        .select(
            "rank",
            "node",
            "score",
            F.sum("_dcut").over(ws).alias("cut"),
            F.sum("deg").over(ws).alias("vol"),
        )
        .select(
            "rank",
            "node",
            F.round("score", 9).alias("score"),
            "cut",
            "vol",
            F.when(
                (F.col("vol") > 0) & (F.col("vol") < vol_g),
                F.round(
                    F.col("cut")
                    / F.least(F.col("vol"), F.lit(vol_g) - F.col("vol")).cast(
                        "double"
                    ),
                    9,
                ),
            ).alias("phi"),
        )
    )
    best = sweep.where(F.col("phi").isNotNull()).agg(
        F.min_by(
            F.col("rank"), F.struct(F.col("phi"), F.col("rank"))
        ).alias("_best_rank")
    )
    return sweep.crossJoin(F.broadcast(best)).select(
        "rank",
        "node",
        "score",
        "cut",
        "vol",
        "phi",
        (F.col("rank") <= F.coalesce("_best_rank", F.lit(0))).alias("in_best"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle
# ---------------------------------------------------------------------------


def _nibble_push_chain(prefix: str, steps: int, rmax: float, alpha: float) -> str:
    """Unrolled forward push over `nb_ew` (src, dst, od) from `nb_seed`
    (one row, column s).  The symmetrized graph has no dangling nodes
    (every node with an edge has out-degree >= 1), so the
    dangling-to-source branch of the directed chain is unnecessary —
    the isolated-seed case short-circuits before the chain."""
    qual = f"t.residue > 0 AND t.residue >= {rmax} * d.od"
    ctes = [
        f"""{prefix}0 AS MATERIALIZED (
  SELECT s AS node, CAST(1.0 AS DOUBLE) AS residue,
         CAST(0.0 AS DOUBLE) AS reserve
  FROM nb_seed)"""
    ]
    for i in range(steps):
        p = f"{prefix}{i}"
        ctes.append(
            f"""{prefix}{i + 1} AS MATERIALIZED (
  SELECT node, SUM(residue) AS residue, SUM(reserve) AS reserve FROM (
    SELECT t.node, t.residue, t.reserve
    FROM {p} t JOIN nb_deg d ON t.node = d.src
    WHERE NOT ({qual})
    UNION ALL
    SELECT t.node, CAST(0.0 AS DOUBLE), t.reserve + {alpha} * t.residue
    FROM {p} t JOIN nb_deg d ON t.node = d.src
    WHERE {qual}
    UNION ALL
    SELECT ew.dst, (1.0 - {alpha}) * t.residue / ew.od, CAST(0.0 AS DOUBLE)
    FROM {p} t JOIN nb_ew ew ON t.node = ew.src
    WHERE t.residue > 0 AND t.residue >= {rmax} * ew.od
  ) u GROUP BY node)"""
        )
    return ",\n".join(ctes)


def ppr_nibble_oracle_sql(
    edges_sql: str,
    seed_sql: str,
    rmax: float,
    alpha: float,
    steps: int,
) -> str:
    """DuckDB twin: symmetrize, unrolled push, score-ordered sweep with
    the incremental cut identity, min-conductance prefix election.
    ``edges_sql`` yields the DIRECTED (src, dst); ``seed_sql`` one row
    aliased s; ``steps`` must dominate the Spark push's superstep count
    (extra steps are no-ops at the fixed point)."""
    chain = _nibble_push_chain("nb", steps, rmax, alpha)
    return f"""
WITH nb_dir AS (SELECT src, dst FROM ({edges_sql}) nbe WHERE src <> dst),
nb_sym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM nb_dir
    UNION ALL SELECT dst AS src, src AS dst FROM nb_dir)),
nb_deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS od FROM nb_sym GROUP BY src),
nb_ew AS (SELECT e.src, e.dst, d.od FROM nb_sym e JOIN nb_deg d USING (src)),
nb_volg AS (SELECT CAST(COUNT(*) AS BIGINT) AS vg FROM nb_sym),
nb_seed AS ({seed_sql}),
{chain},
nb_pi AS (SELECT node, reserve AS ppr FROM nb{steps} WHERE reserve > 0),
nb_ranked AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY score DESC, node ASC) AS rank,
         node, deg, score
  FROM (
    SELECT p.node, p.ppr, COALESCE(d.od, 0) AS deg,
           ROUND(p.ppr / CAST(GREATEST(COALESCE(d.od, 0), 1) AS DOUBLE), 12)
             AS score
    FROM nb_pi p LEFT JOIN nb_deg d ON p.node = d.src)),
nb_ein AS (
  SELECT a.node, CAST(COUNT(*) AS BIGINT) AS e_in
  FROM nb_sym e
  JOIN nb_ranked a ON e.src = a.node
  JOIN nb_ranked b ON e.dst = b.node
  WHERE b.rank < a.rank
  GROUP BY a.node),
nb_sweep AS MATERIALIZED (
  SELECT rank, node, ROUND(score, 9) AS score,
         CAST(SUM(deg - 2 * COALESCE(e_in, 0)) OVER w AS BIGINT) AS cut,
         CAST(SUM(deg) OVER w AS BIGINT) AS vol
  FROM nb_ranked LEFT JOIN nb_ein USING (node)
  WINDOW w AS (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
nb_phi AS (
  SELECT rank, node, score, cut, vol,
         CASE WHEN vol > 0 AND vol < (SELECT vg FROM nb_volg)
              THEN ROUND(CAST(cut AS DOUBLE)
                   / CAST(LEAST(vol, (SELECT vg FROM nb_volg) - vol)
                          AS DOUBLE), 9)
         END AS phi
  FROM nb_sweep),
nb_best AS (
  SELECT rank AS best_rank FROM nb_phi WHERE phi IS NOT NULL
  ORDER BY phi ASC, rank ASC LIMIT 1)
SELECT rank, node, score, cut, vol, phi,
       rank <= COALESCE((SELECT best_rank FROM nb_best), 0) AS in_best
FROM nb_phi
"""
