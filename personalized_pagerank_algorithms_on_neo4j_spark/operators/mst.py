"""Minimum/maximum spanning forest — the `gds.spanningTree` graph verb.

The reference's host platform ships the spanning-tree family beside the
PageRank procedures it benchmarks (Neo4j_Method.java:35 drives the same
`gds.*` procedure surface); this engine already has the weighted-edge
substrate (functions/simsearch.knn_weighted_edges, integer micro-unit
cosines), and the maximum spanning forest over a kNN similarity graph IS
single-linkage hierarchical clustering: cutting the forest at similarity
``t`` yields exactly the connected components of the full graph restricted
to ``weight >= t`` (the max-bottleneck property), which `single_linkage
_clusters` exploits for its cross-algorithm oracle.

Algorithm — deterministic Borůvka (the textbook distributed MST: every
round each component claims its best incident cross-component edge, the
claimed edges merge components, rounds at least halve the component
count — O(log n) rounds of joins/aggregates, the only MST family member
with no sequential edge scan):

  round:  1. label each edge endpoint with its component;
          2. per component, argmin over incident cross edges of the
             STRICT total order (sw, u, v) — sw = w (minimize) or -w
             (maximize); strict order makes the claimed edge set
             cycle-free (a cycle needs strictly decreasing keys around
             itself) and the forest UNIQUE, so any correct MST algorithm
             must produce the identical edge set;
          3. merge: min-label propagation over the claimed (label_u,
             label_v) pairs (`dedup_clusters`, the engine-wide
             components machine), relabel.

Convergence = no cross-component edge remains (one emptiness probe per
round, O(log n) rounds); ``strict`` raises on truncation (the
`dedup_clusters` discipline — a truncated forest silently under-connects).

Scale shape: state is (node, label) rows + the (u, v, w) edge table
checkpointed once; every round is two equi joins + one groupBy-argmin +
the bounded merge loop — same partitioning discipline as every iterative
verb here (plans/iterative: AQE off, state-scaled shuffle partitions,
localCheckpoint lineage cuts).  No windows over the full edge set, no
driver loops over nodes; the per-round driver traffic is one emptiness
probe plus dedup_clusters' 1-row monotone convergence aggregates.

Oracle twin: ``boruvka_oracle_sql`` unrolls the identical rounds in
DuckDB (per-round ROW_NUMBER argmin on the same strict key + an EXACT
recursive-closure merge, so the inner merge needs no depth guard); rounds
past convergence are no-ops (no cross edge -> empty claim -> labels
unchanged), so any unroll >= the true round count is equal — the
SSSP fixed-round oracle trick.  ``single_linkage_oracle_sql`` instead
rebuilds the clusters from first principles (recursive closure over the
THRESHOLDED full graph, never touching the forest) — a different
algorithm, so the gate checks the MST semantics, not the implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import LOCAL_EDGE_THRESHOLD
from ..functions.dedup import dedup_clusters
from ..plans.iterative import (
    loop_shuffle_partitions,
    static_superstep_plan,
    stats_reset_checkpoint,
)

# components at least halve per round: 48 rounds covers 2^48 initial
# components, far past the 100 TB operating point; convergence breaks out
MST_MAX_ROUNDS = 48
MST_MERGE_STEPS = 32  # per-round label-merge propagation bound (strict)


def _canonical_edges(
    edges: DataFrame, weight_col: str, maximize: bool
) -> DataFrame:
    """Undirected reading: (u<v) canonical pair, parallel edges keep the
    best weight (min when minimizing, max when maximizing), self-loops
    drop (never forest edges).  ``sw`` is the strict-order sort key."""
    best = F.max("w") if maximize else F.min("w")
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").cast("long").alias("u"),
            F.greatest("src", "dst").cast("long").alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .groupBy("u", "v")
        .agg(best.alias("w"))
    )
    sgn = -1 if maximize else 1
    return und.select("u", "v", "w", (F.lit(sgn) * F.col("w")).alias("sw"))


def _boruvka_local(
    und_pdf, max_rounds: int, strict: bool
) -> list[tuple[int, int, int]]:
    """Driver-local replay of the Borůvka rounds below, vectorized in
    numpy (the LocalGraph precedent): per round every component claims its
    incident cross edge minimizing the SAME strict (sw, u, v) order (edges
    are rank-encoded by one upfront lexsort so the per-component argmin is
    one ``np.minimum.at``), claimed label pairs merge by min-label closure,
    relabel, repeat.  Claims, rounds, convergence-vs-truncation and the
    strict raise are identical to the distributed loop's; the forest —
    unique under the strict total order — is therefore equal edge for
    edge."""
    import numpy as np

    from .._nputil import lexsort_stable, unique_stable

    u = und_pdf["u"].to_numpy(dtype=np.int64)
    v = und_pdf["v"].to_numpy(dtype=np.int64)
    w = und_pdf["w"].to_numpy(dtype=np.int64)
    sw = und_pdf["sw"].to_numpy(dtype=np.int64)
    m = len(u)
    nodes = unique_stable(np.concatenate([u, v]))
    n = len(nodes)
    iu = np.searchsorted(nodes, u)
    iv = np.searchsorted(nodes, v)
    order = lexsort_stable((v, u, sw))  # strict (sw, u, v) total order
    rank = np.empty(m, dtype=np.int64)
    rank[order] = np.arange(m)
    lab = np.arange(n, dtype=np.int64)  # component = node INDEX (id order)
    forest: list[tuple[int, int, int]] = []
    converged = False
    for _ in range(max_rounds):
        lu = lab[iu]
        lv = lab[iv]
        cross = lu != lv
        if not cross.any():
            converged = True
            break
        best = np.full(n, m, dtype=np.int64)
        np.minimum.at(best, lu[cross], rank[cross])
        np.minimum.at(best, lv[cross], rank[cross])
        sel = unique_stable(best[best < m])
        eidx = order[sel]
        forest.extend(
            zip(u[eidx].tolist(), v[eidx].tolist(), w[eidx].tolist())
        )
        # min-label closure over the claimed (lu, lv) pairs, then relabel
        ea = np.concatenate([lab[iu[eidx]], lab[iv[eidx]]])
        eb = np.concatenate([lab[iv[eidx]], lab[iu[eidx]]])
        par = np.arange(n, dtype=np.int64)
        while True:
            new = par.copy()
            np.minimum.at(new, ea, par[eb])
            new = new[new]
            new = new[new]
            if np.array_equal(new, par):
                break
            par = new
        lab = par[lab]
    if not converged and strict:
        raise RuntimeError(
            f"boruvka_msf: not converged within max_rounds={max_rounds}; "
            "a truncated forest under-connects — raise max_rounds"
        )
    return forest


def boruvka_msf(
    edges: DataFrame,
    weight_col: str = "weight",
    maximize: bool = False,
    max_rounds: int = MST_MAX_ROUNDS,
    strict: bool = True,
) -> DataFrame:
    """(u, v, weight): the unique spanning forest of the undirected
    reading of ``edges(src, dst, weight_col)`` under the strict total
    order (sw, u, v).  ``maximize=True`` builds the MAXIMUM spanning
    forest (similarity graphs); weights must be integral (the engine's
    micro-unit discipline — float weights would reintroduce cross-engine
    .5-boundary risk into the order)."""
    spark = edges.sparkSession
    und = _canonical_edges(edges, weight_col, maximize).localCheckpoint(
        eager=True
    )
    empty_schema = und.select("u", "v", F.col("w").alias("weight")).limit(0)
    # Driver-local kernel under the LocalGraph edge cutoff: the claimed
    # forest is unique under the strict order, and _boruvka_local replays
    # the identical rounds — zero Spark jobs per round instead of ~10
    # (cross probe, argmin, per-round dedup_clusters merge loop,
    # relabel + 3 checkpoints).  Above the gate the superstep rounds
    # below run unchanged — the 100x plan.
    if und.count() <= LOCAL_EDGE_THRESHOLD:
        rows = _boruvka_local(und.toPandas(), max_rounds, strict)
        if not rows:
            return empty_schema
        return spark.createDataFrame(rows, "u long, v long, weight long")
    labels = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    n0 = labels.count()
    empty = und.select("u", "v", F.col("w").alias("weight")).limit(0)
    if n0 == 0:
        return empty
    forest: list[DataFrame] = []
    converged = False
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, n0)):
        for _ in range(max_rounds):
            la = labels.select(
                F.col("node").alias("u"), F.col("label").alias("lu")
            )
            lb = labels.select(
                F.col("node").alias("v"), F.col("label").alias("lv")
            )
            # stats_reset, not plain checkpoints, throughout the round:
            # labels joins against itself-derived frames every round, so
            # plain checkpoints compound the sizeInBytes estimate
            # multiplicatively across rounds (the BigInt pathology
            # documented at plans/iterative.stats_reset_checkpoint)
            cross = stats_reset_checkpoint(
                und.join(la, "u")
                .join(lb, "v")
                .where(F.col("lu") != F.col("lv"))  # probe + claim branches
            )
            if cross.isEmpty():
                converged = True
                break
            # w rides last in the struct: the strict order is (sw, u, v)
            # and (u, v) already determines w, so it never affects the min
            pick = F.struct("sw", "u", "v", "lu", "lv", "w").alias("pick")
            cand = cross.select(F.col("lu").alias("comp"), pick).unionAll(
                cross.select(F.col("lv").alias("comp"), pick)
            )
            sel = stats_reset_checkpoint(
                cand.groupBy("comp")
                .agg(F.min("pick").alias("pick"))
                .select("pick.*")
                .distinct()  # forest + merge consumers
            )
            forest.append(sel.select("u", "v", "w"))
            merge = dedup_clusters(
                sel.select(
                    F.col("lu").alias("doc_a"), F.col("lv").alias("doc_b")
                ),
                max_iters=MST_MERGE_STEPS,
                strict=strict,
                jump=True,  # claim graphs chain too (min-edge pointer trees)
            )
            labels = stats_reset_checkpoint(
                labels.join(merge, labels.label == merge.doc_id, "left").select(
                    "node",
                    F.coalesce("cluster_id", "label").alias("label"),
                )
            )
    if not converged and strict:
        raise RuntimeError(
            f"boruvka_msf: not converged within max_rounds={max_rounds}; "
            "a truncated forest under-connects — raise max_rounds"
        )
    if not forest:
        return empty
    out = forest[0]
    for f in forest[1:]:
        out = out.unionAll(f)
    return out.select("u", "v", F.col("w").alias("weight"))


def single_linkage_clusters(
    edges: DataFrame,
    nodes: DataFrame,
    cut: int,
    weight_col: str = "weight",
    id_col: str = "node",
    strict: bool = True,
) -> DataFrame:
    """(node, cluster): single-linkage flat clustering at similarity
    threshold ``cut`` — the kNN -> MST -> cut composition.  Builds the
    MAXIMUM spanning forest once, keeps forest edges with weight >= cut,
    and labels components (cluster = smallest member id, the engine-wide
    convention); every node of ``nodes`` gets a row (isolated -> own
    cluster).  Equal by the max-bottleneck property to components of the
    FULL graph restricted to weight >= cut, which is exactly what the
    oracle twin rebuilds."""
    spark = edges.sparkSession
    msf = boruvka_msf(edges, weight_col=weight_col, maximize=True, strict=strict)
    kept = msf.where(F.col("weight") >= int(cut)).localCheckpoint(eager=True)
    # forest trees ARE the adversarial chain-shaped input (single-linkage
    # chains by construction): pointer-jumping, O(log diameter) rounds.
    # The label loop runs under the superstep discipline (AQE off +
    # state-scaled partitions — forest edges bound the node count);
    # without it every tiny loop stage pays session-default task counts
    # plus per-job AQE re-planning (measured 17.3 -> ~4 s at sf0.1).
    with static_superstep_plan(
        spark, loop_shuffle_partitions(spark, 2 * kept.count())
    ):
        comp = dedup_clusters(
            kept.select(F.col("u").alias("doc_a"), F.col("v").alias("doc_b")),
            max_iters=MST_MERGE_STEPS,
            strict=strict,
            jump=True,
        )
    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    return base.join(
        comp, base.node == comp.doc_id, "left"
    ).select(
        "node", F.coalesce("cluster_id", "node").alias("cluster")
    )


# --- DuckDB oracle builders -------------------------------------------------


def _canonical_edges_sql(edges_sql: str, maximize: bool) -> str:
    best = "MAX" if maximize else "MIN"
    sgn = "-" if maximize else ""
    return f"""
  SELECT u, v, {best}(w) AS w, {sgn}{best}(w) AS sw FROM (
    SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v,
           CAST(weight AS BIGINT) AS w
    FROM ({edges_sql}) ce WHERE src <> dst
  ) cc GROUP BY u, v
"""


def boruvka_oracle_sql(
    edges_sql: str, rounds: int = 12, maximize: bool = False
) -> str:
    """Unrolled Borůvka rounds over ``edges_sql`` (src, dst, weight).

    Per round: ROW_NUMBER argmin on the identical strict key per
    component, then an EXACT recursive-closure merge of the claimed label
    pairs (no inner depth bound to guard).  Rounds past convergence are
    no-ops, so ``rounds`` only needs to dominate ceil(log2(components))
    at the COMPARE scale — pinned by the oracle-depth guard test."""
    # every multiply-referenced CTE is MATERIALIZED: DuckDB inlines plain
    # CTEs per reference, and a chain of rounds each referencing the
    # previous label table twice otherwise re-executes the whole prefix
    # exponentially (measured: rounds=3 already 16 s on a 24-node graph)
    parts = [
        f"WITH RECURSIVE mst_e AS MATERIALIZED ({_canonical_edges_sql(edges_sql, maximize)}),",
        "mst_lab0 AS MATERIALIZED (SELECT node, node AS label FROM "
        "(SELECT u AS node FROM mst_e UNION SELECT v FROM mst_e) nn),",
    ]
    for r in range(rounds):
        parts.append(f"""
mst_x{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.w, e.sw, la.label AS lu, lb.label AS lv
  FROM mst_e e
  JOIN mst_lab{r} la ON e.u = la.node
  JOIN mst_lab{r} lb ON e.v = lb.node
  WHERE la.label <> lb.label
),
mst_s{r} AS MATERIALIZED (
  SELECT DISTINCT u, v, w, lu, lv FROM (
    SELECT comp, u, v, w, lu, lv,
           ROW_NUMBER() OVER (PARTITION BY comp ORDER BY sw, u, v) AS rn
    FROM (
      SELECT lu AS comp, u, v, w, sw, lu, lv FROM mst_x{r}
      UNION ALL
      SELECT lv AS comp, u, v, w, sw, lu, lv FROM mst_x{r}
    ) c
  ) rr WHERE rn = 1
),
mst_p{r} AS MATERIALIZED (
  SELECT lu AS a, lv AS b FROM mst_s{r}
  UNION SELECT lv, lu FROM mst_s{r}
),
mst_r{r}(a, b) AS (
  SELECT a, a FROM (SELECT a FROM mst_p{r} UNION SELECT b FROM mst_p{r}) n0
  UNION
  SELECT rr.a, p.b FROM mst_r{r} rr JOIN mst_p{r} p ON rr.b = p.a
),
mst_m{r} AS MATERIALIZED (SELECT a AS old, MIN(b) AS new FROM mst_r{r} GROUP BY a),
mst_lab{r + 1} AS MATERIALIZED (
  SELECT l.node, COALESCE(m.new, l.label) AS label
  FROM mst_lab{r} l LEFT JOIN mst_m{r} m ON l.label = m.old
),""")
    union = "\nUNION ALL\n".join(
        f"SELECT u, v, w FROM mst_s{r}" for r in range(rounds)
    )
    parts.append(f"mst_forest AS ({union})")
    parts.append("SELECT u, v, w AS weight FROM mst_forest")
    return "\n".join(parts)


def single_linkage_oracle_sql(
    edges_sql: str, nodes_sql: str, cut: int
) -> str:
    """Single-linkage clusters at ``cut``, rebuilt WITHOUT the forest:
    exact recursive-closure components of the thresholded full graph —
    cross-algorithm gate for the kNN -> MST -> cut composition."""
    return f"""
WITH RECURSIVE sl_e AS MATERIALIZED (
  SELECT u, v FROM ({_canonical_edges_sql(edges_sql, True)}) ce
  WHERE w >= {int(cut)}
),
sl_p AS MATERIALIZED (
  SELECT u AS a, v AS b FROM sl_e UNION SELECT v, u FROM sl_e
),
sl_r(a, b) AS (
  SELECT a, a FROM (SELECT a FROM sl_p UNION SELECT b FROM sl_p) n0
  UNION
  SELECT rr.a, p.b FROM sl_r rr JOIN sl_p p ON rr.b = p.a
),
sl_m AS (SELECT a AS node, MIN(b) AS cluster FROM sl_r GROUP BY a)
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(COALESCE(m.cluster, n.node) AS BIGINT) AS cluster
FROM ({nodes_sql}) n LEFT JOIN sl_m m ON n.node = m.node
"""
