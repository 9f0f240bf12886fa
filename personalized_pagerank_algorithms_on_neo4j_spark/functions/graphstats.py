"""Graph feature engineering beyond PPR: multi-hop neighborhood stats.

`two_hop_neighbors` is the canonical friend-of-friend shape — the edge
self-join whose output explodes through hub nodes (a mid node of degree d
contributes in_deg(mid) * d pairs). The scale control is the HUB CAP:
exclude middle nodes whose out-degree exceeds the cap before the join,
exactly the argument behind the shingle-DF cap in `dedup.ngram_jaccard`
and the basket cap in `cooccurrence.item_jaccard` — a hub's 2-hop
contribution is near-uniform reachability, so dropping it changes little
while bounding the join output to in_deg * cap per mid. The cap is part
of the operator's declared semantics (the DuckDB oracle applies the same
cap), not a silent truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LOCAL_EDGE_THRESHOLD
from ..plans.iterative import BROADCAST_EDGE_BOUND, BROADCAST_NODE_BOUND

__all__ = [
    "two_hop_neighbors",
    "two_hop_oracle_sql",
    "triangle_counts",
    "triangle_oracle_sql",
    "clustering_coefficient",
    "clustering_oracle_sql",
    "node_similarity",
    "node_similarity_oracle_sql",
    "adamic_adar",
    "adamic_adar_oracle_sql",
    "k_core",
    "k_core_oracle_sql",
    "modularity",
    "modularity_oracle_sql",
    "degree_assortativity",
    "assortativity_oracle_sql",
    "symmetrize_edges",
]


def symmetrize_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple view of an edge list: both directions of every
    edge, self-loops dropped, distinct — the shared first step of every
    undirected graph operator (modularity, assortativity, eigenvector,
    walk corpora).  Callers materialize (localCheckpoint) when the result
    feeds multiple branches or a superstep loop."""
    e = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return e.unionAll(rev).where(F.col("src") != F.col("dst")).distinct()


def two_hop_neighbors(
    edges: DataFrame,
    hub_cap: int | None = 1_000,
) -> DataFrame:
    """(node, n_two_hop): distinct nodes reachable in exactly two hops —
    excluding the node itself and its direct out-neighbors. `hub_cap`
    drops middle nodes with out-degree > cap before the self-join."""
    e = edges.select("src", "dst")
    mid = e.groupBy(F.col("src").alias("mid")).agg(
        F.count(F.lit(1)).alias("mid_deg")
    )
    if hub_cap is not None:
        mid = mid.where(F.col("mid_deg") <= hub_cap)
    hop1 = e.join(mid, e.dst == mid.mid).select("src", "mid")
    e2 = e.select(F.col("src").alias("mid"), F.col("dst").alias("two"))
    pairs = (
        hop1.join(e2, "mid")
        .select("src", "two")
        .where(F.col("src") != F.col("two"))
        .join(
            e.select("src", F.col("dst").alias("two")), ["src", "two"], "left_anti"
        )
        .distinct()
    )
    return pairs.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("n_two_hop")
    )


# ---------------------------------------------------------------------------
# Driver-local triangle kernel (round-12 optimization)
# ---------------------------------------------------------------------------
# The degree-oriented triangle enumeration is pure integer logic, so a
# numpy replay under the LOCAL_EDGE_THRESHOLD gate is bit-exact by
# construction: same degree orientation (lower (deg, id) endpoint first),
# same wedge order ((bdeg, original-id) ascending within each source),
# same closing test (the wedge order IS the orientation order, so a
# closing edge is always oriented b1 -> b2).  Wedges generate in
# max-out-degree strided passes (compact-forward keeps out-degrees
# O(sqrt(m)), ~100 at sf0.1) and close through one searchsorted per pass
# — the vectorized equivalent of the wedge self-join + membership join.


_TRI_WEDGE_BUDGET = 256_000_000  # ~2 GB of transient per-pass masks


def _local_tri_corners(u, v):
    """Triangle corner arrays (a, b1, b2) — compact ids — plus the compact
    id table, for a CANONICAL (u < v, distinct) numpy edge set; None when
    the wedge count exceeds the driver work budget."""
    import numpy as np

    from .._nputil import lexsort_stable, unique_stable

    ids = unique_stable(np.concatenate([u, v]))
    n = len(ids)
    cu = np.searchsorted(ids, u)
    cv = np.searchsorted(ids, v)
    deg = np.bincount(np.concatenate([cu, cv]), minlength=n)
    # canonical u < v, so the (deg, id) orientation tie-break reduces to <=
    fwd = deg[cu] <= deg[cv]
    a = np.where(fwd, cu, cv)
    b = np.where(fwd, cv, cu)
    # wedge budget: the strided passes cost O(wedges) total; above the
    # budget the caller falls through to the distributed wedge join
    od = np.bincount(a, minlength=n).astype(np.int64)
    if int((od * (od - 1) // 2).sum()) > _TRI_WEDGE_BUDGET:
        return None
    # neighbors of each a in wedge order: (bdeg, original id) ascending —
    # compact ids preserve the original order, so b is the tie key
    order = lexsort_stable((b, deg[b], a))
    sa, sb = a[order], b[order]
    okey = np.sort(sa.astype(np.int64) * n + sb, kind="stable")
    tri_a, tri_b1, tri_b2 = [], [], []
    d = 1
    while True:
        if d >= len(sa):
            break
        same = sa[:-d] == sa[d:]
        if not same.any():
            break
        w1 = sb[:-d][same]
        w2 = sb[d:][same]
        wk = w1.astype(np.int64) * n + w2
        pos = np.searchsorted(okey, wk)
        closed = (pos < len(okey)) & (okey[np.minimum(pos, len(okey) - 1)] == wk)
        if closed.any():
            tri_a.append(sa[:-d][same][closed])
            tri_b1.append(w1[closed])
            tri_b2.append(w2[closed])
        d += 1
    if tri_a:
        return (
            np.concatenate(tri_a),
            np.concatenate(tri_b1),
            np.concatenate(tri_b2),
            ids,
            cu,
            cv,
        )
    z = np.zeros(0, dtype=np.int64)
    return z, z, z, ids, cu, cv


def _collect_canonical_edges(und: DataFrame):
    """Canonical edge set to the driver under the edge gate, or None."""
    if LOCAL_EDGE_THRESHOLD <= 0 or und.count() > LOCAL_EDGE_THRESHOLD:
        return None
    import numpy as np

    pdf = und.select("u", "v").toPandas()
    return (
        pdf["u"].to_numpy(dtype=np.int64),
        pdf["v"].to_numpy(dtype=np.int64),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles) over the UNDIRECTED simple graph induced by the
    edge list (direction and multiplicity dropped, self-loops removed).

    Scale shape — compact-forward / degree ordering, the standard
    distributed triangle algorithm: each undirected edge is oriented from
    its lower-(degree, id) endpoint to its higher one, so every node's
    oriented out-degree is O(sqrt(m)) and the wedge self-join is bounded
    by sum(out_deg^2) <= O(m^1.5) REGARDLESS of hubs — no cap needed,
    unlike the two-hop operator, because orientation already kills the
    hub blow-up. Each triangle is found exactly once (at its lowest-order
    corner) and credited to all three corners."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    local = _collect_canonical_edges(und)
    if local is not None:
        import numpy as np
        import pandas as pd

        tri = _local_tri_corners(*local)
        if tri is not None:
            ta, tb1, tb2, ids, _, _ = tri
            cnt = np.bincount(
                np.concatenate([ta, tb1, tb2]), minlength=len(ids)
            )
            nz = np.nonzero(cnt)[0]
            node_t = und.schema["u"].dataType.simpleString()
            return und.sparkSession.createDataFrame(
                pd.DataFrame(
                    {"node": ids[nz], "n_triangles": cnt[nz].astype(np.int64)}
                ),
                schema=f"node {node_t}, n_triangles bigint",
            )
    tri = _oriented_triangles(und)
    corners = (
        tri.selectExpr("a AS node")
        .unionAll(tri.selectExpr("b1 AS node"))
        .unionAll(tri.selectExpr("b2 AS node"))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of `triangle_counts` over any (src, dst) edge SQL."""
    return f"""
WITH e AS ({edges_sql}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY node
),
o AS (
  SELECT CASE WHEN fwd THEN u ELSE v END AS a,
         CASE WHEN fwd THEN v ELSE u END AS b,
         CASE WHEN fwd THEN dv ELSE du END AS bdeg
  FROM (
    SELECT und.u, und.v, du.deg AS du, dv.deg AS dv,
           (du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)) AS fwd
    FROM und
    JOIN deg du ON du.node = und.u
    JOIN deg dv ON dv.node = und.v
  )
),
tri AS (
  SELECT e1.a AS a, e1.b AS b1, e2.b AS b2
  FROM o e1
  JOIN o e2 ON e1.a = e2.a
   AND (e1.bdeg < e2.bdeg OR (e1.bdeg = e2.bdeg AND e1.b < e2.b))
  JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT node, COUNT(*) AS n_triangles FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b1 AS node FROM tri
  UNION ALL SELECT b2 AS node FROM tri
) GROUP BY node
"""


def triangle_count_sampled(
    edges: DataFrame, seed: int = 0, denom: int = 2
) -> DataFrame:
    """(n_edges_und, n_edges_sampled, triangles_sampled, triangles_est):
    DOULION global triangle estimation (Tsourakakis et al., KDD 2009) —
    keep each undirected edge with probability p = 1/denom via a
    portable seeded hash, count triangles EXACTLY on the sparsified
    graph, scale by 1/p^3.  Unbiased (each surviving triangle needed all
    three edges kept: E[count] = p^3 * T) with variance vanishing as
    triangles grow; the hash draw makes the estimate deterministic and
    rerun/repartition-stable, like every sampler in this repo.

    Scale shape: the exact counting cost drops by ~p^1.5 on the
    orientation-bounded wedge join (sum out_deg^2 over a p-sampled
    graph), which is the point at 100 TB — DOULION is the standard
    answer when exact triangle counting's O(m^1.5) is the bottleneck.
    Integer-only output: p = 1/denom makes the scale factor the exact
    integer denom^3, so est = triangles_sampled * denom^3 cross-engine
    exactly."""
    from .text import portable_hash

    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds the size probe AND the sample
    )
    samp = und.where(
        portable_hash(F.concat_ws("|", F.col("u"), F.col("v")), seed=seed)
        % denom
        == 0
    )
    tri = _oriented_triangles(samp)
    counts = tri.agg(F.count(F.lit(1)).alias("triangles_sampled"))
    sizes = und.agg(F.count(F.lit(1)).alias("n_edges_und")).crossJoin(
        samp.agg(F.count(F.lit(1)).alias("n_edges_sampled"))
    )
    return sizes.crossJoin(F.broadcast(counts)).select(
        "n_edges_und",
        "n_edges_sampled",
        "triangles_sampled",
        (F.col("triangles_sampled") * F.lit(denom**3)).alias("triangles_est"),
    )


def triangles_doulion_oracle_sql(
    edges_sql: str, seed: int = 0, denom: int = 2
) -> str:
    """DuckDB twin of `triangle_count_sampled` (the triangle_oracle_sql
    orientation algebra over the hash-sampled undirected edge set)."""
    h = (
        "CAST(('0x' || substring(md5(CAST(u AS VARCHAR) || '|' || "
        f"CAST(v AS VARCHAR) || '#' || '{seed}'), 1, 12)) AS BIGINT)"
    )
    return f"""
WITH dle AS ({edges_sql}),
dlund AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM dle WHERE src <> dst),
dlsamp AS MATERIALIZED (SELECT u, v FROM dlund WHERE {h} % {denom} = 0),
dldeg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM dlsamp UNION ALL SELECT v AS node FROM dlsamp
  ) GROUP BY node),
dlo AS (
  SELECT CASE WHEN fwd THEN u ELSE v END AS a,
         CASE WHEN fwd THEN v ELSE u END AS b,
         CASE WHEN fwd THEN dv ELSE du END AS bdeg
  FROM (
    SELECT s.u, s.v, du.deg AS du, dv.deg AS dv,
           (du.deg < dv.deg OR (du.deg = dv.deg AND s.u < s.v)) AS fwd
    FROM dlsamp s
    JOIN dldeg du ON du.node = s.u
    JOIN dldeg dv ON dv.node = s.v)),
dltri AS (
  SELECT e1.a, e1.b AS b1, e2.b AS b2
  FROM dlo e1
  JOIN dlo e2 ON e1.a = e2.a
   AND (e1.bdeg < e2.bdeg OR (e1.bdeg = e2.bdeg AND e1.b < e2.b))
  JOIN dlo e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dlund) AS n_edges_und,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dlsamp) AS n_edges_sampled,
       CAST(COUNT(*) AS BIGINT) AS triangles_sampled,
       CAST(COUNT(*) * {denom ** 3} AS BIGINT) AS triangles_est
FROM dltri
"""


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(node, deg, n_triangles, cc) over the same undirected simple graph
    as `triangle_counts`: local clustering coefficient
    cc = 2*T(v) / (deg(v) * (deg(v)-1)), defined 0 when deg < 2.

    Scale shape: the triangle side is the degree-ordered O(m^1.5) wedge
    join; this adds only one node-bounded degree aggregate and a left
    join from it, so every node incident to an edge gets a row (cc = 0
    for triangle-free nodes)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.selectExpr("u AS node")
        .unionAll(und.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(edges)
    t = F.coalesce("n_triangles", F.lit(0)).cast("long")
    return deg.join(tri, "node", "left").select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        t.alias("n_triangles"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                F.lit(2.0) * t.cast("double")
                / (F.col("deg").cast("double") * (F.col("deg") - F.lit(1))),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("cc"),
    )


def clustering_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of `clustering_coefficient` (wraps the triangle oracle)."""
    return f"""
WITH tri AS MATERIALIZED (
  SELECT * FROM ({triangle_oracle_sql(edges_sql)}) t
),
e AS ({edges_sql}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY node
)
SELECT deg.node, CAST(deg.deg AS BIGINT) AS deg,
       CAST(COALESCE(tri.n_triangles, 0) AS BIGINT) AS n_triangles,
       ROUND(CASE WHEN deg.deg >= 2
                  THEN 2.0 * COALESCE(tri.n_triangles, 0)
                       / (CAST(deg.deg AS DOUBLE) * (deg.deg - 1))
                  ELSE 0.0 END, 9) AS cc
FROM deg LEFT JOIN tri ON deg.node = tri.node
"""


def node_similarity(
    edges: DataFrame,
    threshold: float = 0.2,
    hub_cap: int | None = 1_000,
) -> DataFrame:
    """(node_a, node_b, n_common, jaccard) for node pairs sharing at least
    one OUT-neighbor, scored by Jaccard over their out-neighbor sets —
    the Neo4j GDS nodeSimilarity shape re-expressed as one reverse-edge
    self-join + one groupBy.

    Scale shape: pairs are generated per SHARED NEIGHBOR, so a popular
    neighbor with in-degree d contributes d^2 pairs — the same hub
    explosion as `two_hop_neighbors`, controlled by the same declared
    hub cap (shared neighbors with in-degree > cap are excluded from
    pair generation in both engines). Degrees join back from a
    node-count-bounded aggregate."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    # referenced by both pair-generation sides plus the degree aggregate:
    # materialize once instead of three distinct-scans of the edge table
    e = e.localCheckpoint(eager=True)
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    a = e.select(F.col("src").alias("node_a"), F.col("dst").alias("mid"))
    b = e.select(F.col("src").alias("node_b"), F.col("dst").alias("mid"))
    if hub_cap is not None:
        capped = (
            e.groupBy(F.col("dst").alias("mid"))
            .agg(F.count(F.lit(1)).alias("in_deg"))
            .where(F.col("in_deg") <= hub_cap)
            .select("mid")
        )
        a = a.join(capped, "mid")
    # (no cap -> no in-degree aggregate, no extra join: the semi-filter
    # would be a semantic no-op on the operator's hottest path)
    common = (
        a.join(b, "mid")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = out_deg.select(F.col("node").alias("node_a"), F.col("deg").alias("da"))
    db = out_deg.select(F.col("node").alias("node_b"), F.col("deg").alias("db"))
    return (
        common.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def node_similarity_oracle_sql(
    edges_sql: str, threshold: float = 0.2, hub_cap: int | None = 1_000
) -> str:
    """DuckDB twin of `node_similarity` over any (src, dst) edge SQL."""
    cap_clause = f"WHERE in_deg <= {hub_cap}" if hub_cap is not None else ""
    return f"""
WITH raw AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
out_deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
mid AS (
  SELECT mid FROM (
    SELECT dst AS mid, COUNT(*) AS in_deg FROM e GROUP BY 1
  ) {cap_clause}
),
common AS (
  SELECT a.src AS node_a, b.src AS node_b, COUNT(*) AS n_common
  FROM e a
  JOIN mid m ON a.dst = m.mid
  JOIN e b ON b.dst = a.dst AND a.src < b.src
  GROUP BY 1, 2
)
SELECT c.node_a, c.node_b, c.n_common,
       ROUND(CAST(c.n_common AS DOUBLE)
             / CAST(da.deg + db.deg - c.n_common AS DOUBLE), 6) AS jaccard
FROM common c
JOIN out_deg da ON da.node = c.node_a
JOIN out_deg db ON db.node = c.node_b
WHERE ROUND(CAST(c.n_common AS DOUBLE)
            / CAST(da.deg + db.deg - c.n_common AS DOUBLE), 6) >= {threshold}
"""


def adamic_adar(
    edges: DataFrame,
    threshold: float = 0.0,
    hub_cap: int | None = 1_000,
) -> DataFrame:
    """(node_a, node_b, n_common, score) link-prediction scores: for every
    pair sharing at least one OUT-neighbor, score = sum over shared
    neighbors w of 1 / ln(in_deg(w)) — rare shared neighbors count more
    (Adamic-Adar, the gds.alpha.linkprediction.adamicAdar shape in this
    engine's directed convention: shared OUT-neighbors, weighted by the
    neighbor's in-degree).

    Scale shape: identical to `node_similarity` — pairs generate per
    shared neighbor (hub-capped), the weight joins from the in-degree
    aggregate the cap already computes, one groupBy sums the pair. A
    shared neighbor has in_deg >= 2 by construction, so ln() is never 0.
    Determinism: weights are summed as NANO-SCALED INTEGERS
    (round(1e9/ln(d)) as long) — a float sum is summation-order-dependent
    and 1-ulp drift at a ROUND(_, 6) boundary flips the last digit
    between engines (observed on ~1% of pairs); integer sums are exact in
    any order, and the hub cap bounds them at ~7e11 << 2^63."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)  # pair sides + degree agg share it
    ind = e.groupBy(F.col("dst").alias("mid")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    mids = ind.where(F.col("in_deg") >= 2)
    if hub_cap is not None:
        mids = mids.where(F.col("in_deg") <= hub_cap)
    weights = mids.select(
        "mid",
        F.round(F.lit(1e9) / F.log(F.col("in_deg").cast("double")))
        .cast("long")
        .alias("w_nano"),
    )
    a = e.select(F.col("src").alias("node_a"), F.col("dst").alias("mid"))
    b = e.select(F.col("src").alias("node_b"), F.col("dst").alias("mid"))
    return (
        a.join(weights, "mid")
        .join(b, "mid")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            # HALF_UP to 6 decimals in pure integer arithmetic: double
            # ROUND at an exact .5 decimal differs between engines
            # (Spark rounds the decimal string, DuckDB the binary double)
            (
                F.floor((F.sum("w_nano") + F.lit(500)) / F.lit(1000)).cast("long")
                / F.lit(1e6)
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def adamic_adar_oracle_sql(
    edges_sql: str, threshold: float = 0.0, hub_cap: int | None = 1_000
) -> str:
    """DuckDB twin of `adamic_adar` over any (src, dst) edge SQL."""
    cap = f"AND in_deg <= {hub_cap}" if hub_cap is not None else ""
    return f"""
WITH raw AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
w AS (
  SELECT mid,
         CAST(ROUND(1000000000.0 / ln(CAST(in_deg AS DOUBLE))) AS BIGINT)
           AS w_nano
  FROM (
    SELECT dst AS mid, COUNT(*) AS in_deg FROM e GROUP BY 1
  ) WHERE in_deg >= 2 {cap}
),
pairs AS (
  SELECT a.src AS node_a, b.src AS node_b,
         COUNT(*) AS n_common,
         ((CAST(SUM(w.w_nano) AS BIGINT) + 500) // 1000) / 1000000.0 AS score
  FROM e a
  JOIN w ON a.dst = w.mid
  JOIN e b ON b.dst = a.dst AND a.src < b.src
  GROUP BY 1, 2
)
SELECT node_a, node_b, n_common, score FROM pairs WHERE score >= {threshold}
"""


def k_core(edges: DataFrame, k: int = 3, max_rounds: int | None = None) -> DataFrame:
    """(node, core_degree): the k-core of the UNDIRECTED simple graph —
    the maximal subgraph where every node keeps degree >= k — by iterative
    peeling: drop nodes under degree k, recompute degrees on the induced
    subgraph, repeat to the fixed point. core_degree is the node's degree
    WITHIN the k-core.

    Scale shape: each round is one degree aggregate + two semi-joins over
    the shrinking edge set; the round count is data-dependent — usually
    the peeling depth is shallow, but chain/tree-shaped graphs at low k
    legitimately peel O(n) rounds (each round only exposes the next layer
    of endpoints). The default therefore runs to the fixed point, which
    is guaranteed to terminate: every non-final round strictly removes at
    least one edge. Pass ``max_rounds`` to bound the job count instead;
    the function raises rather than return a truncated core, which would
    silently contain under-degree nodes."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        deg = (
            und.selectExpr("u AS node")
            .unionAll(und.selectExpr("v AS node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node").localCheckpoint(
            eager=True
        )
        pruned = (
            und.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        if pruned.count() == und.count():
            return (
                pruned.selectExpr("u AS node")
                .unionAll(pruned.selectExpr("v AS node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("core_degree"))
            )
        und = pruned
    raise RuntimeError(f"k_core did not converge within {max_rounds} rounds")


def _oriented_triangles(und: DataFrame) -> DataFrame:
    """tri(a, b1, b2): every triangle of a CANONICAL (u < v, distinct)
    edge set, found exactly once — the compact-forward / degree-ordered
    enumeration shared by `triangle_counts` and k-truss support: orient
    each edge from its lower-(deg, id) endpoint so every oriented
    out-degree is O(sqrt(m)) and the wedge self-join is bounded by
    O(m^1.5) regardless of hubs.

    The oriented table feeds THREE join sides; without materialization
    Spark re-derives degree+orientation for each reference (3x the edge
    scan at scale — the plan audit showed 280 exchanges).
    Pre-partitioning by the wedge key lets BOTH sides of the self-join
    reuse the checkpoint's layout; the closure probe broadcasts the
    oriented edges under ``BROADCAST_EDGE_BOUND`` so the wedges — the
    biggest frame in the operator — never shuffle."""
    deg = (
        und.selectExpr("u AS node")
        .unionAll(und.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("bdeg"),
    )
    shuffle_n = int(und.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    o = o.repartition(shuffle_n, "a").localCheckpoint(eager=True)
    e1 = o.select("a", F.col("b").alias("b1"), F.col("bdeg").alias("d1"))
    e2 = o.select("a", F.col("b").alias("b2"), F.col("bdeg").alias("d2"))
    wedges = e1.join(e2, "a").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("b1") < F.col("b2")))
    )
    closing = o.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    if o.count() <= BROADCAST_EDGE_BOUND:
        closing = F.broadcast(closing)
    return wedges.join(closing, ["b1", "b2"]).select("a", "b1", "b2")


def _edge_triangle_support(und: DataFrame) -> DataFrame:
    """(u, v, s): per-edge triangle counts over a CANONICAL (u < v,
    distinct, checkpointed) edge set — the support step of k-truss
    peeling; each triangle credits its THREE canonical edges.  Edges in
    no triangle get no row."""
    tri = _oriented_triangles(und)
    sides = (
        tri.select(
            F.least("a", "b1").alias("u"), F.greatest("a", "b1").alias("v")
        )
        .unionAll(
            tri.select(
                F.least("a", "b2").alias("u"), F.greatest("a", "b2").alias("v")
            )
        )
        .unionAll(
            tri.select(
                F.least("b1", "b2").alias("u"), F.greatest("b1", "b2").alias("v")
            )
        )
    )
    return sides.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("s"))


def _local_k_truss(und, u, v, k: int, max_rounds: int | None):
    """Driver-local support-peeling replay: per round one triangle
    enumeration + one integer filter over the shrinking canonical edge
    set — identical fixed point (and identical non-convergence raise) to
    the distributed loop.  None when a round's wedge count exceeds the
    driver budget (the distributed loop takes over from scratch)."""
    import numpy as np
    import pandas as pd

    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        tri = _local_tri_corners(u, v)
        if tri is None:
            return None
        ta, tb1, tb2, ids, cu, cv = tri
        n = len(ids)
        ekey = cu.astype(np.int64) * n + cv  # canonical u < v
        eorder = np.argsort(ekey, kind="stable")
        sorted_ekey = ekey[eorder]
        sides = np.concatenate(
            [
                np.minimum(ta, tb1) * n + np.maximum(ta, tb1),
                np.minimum(ta, tb2) * n + np.maximum(ta, tb2),
                np.minimum(tb1, tb2) * n + np.maximum(tb1, tb2),
            ]
        )
        if sides.size:
            hit = np.searchsorted(sorted_ekey, sides)
            sup = np.bincount(eorder[hit], minlength=len(u)).astype(np.int64)
        else:
            sup = np.zeros(len(u), dtype=np.int64)
        keep = sup >= k - 2
        if keep.all():
            return und.sparkSession.createDataFrame(
                pd.DataFrame({"u": u, "v": v, "support": sup}),
                schema=(
                    f"u {und.schema['u'].dataType.simpleString()}, "
                    f"v {und.schema['v'].dataType.simpleString()}, "
                    "support bigint"
                ),
            )
        u, v = u[keep], v[keep]
    raise RuntimeError(f"k_truss did not converge within {max_rounds} rounds")


def k_truss(
    edges: DataFrame, k: int = 3, max_rounds: int | None = None
) -> DataFrame:
    """(u, v, support): the k-truss of the UNDIRECTED simple graph — the
    maximal subgraph where every edge closes at least k-2 triangles WITHIN
    the subgraph — by iterative support peeling: count per-edge triangles,
    drop edges under k-2, recompute on the survivors, repeat to the fixed
    point.  ``support`` is the edge's triangle count within the truss.
    The cohesion verb one step above `k_core`: cores bound degrees, trusses
    bound triangle embeddedness (Cohen 2008).

    All quantities integral — exact cross-engine equality, no rounding
    gate.  Scale shape: each round is one degree-oriented triangle
    enumeration (O(m^1.5) wedge join, no hub cap — `_edge_triangle_support`)
    plus one edge filter over the SHRINKING edge set; like `k_core`, the
    default runs to the guaranteed-terminating fixed point (every non-final
    round strictly removes an edge) and ``max_rounds`` raises rather than
    return a truncated truss."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    local = _collect_canonical_edges(und)
    if local is not None:
        out = _local_k_truss(und, *local, k=k, max_rounds=max_rounds)
        if out is not None:
            return out
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        sup = _edge_triangle_support(und)
        keep = (
            und.join(sup, ["u", "v"], "left")
            .select(
                "u", "v", F.coalesce(F.col("s"), F.lit(0)).alias("support")
            )
            .where(F.col("support") >= k - 2)
            .localCheckpoint(eager=True)
        )
        if keep.count() == und.count():
            return keep
        # keep is already checkpointed; the projection is zero-cost on top
        und = keep.select("u", "v")
    raise RuntimeError(f"k_truss did not converge within {max_rounds} rounds")


def k_truss_oracle_sql(edges_sql: str, k: int = 3, rounds: int = 4) -> str:
    """DuckDB twin: ``rounds`` unrolled peel steps (id-ordered triangle
    enumeration — same triangle set as the degree-ordered Spark side;
    extra rounds past the fixed point are no-ops), then the within-truss
    support of the surviving edges."""
    ctes = [
        f"kt_raw AS ({edges_sql})",
        """kt_e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM kt_raw WHERE src <> dst)""",
    ]
    for i in range(rounds + 1):  # one extra support pass for the output
        ctes.append(
            f"""kt_t{i} AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM kt_e{i} e1
  JOIN kt_e{i} e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN kt_e{i} e3 ON e3.u = e1.v AND e3.v = e2.v)"""
        )
        ctes.append(
            f"""kt_s{i} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM (
    SELECT a AS u, b AS v FROM kt_t{i}
    UNION ALL SELECT a, c FROM kt_t{i}
    UNION ALL SELECT b, c FROM kt_t{i}) GROUP BY 1, 2)"""
        )
        if i < rounds:
            ctes.append(
                f"""kt_e{i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM kt_e{i} e
  JOIN kt_s{i} s ON e.u = s.u AND e.v = s.v
  WHERE s.s >= {k - 2})"""
            )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT e.u, e.v, COALESCE(s.s, 0) AS support
FROM kt_e{rounds} e
LEFT JOIN kt_s{rounds} s ON e.u = s.u AND e.v = s.v
WHERE COALESCE(s.s, 0) >= {k - 2}
"""


def k_core_oracle_sql(edges_sql: str, k: int = 3, rounds: int = 10) -> str:
    """DuckDB twin: ``rounds`` unrolled peeling steps (extra rounds past
    the fixed point are no-ops, so any depth >= the actual peeling depth
    matches the converged Spark result)."""
    ctes = [
        f"raw AS ({edges_sql})",
        """e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""k{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT node, COUNT(*) AS deg FROM (
      SELECT u AS node FROM e{i} UNION ALL SELECT v AS node FROM e{i}
    ) GROUP BY node
  ) WHERE deg >= {k})"""
        )
        ctes.append(
            f"""e{i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i} e
  WHERE e.u IN (SELECT node FROM k{i}) AND e.v IN (SELECT node FROM k{i}))"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT node, COUNT(*) AS core_degree FROM (
  SELECT u AS node FROM e{rounds} UNION ALL SELECT v AS node FROM e{rounds}
) GROUP BY node
"""


def two_hop_oracle_sql(edges_sql: str, hub_cap: int | None = 1_000) -> str:
    """DuckDB twin over any edge-producing SQL (columns src, dst)."""
    cap_clause = f"WHERE mid_deg <= {hub_cap}" if hub_cap is not None else ""
    return f"""
WITH e AS ({edges_sql}),
mid AS (
  SELECT src AS mid, COUNT(*) AS mid_deg FROM e GROUP BY 1
),
capped AS (SELECT mid FROM mid {cap_clause}),
pairs AS (
  SELECT DISTINCT e1.src AS src, e2.dst AS two
  FROM e e1
  JOIN capped c ON e1.dst = c.mid
  JOIN e e2 ON e2.src = e1.dst
  WHERE e1.src <> e2.dst
    AND NOT EXISTS (
      SELECT 1 FROM e d WHERE d.src = e1.src AND d.dst = e2.dst
    )
)
SELECT src AS node, COUNT(*) AS n_two_hop FROM pairs GROUP BY 1
"""


NEG_BUCKET_TARGET = 8  # expected nodes per sampling bucket


def link_negatives(
    edges: DataFrame,
    nodes: DataFrame,
    k: int = 3,
    seed: int = 0,
    oversample: int = 3,
) -> DataFrame:
    """(src, neg, i): up to ``k`` deterministic NEGATIVE destinations per
    source node — the link-prediction / contrastive-training sampling
    step (positives are the edges; negatives are hash-sampled non-edges).

    Mapping draws to nodes never touches the id SPACE (real id layouts
    are sparse — a range-modulo draw would miss almost always): nodes
    hash into ~``NEG_BUCKET_TARGET``-node buckets, each (src, draw)
    probes ONE bucket, and the candidate is the bucket member with the
    lexicographically smallest md5(id#src#draw#seed) key — a fresh key
    per draw AND per seed, so repeated probes of one bucket usually pick
    different members and different seeds yield different samples even
    on single-bucket graphs.  Two draws can still collide on the same
    member, so candidates are deduplicated per (src, neg) keeping the
    earliest draw; candidates equal to src or forming a real edge are
    dropped (anti join); the first ``k`` DISTINCT survivors by draw
    index are emitted with a dense rank ``i``.  Sources where fewer than
    k of the oversample*k draws survive emit fewer rows (documented; no
    rejection loop).

    Scale shape: one k*oversample expand, one bucket equi-join whose
    fan-out is the bucket size (tunable constant), one (src, draw)
    argmin aggregate, one edge anti-join, one bounded per-src window.
    No node-set broadcast, no dense-rank global sort, no id-space
    assumptions.
    """
    from pyspark.sql import Window

    from .text import portable_hash

    n_nodes = nodes.count()
    if n_nodes == 0:
        return edges.sparkSession.createDataFrame([], "src long, neg long, i int")
    n_buckets = max(1, n_nodes // NEG_BUCKET_TARGET)
    nb = nodes.select(
        F.col("id").cast("long").alias("cand"),
        (portable_hash(F.col("id"), 1) % F.lit(n_buckets)).alias("b"),
    )
    srcs = edges.select("src").distinct()
    draws = srcs.select(
        "src",
        F.explode(F.sequence(F.lit(0), F.lit(k * oversample - 1))).alias("d"),
    ).select(
        "src",
        "d",
        (
            portable_hash(F.col("src"), F.col("d") + F.lit(seed * 1000))
            % F.lit(n_buckets)
        ).alias("b"),
    )
    keyed = (
        draws.join(nb, "b")
        .where(F.col("cand") != F.col("src"))
        .select(
            "src",
            "d",
            F.concat(
                F.md5(
                    F.concat_ws(
                        "#",
                        F.col("cand").cast("string"),
                        F.col("src").cast("string"),
                        F.col("d").cast("string"),
                        F.lit(str(seed)),
                    )
                ),
                F.lit(":"),
                F.col("cand").cast("string"),
            ).alias("kk"),
        )
        .groupBy("src", "d")
        .agg(F.min("kk").alias("kk"))
        .select(
            "src",
            "d",
            F.split(F.col("kk"), ":").getItem(1).cast("long").alias("neg"),
        )
        # two draws may argmin onto the same member: keep the earliest draw
        .groupBy("src", "neg")
        .agg(F.min("d").alias("d"))
    )
    kept = keyed.join(
        edges.select("src", F.col("dst").alias("neg")), ["src", "neg"], "left_anti"
    )
    win = Window.partitionBy("src").orderBy("d")
    return (
        kept.withColumn("_r", F.row_number().over(win))
        .where(F.col("_r") <= k)
        .select("src", "neg", (F.col("_r") - 1).cast("int").alias("i"))
    )


def link_negatives_oracle_sql(
    edges_sql: str,
    nodes_sql: str,
    k: int = 3,
    seed: int = 0,
    oversample: int = 3,
) -> str:
    """DuckDB twin of `link_negatives` (identical md5 hashes, bucket
    arithmetic, and argmin key)."""
    hid = (
        "CAST(('0x' || substring(md5(CAST(id AS VARCHAR) || '#' || '1')"
        ", 1, 12)) AS BIGINT)"
    )
    hdraw = (
        "CAST(('0x' || substring(md5(CAST(src AS VARCHAR) || '#' || "
        f"CAST(d + {seed * 1000} AS VARCHAR)), 1, 12)) AS BIGINT)"
    )
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
n AS MATERIALIZED (SELECT CAST(id AS BIGINT) AS id FROM ({nodes_sql})),
nbk AS (SELECT GREATEST(1, COUNT(*) // {NEG_BUCKET_TARGET}) AS nb FROM n),
buckets AS (SELECT id AS cand, {hid} % nb AS b FROM n CROSS JOIN nbk),
srcs AS (SELECT DISTINCT src FROM e),
draws AS (
  SELECT src, CAST(i AS INT) AS d, {hdraw} % nb AS b
  FROM (SELECT src, unnest(range(0, {k * oversample})) AS i FROM srcs) _dr,
       nbk
),
keyed AS (
  SELECT src, d,
         MIN(md5(CAST(cand AS VARCHAR) || '#' || CAST(src AS VARCHAR)
                 || '#' || CAST(d AS VARCHAR) || '#' || '{seed}')
             || ':' || CAST(cand AS VARCHAR)) AS kk
  FROM draws JOIN buckets USING (b)
  WHERE cand <> src
  GROUP BY 1, 2
),
cand AS (
  SELECT src, MIN(d) AS d, neg FROM (
    SELECT src, d, CAST(string_split(kk, ':')[2] AS BIGINT) AS neg FROM keyed
  ) GROUP BY src, neg
),
kept AS (
  SELECT c.src, c.d, c.neg
  FROM cand c LEFT JOIN e ON e.src = c.src AND e.dst = c.neg
  WHERE e.src IS NULL
),
ranked AS (
  SELECT src, neg, ROW_NUMBER() OVER (PARTITION BY src ORDER BY d) AS r
  FROM kept
)
SELECT src, neg, CAST(r - 1 AS INT) AS i FROM ranked WHERE r <= {k}
"""


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, n_nodes, inside_edges, degree_sum, q_term): per-community
    Newman modularity terms for a node->community assignment over the
    UNDIRECTED simple graph induced by the edge list — the quality metric
    every community verb (graph_lpa here, `gds.labelPropagation` /
    `gds.louvain` on the reference's host platform) is judged by; total
    modularity Q is SUM(q_term).

    Float-free contract: with m2 = |directed undirected-edge rows| = 2m,
    w_c = within-community directed rows (= 2 * inside edges) and
    d_c = community degree sum, the per-community term

        q_c = m_c/m - (d_c/2m)^2 = (m2*w_c - d_c^2) / m2^2

    has an EXACT BIGINT numerator — every quantity is integral until the
    single final division (then ROUND(_, 9)), so cross-engine equality is
    bit-exact (same discipline as betweenness' micro-units).  Exact while
    max(m2*w_c, d_c^2) < 2^63 — the d_c^2 term binds first on a
    hub-heavy community (d_c up to 2m), so the worst-case safe size is
    ~1.5e9 undirected edges.

    `labels` must cover every node incident to an edge (LPA output does by
    construction); labeled isolated nodes contribute n_nodes only.  An
    edgeless input yields NULL q_terms (m2 = 0 has no defined modularity).

    Scale shape: two label joins onto the edge table — broadcast when the
    label vector fits ``BROADCAST_NODE_BOUND`` so the edge table never
    exchanges for them; above the bound they shuffle on the node key (the
    100x plan) — three key-grouped aggregates, one broadcast scalar.  No
    window, no driver loop."""
    # read by the degree aggregate, the within-count join and the m2
    # scalar: materialize once instead of three distinct-scans
    und = symmetrize_edges(edges).localCheckpoint(eager=True)
    # referenced by both endpoint joins plus the per-label rollup:
    # materialize once; the count both sizes the broadcast gate and is the
    # frame's only full pass
    lab = labels.select("node", "label").localCheckpoint(eager=True)
    small = lab.count() <= BROADCAST_NODE_BOUND
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    m2 = und.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    ls = lab.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    ld = lab.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    win = (
        und.join(F.broadcast(ls) if small else ls, "src")
        .join(F.broadcast(ld) if small else ld, "dst")
        .where(F.col("lsrc") == F.col("ldst"))
        .groupBy(F.col("lsrc").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    per_label = (
        lab.join(F.broadcast(deg) if small else deg, "node", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.coalesce(F.col("deg"), F.lit(0))).cast("long").alias("dc"),
        )
    )
    return (
        per_label.join(F.broadcast(win) if small else win, "label", "left")
        .na.fill({"w": 0})
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            "n_nodes",
            F.floor(F.col("w") / 2).cast("long").alias("inside_edges"),
            F.col("dc").alias("degree_sum"),
            F.when(
                F.col("m2") > 0,
                F.round(
                    (
                        F.col("m2") * F.col("w") - F.col("dc") * F.col("dc")
                    ).cast("double")
                    / (F.col("m2").cast("double") * F.col("m2").cast("double")),
                    9,
                ),
            ).alias("q_term"),
        )
    )


def modularity_oracle_sql(edges_sql: str, labels_sql: str) -> str:
    """DuckDB twin of `modularity`; ``labels_sql`` is any (node, label)
    SELECT (nested WITH allowed — the LPA oracle drops in verbatim; CTE
    names here are q_-prefixed so they never collide with the nested
    query's own aliases, which DuckDB rejects as duplicates)."""
    return f"""
WITH q_e_raw AS ({edges_sql}),
q_und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM q_e_raw WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM q_e_raw WHERE src <> dst)),
q_lab AS MATERIALIZED (SELECT node, label FROM ({labels_sql})),
q_deg AS (SELECT src AS node, COUNT(*) AS deg FROM q_und GROUP BY 1),
q_m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM q_und),
q_win AS (
  SELECT ls.label, CAST(COUNT(*) AS BIGINT) AS w
  FROM q_und u
  JOIN q_lab ls ON u.src = ls.node
  JOIN q_lab ld ON u.dst = ld.node
  WHERE ls.label = ld.label
  GROUP BY 1),
q_per_label AS (
  SELECT l.label,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(COALESCE(d.deg, 0)) AS BIGINT) AS dc
  FROM q_lab l LEFT JOIN q_deg d ON l.node = d.node
  GROUP BY 1)
SELECT p.label, p.n_nodes,
       CAST(FLOOR(COALESCE(w.w, 0) / 2) AS BIGINT) AS inside_edges,
       p.dc AS degree_sum,
       CASE WHEN m.m2 > 0 THEN ROUND(
         CAST(m.m2 * COALESCE(w.w, 0) - p.dc * p.dc AS DOUBLE)
         / (CAST(m.m2 AS DOUBLE) * CAST(m.m2 AS DOUBLE)), 9)
       END AS q_term
FROM q_per_label p LEFT JOIN q_win w ON p.label = w.label CROSS JOIN q_m m
"""


def conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, n_nodes, cut_edges, volume, conductance): per-community
    conductance over the UNDIRECTED simple graph induced by the edge list —
    the community-boundary quality metric (`gds.conductance` on the
    reference's host platform) that complements modularity: how leaky is
    each community,

        phi_c = cut_c / min(vol_c, m2 - vol_c),

    with m2 = |directed undirected-edge rows| = 2m, vol_c = the community's
    degree sum (= directed rows with src in c) and cut_c = directed rows
    with src in c and dst outside (= the community's undirected boundary
    edge count — each boundary edge contributes exactly one direction to
    each side's cut).

    Float-free contract: every quantity is an exact BIGINT until the single
    final division (then ROUND(_, 9)) — the same discipline as modularity.
    Communities with min(vol_c, m2 - vol_c) = 0 (isolated nodes, or the
    whole graph in one community) yield NULL, matching the undefined ratio.

    `labels` must cover every node incident to an edge (LPA output does by
    construction); labeled isolated nodes contribute n_nodes only.

    Scale shape: two label joins onto the edge table — broadcast when the
    label vector fits ``BROADCAST_NODE_BOUND``, shuffled on the node key
    above it — one per-label aggregate, one broadcast scalar.  No window,
    no driver loop."""
    und = symmetrize_edges(edges).localCheckpoint(eager=True)
    lab = labels.select("node", "label").localCheckpoint(eager=True)
    small = lab.count() <= BROADCAST_NODE_BOUND
    m2 = und.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    ls = lab.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    ld = lab.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    per_src = (
        und.join(F.broadcast(ls) if small else ls, "src")
        .join(F.broadcast(ld) if small else ld, "dst")
        .groupBy(F.col("lsrc").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("vol"),
            F.sum(
                F.when(F.col("lsrc") != F.col("ldst"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("cut"),
        )
    )
    per_label = lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    den = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return (
        per_label.join(F.broadcast(per_src) if small else per_src, "label", "left")
        .na.fill({"vol": 0, "cut": 0})
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            "n_nodes",
            F.col("cut").alias("cut_edges"),
            F.col("vol").alias("volume"),
            F.when(
                den > 0,
                F.round(F.col("cut").cast("double") / den.cast("double"), 9),
            ).alias("conductance"),
        )
    )


def conductance_oracle_sql(edges_sql: str, labels_sql: str) -> str:
    """DuckDB twin of `conductance`; ``labels_sql`` is any (node, label)
    SELECT (nested WITH allowed — the LPA oracle drops in verbatim; CTE
    names here are qc_-prefixed so they never collide with the nested
    query's own aliases, which DuckDB rejects as duplicates)."""
    return f"""
WITH qc_e_raw AS ({edges_sql}),
qc_und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM qc_e_raw WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM qc_e_raw WHERE src <> dst)),
qc_lab AS MATERIALIZED (SELECT node, label FROM ({labels_sql})),
qc_m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM qc_und),
qc_per_src AS (
  SELECT ls.label,
         CAST(COUNT(*) AS BIGINT) AS vol,
         CAST(SUM(CASE WHEN ls.label <> ld.label THEN 1 ELSE 0 END) AS BIGINT) AS cut
  FROM qc_und u
  JOIN qc_lab ls ON u.src = ls.node
  JOIN qc_lab ld ON u.dst = ld.node
  GROUP BY 1),
qc_per_label AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM qc_lab GROUP BY 1)
SELECT p.label, p.n_nodes,
       COALESCE(s.cut, 0) AS cut_edges,
       COALESCE(s.vol, 0) AS volume,
       CASE WHEN LEAST(COALESCE(s.vol, 0), m.m2 - COALESCE(s.vol, 0)) > 0
            THEN ROUND(
              CAST(COALESCE(s.cut, 0) AS DOUBLE)
              / CAST(LEAST(COALESCE(s.vol, 0), m.m2 - COALESCE(s.vol, 0)) AS DOUBLE), 9)
       END AS conductance
FROM qc_per_label p LEFT JOIN qc_per_src s ON p.label = s.label CROSS JOIN qc_m m
"""


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row (m_edges, assortativity): Pearson correlation of endpoint
    degrees over the UNDIRECTED simple graph (Newman's degree
    assortativity coefficient) — hub-to-hub vs hub-to-leaf wiring, the
    one-number structural fingerprint of a crawl/citation/social graph.

    Every edge is counted in both directions, so the x and y marginals
    coincide and r reduces to a square-root-free ratio of EXACT integer
    sums

        r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2)

    (M = directed rows, Sx = sum deg, Sxx = sum deg^2, Sxy = sum
    deg_src*deg_dst) — integral until one final division, then
    ROUND(_, 9); bit-exact cross-engine, exact while M*Sxx < 2^63.
    Degree-regular graphs (denominator 0) yield NULL.

    Scale shape: one degree aggregate joined onto both edge endpoints
    (node-bounded state side), one global sum — no window, no loop."""
    # degree aggregate + two-sided join: materialize once
    und = symmetrize_edges(edges).localCheckpoint(eager=True)
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    dx = deg.select(F.col("node").alias("src"), F.col("deg").alias("x"))
    dy = deg.select(F.col("node").alias("dst"), F.col("deg").alias("y"))
    sums = (
        und.join(dx, "src")
        .join(dy, "dst")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m_dir"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    num = F.col("m_dir") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("m_dir") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        F.floor(F.col("m_dir") / 2).cast("long").alias("m_edges"),
        F.when(
            den != F.lit(0),
            F.round(num.cast("double") / den.cast("double"), 9),
        ).alias("assortativity"),
    )


def assortativity_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of `degree_assortativity` (identical integer sums)."""
    return f"""
WITH e_raw AS ({edges_sql}),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e_raw WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM e_raw WHERE src <> dst)),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY 1),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_dir,
         CAST(SUM(dx.deg) AS BIGINT) AS sx,
         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx,
         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy
  FROM und u
  JOIN deg dx ON u.src = dx.node
  JOIN deg dy ON u.dst = dy.node)
SELECT CAST(FLOOR(m_dir / 2) AS BIGINT) AS m_edges,
       CASE WHEN m_dir * sxx - sx * sx <> 0 THEN ROUND(
         CAST(m_dir * sxy - sx * sx AS DOUBLE)
         / CAST(m_dir * sxx - sx * sx AS DOUBLE), 9)
       END AS assortativity
FROM sums
"""


# ---------------------------------------------------------------------------
# Cross-snapshot edge diff (graph churn between time slices)
# ---------------------------------------------------------------------------


def snapshot_edge_diff(edges_t: DataFrame) -> DataFrame:
    """(snap_from, snap_to, n_added, n_removed, n_kept, jaccard): edge
    churn between CONSECUTIVE snapshots of a (snap, src, dst) edge table —
    the edges-over-time companion of `pagerank_snapshots` (same input
    shape), answering "how much did the graph move between slices" before
    anyone compares the scores.

    Counts are exact BIGINTs (the snapshot_diff integer-contract
    discipline); `jaccard` = kept / (kept + added + removed) is computed
    HALF-UP in integer micro-units then scaled — identical doubles from
    identical integers in both engines, no ROUND(float) .5-boundary
    exposure (the cents pattern).

    Scale shape: the snap list is aggregated to a tiny frame (bounded by
    the number of time slices), consecutive pairs come from one lead()
    over it, and each edge row joins into at most its two adjacent pairs
    — the diff itself is ONE shuffle keyed by (pair, src, dst) with
    map-side-combinable max flags, then a pair-keyed count aggregate.
    Nothing is quadratic in snapshots and nothing compares non-adjacent
    slices."""
    from ..plans.windows import bounded_global_window

    # three consumers (snap list + both pair-join branches): checkpoint so
    # the upstream derivation (often a join+distinct) runs once, not 3x
    edges_t = edges_t.localCheckpoint(eager=True)
    snaps = edges_t.select("snap").distinct()
    pairs = (
        snaps.select(
            F.col("snap").alias("snap_from"),
            F.lead("snap").over(bounded_global_window("snap")).alias("snap_to"),
        )
        .where(F.col("snap_to").isNotNull())
        .localCheckpoint(eager=True)  # read by both join branches
    )
    ea = edges_t.join(
        F.broadcast(pairs), edges_t.snap == pairs.snap_from
    ).select("snap_from", "snap_to", "src", "dst", F.lit(1).alias("in_a"),
             F.lit(0).alias("in_b"))
    eb = edges_t.join(
        F.broadcast(pairs), edges_t.snap == pairs.snap_to
    ).select("snap_from", "snap_to", "src", "dst", F.lit(0).alias("in_a"),
             F.lit(1).alias("in_b"))
    flags = (
        ea.unionByName(eb)
        .groupBy("snap_from", "snap_to", "src", "dst")
        .agg(F.max("in_a").alias("a"), F.max("in_b").alias("b"))
    )
    n_added = F.sum(((F.col("b") == 1) & (F.col("a") == 0)).cast("long"))
    n_removed = F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("long"))
    n_kept = F.sum(((F.col("a") == 1) & (F.col("b") == 1)).cast("long"))
    return (
        flags.groupBy("snap_from", "snap_to")
        .agg(
            n_added.alias("n_added"),
            n_removed.alias("n_removed"),
            n_kept.alias("n_kept"),
        )
        .select(
            "snap_from",
            "snap_to",
            "n_added",
            "n_removed",
            "n_kept",
            (
                F.expr(
                    "(n_kept * 2000000 + (n_kept + n_added + n_removed)) div "
                    "(2 * (n_kept + n_added + n_removed))"
                )
                / F.lit(1_000_000.0)
            ).alias("jaccard"),
        )
    )


def snapshot_edge_diff_sql(edges_t_sql: str) -> str:
    """DuckDB twin of `snapshot_edge_diff` (same adjacent-pair rule, same
    flag aggregate, same single rounded division)."""
    return f"""
WITH sd_e AS MATERIALIZED (SELECT DISTINCT snap, src, dst FROM ({edges_t_sql})),
sd_pairs AS (
  SELECT snap AS snap_from, LEAD(snap) OVER (ORDER BY snap) AS snap_to
  FROM (SELECT DISTINCT snap FROM sd_e)
  QUALIFY snap_to IS NOT NULL
),
sd_flags AS (
  SELECT p.snap_from, p.snap_to, t.src, t.dst,
         MAX(CASE WHEN t.snap = p.snap_from THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN t.snap = p.snap_to THEN 1 ELSE 0 END) AS b
  FROM sd_pairs p JOIN sd_e t ON t.snap IN (p.snap_from, p.snap_to)
  GROUP BY 1, 2, 3, 4
)
SELECT snap_from, snap_to, n_added, n_removed, n_kept,
       ((n_kept * 2000000 + (n_kept + n_added + n_removed))
        // (2 * (n_kept + n_added + n_removed))) / 1000000.0 AS jaccard
FROM (
  SELECT snap_from, snap_to,
         CAST(SUM(CASE WHEN b = 1 AND a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
  FROM sd_flags
  GROUP BY snap_from, snap_to
) c
"""


def link_prediction_scores(
    edges: DataFrame,
    hub_cap: int | None = 1_000,
    min_common: int = 1,
) -> DataFrame:
    """(node_a, node_b, n_common, pref_attachment, ra_score): the
    remaining gds.alpha.linkprediction trio beside `adamic_adar`, in the
    same directed convention (pairs share OUT-neighbors):

    - n_common            common neighbors (integer count);
    - pref_attachment     out_deg(a) * out_deg(b) (pure integer);
    - ra_score            resource allocation = sum over shared w of
                          1 / in_deg(w).

    Same scale shape and determinism contract as `adamic_adar`: pairs
    generate per shared (hub-capped) neighbor, weights summed as
    NANO-SCALED integers (round(1e9/d) — the scalar divide+round is
    bit-identical cross-engine; the SUM is exact in any order), HALF-UP
    to 6 decimals in integer arithmetic.  ``min_common`` drops pairs
    below that many shared neighbors — the standard result bound (one
    shared mid is mostly noise and quadratically many pairs)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)  # pair sides + both degree aggs
    ind = e.groupBy(F.col("dst").alias("mid")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    mids = ind.where(F.col("in_deg") >= 2)
    if hub_cap is not None:
        mids = mids.where(F.col("in_deg") <= hub_cap)
    weights = mids.select(
        "mid",
        F.round(F.lit(1e9) / F.col("in_deg").cast("double"))
        .cast("long")
        .alias("w_nano"),
    )
    outd = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    a = e.select(F.col("src").alias("node_a"), F.col("dst").alias("mid"))
    b = e.select(F.col("src").alias("node_b"), F.col("dst").alias("mid"))
    pairs = (
        a.join(weights, "mid")
        .join(b, "mid")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            (
                F.floor((F.sum("w_nano") + F.lit(500)) / F.lit(1000)).cast("long")
                / F.lit(1e6)
            ).alias("ra_score"),
        )
        .where(F.col("n_common") >= int(min_common))
    )
    da = outd.select(F.col("node").alias("node_a"), F.col("out_deg").alias("_da"))
    db = outd.select(F.col("node").alias("node_b"), F.col("out_deg").alias("_db"))
    return (
        pairs.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "n_common",
            (F.col("_da") * F.col("_db")).cast("long").alias("pref_attachment"),
            "ra_score",
        )
    )


def link_prediction_oracle_sql(
    edges_sql: str, hub_cap: int | None = 1_000, min_common: int = 1
) -> str:
    """DuckDB twin of `link_prediction_scores` over any (src, dst) SQL."""
    cap = f"AND in_deg <= {hub_cap}" if hub_cap is not None else ""
    return f"""
WITH raw AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
w AS (
  SELECT mid,
         CAST(ROUND(1000000000.0 / CAST(in_deg AS DOUBLE)) AS BIGINT) AS w_nano
  FROM (
    SELECT dst AS mid, COUNT(*) AS in_deg FROM e GROUP BY 1
  ) WHERE in_deg >= 2 {cap}
),
outd AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY 1),
pairs AS (
  SELECT a.src AS node_a, b.src AS node_b,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         ((CAST(SUM(w.w_nano) AS BIGINT) + 500) // 1000) / 1000000.0 AS ra_score
  FROM e a
  JOIN w ON a.dst = w.mid
  JOIN e b ON b.dst = a.dst AND a.src < b.src
  GROUP BY 1, 2
  HAVING COUNT(*) >= {int(min_common)}
)
SELECT p.node_a, p.node_b, p.n_common,
       CAST(da.out_deg * db.out_deg AS BIGINT) AS pref_attachment,
       p.ra_score
FROM pairs p
JOIN outd da ON p.node_a = da.node
JOIN outd db ON p.node_b = db.node
"""
