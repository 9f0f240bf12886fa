"""HyperBall — the neighborhood function via HLL counters (Boldi &
Vigna, 2013): every node keeps a HyperLogLog sketch of its forward ball
B(v, r) = nodes reachable from v in <= r hops; each round merges every
successor's sketch into the node's own.  HyperBall is THE at-scale
answer to "how big is each node's r-neighborhood" (exact per-node
reachability is quadratic state; sketches are O(n * m) rows total) and
the standard route to effective-diameter / average-distance estimates
over web-scale graphs.

Relational formulation — registers are ROWS, not blobs:

    state (node, bucket, reg), <= m = 2^p rows per node;
    round r+1:  state UNION (edges JOIN state ON state.node = edges.dst,
                re-keyed to edges.src)  ->  groupBy (node, bucket) MAX.

MAX-merge is the HLL union, so the superstep is one equi-join + one
map-side-combinable aggregate; no per-node blob UDF, no Python.  The
sketch machinery is the engine's existing portable-HLL substrate
(functions/sketches.py: md5 48-bit hash, integer CASE-ladder rho, and
the SHARED `hll_estimate` fold — one estimator implementation serves
hll_distinct, the streaming store, and this operator, so they can never
drift), and Spark and the DuckDB oracle compute BIT-IDENTICAL registers
every round: the gate hash-compares exact estimates, not
approximations.

Output: (radius, node, approx_ball) for radius 1..R — the per-node
neighborhood-function table (sum over nodes at radius r estimates the
number of reachable pairs within r)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sketches import (
    _alpha,
    _rho_column,
    _rho_sql,
    _HASH_BITS,
    hll_estimate,
)
from ..functions.text import portable_hash
from ..graph import PropertyGraph
from ..plans.iterative import (
    loop_shuffle_partitions,
    static_superstep_plan,
    stats_reset_checkpoint,
)


def hyperball(
    graph: PropertyGraph, radius: int = 4, p: int = 6
) -> DataFrame:
    """(radius, node, approx_ball): HLL ball-size estimates for every
    node at each radius 1..``radius`` (module doc).  ``p`` is the
    register-count exponent (m = 2^p rows of state per node, worst
    case)."""
    if graph.fits_local():
        return _hyperball_local(graph, radius, p)
    spark = graph.spark
    m = 1 << p
    w_bits = _HASH_BITS - p
    edges = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    h = portable_hash(F.col("id"))
    regs = graph.nodes.select(
        F.col("id").alias("node"),
        (h % F.lit(m)).alias("_bucket"),
        _rho_column(F.floor(h / F.lit(m)).cast("long"), w_bits)
        .cast("int")
        .alias("_reg"),
    )
    out_frames = []
    with static_superstep_plan(
        spark, loop_shuffle_partitions(spark, graph.n * min(m, 16))
    ):
        edges = edges.localCheckpoint(eager=True)
        regs = stats_reset_checkpoint(regs)
        for r in range(1, radius + 1):
            pulled = edges.join(
                regs, edges["dst"] == regs["node"]
            ).select(F.col("src").alias("node"), "_bucket", "_reg")
            regs = stats_reset_checkpoint(
                regs.unionByName(pulled)
                .groupBy("node", "_bucket")
                .agg(F.max("_reg").alias("_reg"))
            )
            out_frames.append(
                hll_estimate(regs, ["node"], p)
                .select(
                    F.lit(r).cast("int").alias("radius"),
                    "node",
                    F.col("approx_distinct").alias("approx_ball"),
                )
            )
    out = out_frames[0]
    for f in out_frames[1:]:
        out = out.unionByName(f)
    return out


def _hyperball_local(graph: PropertyGraph, radius: int, p: int) -> DataFrame:
    """Driver-local register rounds (round-12 optimization): the HLL
    union is an integer MAX over (node, bucket) cells, so a dense
    (n x 2^p) uint8 matrix replays the join+union+max superstep with one
    gather + segmented maximum per round — bit-identical registers by
    construction.  The ESTIMATOR stays in the shared Spark
    `hll_estimate` expressions (one job over the emitted register rows):
    zero new float surface against the oracle's LN/ROUND tail.  Absent
    cells are 0 (rho >= 1 for every present register), so presence is
    carried by the max itself."""
    import hashlib

    import numpy as np
    import pandas as pd

    from .._nputil import argsort_stable

    lg = graph.local
    n = len(lg.ids)
    m = 1 << p
    w_bits = _HASH_BITS - p
    md5 = hashlib.md5
    h = np.fromiter(
        (
            int(md5(b"%d#0" % i).hexdigest()[:12], 16)
            for i in lg.ids.tolist()
        ),
        dtype=np.int64,
        count=n,
    )
    bucket = h % m
    w = h // m
    # the CASE-ladder rho: w_bits - floor(log2(w)) for w >= 1, else
    # w_bits + 1 — same integer thresholds, vectorized
    rho = np.full(n, w_bits + 1, dtype=np.uint8)
    nzw = w > 0
    # floor(log2(w)) = frexp exponent - 1, exact for w < 2^53 (log2's
    # float rounding could misplace powers of two; frexp cannot)
    rho[nzw] = (
        w_bits - (np.frexp(w[nzw].astype(np.float64))[1].astype(np.int64) - 1)
    ).astype(np.uint8)
    regs = np.zeros((n, m), dtype=np.uint8)
    regs[np.arange(n), bucket] = rho
    loop_mask = lg.edge_src != lg.edge_dst
    es, ed = lg.edge_src[loop_mask], lg.edge_dst[loop_mask]
    order = argsort_stable(es)
    es, ed = es[order], ed[order]
    seg = np.ones(len(es), dtype=bool)
    if len(es):
        seg[1:] = es[1:] != es[:-1]
    starts = np.nonzero(seg)[0]
    srcs = es[starts]
    frames = []
    for r in range(1, radius + 1):
        if len(es):
            merged = np.maximum.reduceat(regs[ed], starts, axis=0)
            regs[srcs] = np.maximum(regs[srcs], merged)
        node_i, bucket_i = np.nonzero(regs)
        frames.append(
            pd.DataFrame(
                {
                    "radius": np.full(len(node_i), r, dtype=np.int32),
                    "node": lg.ids[node_i],
                    "_bucket": bucket_i.astype(np.int64),
                    "_reg": regs[node_i, bucket_i].astype(np.int32),
                }
            )
        )
    rows = graph.spark.createDataFrame(
        pd.concat(frames, ignore_index=True),
        schema="radius int, node long, _bucket long, _reg int",
    )
    return hll_estimate(rows, ["radius", "node"], p).select(
        "radius", "node", F.col("approx_distinct").alias("approx_ball")
    )


def hyperball_oracle_sql(
    nodes_sql: str, edges_sql: str, radius: int = 4, p: int = 6
) -> str:
    """DuckDB twin: identical register initialization, ``radius`` unrolled
    MAX-merge rounds, and the identical estimator per round."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    alpha = _alpha(m)
    h = (
        "CAST(('0x' || substring(md5(CAST(id AS VARCHAR) || '#' || '0'),"
        " 1, 12)) AS BIGINT)"
    )
    rho = _rho_sql(f"(h // {m})", w_bits)
    ctes = [
        f"hb_e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) e WHERE src <> dst)",
        f"""hb_r0 AS MATERIALIZED (
  SELECT id AS node, h % {m} AS bucket, {rho} AS reg
  FROM (SELECT id, {h} AS h FROM ({nodes_sql}) n) q)""",
    ]
    est_parts = []
    for r in range(1, radius + 1):
        ctes.append(
            f"""hb_r{r} AS MATERIALIZED (
  SELECT node, bucket, MAX(reg) AS reg FROM (
    SELECT node, bucket, reg FROM hb_r{r - 1}
    UNION ALL
    SELECT e.src AS node, s.bucket, s.reg
    FROM hb_e e JOIN hb_r{r - 1} s ON s.node = e.dst
  ) u GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""hb_est{r} AS (
  SELECT node,
         ROUND(CASE
           WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m}) / (s + ({m} - present))
                  <= CAST({2.5 * m!r} AS DOUBLE)
                AND ({m} - present) > 0
           THEN CAST({float(m)!r} AS DOUBLE)
                * LN(CAST({float(m)!r} AS DOUBLE) / CAST({m} - present AS DOUBLE))
           ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m}) / (s + ({m} - present))
         END, 4) AS approx_ball
  FROM (
    SELECT node, SUM(POW(2.0, -reg)) AS s, COUNT(*) AS present
    FROM hb_r{r} GROUP BY node
  ) g)"""
        )
        est_parts.append(
            f"SELECT {r} AS radius, node, approx_ball FROM hb_est{r}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(est_parts)
    )
