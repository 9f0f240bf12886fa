"""FastRP-style node embeddings — iterative sparse random projection.

The reference's host platform ships `gds.fastRP` as its default node
embedding (Chen et al., "Fast and Accurate Network Embeddings via Very
Sparse Random Projection", CIKM'19); this module supplies the same verb
shape over the engine's property graph: every node gets a deterministic
sparse random vector, the vector is propagated through the adjacency for
a fixed number of rounds, and the weighted sum of the iterates is
L2-normalized per node.

Exactness contract (the repo's float-free discipline): the initial
entries are {-1, 0, +1} drawn from the portable 48-bit hash (the same
md5 primitive every DuckDB oracle shares), each propagation round is a
plain neighbor SUM of integers (order-independent, exact in BIGINT), and
the iterate combination uses small integer weights — so the ONLY float
arithmetic is the final per-node L2 normalization: one sqrt of an exact
integer and one division per entry, ROUND(_, 9), bit-identical
cross-engine (IEEE sqrt/divide are correctly rounded in both engines).
Magnitudes stay far inside BIGINT: |entry| <= max_degree^iterations,
and iterations is 2-3 in every published FastRP configuration.

Scale shape: embeddings ride ONE array column (dim sums are D per-group
aggregates, JVM-side, no row explosion); each round shuffles the O(n)
embedding table against the checkpointed symmetrized edge list under the
shared iterative-loop discipline (plans/iterative.py).  Output is long
format (node, dim, value) so downstream ANN operators and the oracle
compare rows, not arrays.

Reference parity: gds.fastRP (the host platform's default embedding;
cited as spec, not code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.graphstats import symmetrize_edges
from ..functions.text import portable_hash
from ..plans.iterative import (
    BROADCAST_NODE_BOUND,
    SuperstepLoop,
    loop_shuffle_partitions,
    static_superstep_plan,
)

__all__ = ["fastrp_embeddings", "fastrp_oracle_sql"]

# hash residue -> entry: 1/8 mass on +1, 1/8 on -1, 3/4 on 0 — the very
# sparse projection of the FastRP paper (values unscaled; any constant
# factor cancels in the final normalization)
_MOD = 8


def _init_entry(node, dim: int, seed: int):
    h = portable_hash(
        F.concat(node.cast("string"), F.lit("|"), F.lit(str(dim))), seed
    )
    r = h % _MOD
    return (
        F.when(r == 0, F.lit(1)).when(r == 1, F.lit(-1)).otherwise(F.lit(0))
    ).cast("long")


def _init_entry_sql(node: str, dim: str, seed: int) -> str:
    payload = f"CAST({node} AS VARCHAR) || '|' || CAST({dim} AS VARCHAR)"
    h = (
        f"CAST(('0x' || substring(md5({payload} || '#' || '{seed}'), 1, 12)) "
        f"AS BIGINT)"
    )
    return (
        f"CAST(CASE ({h}) % {_MOD} WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END "
        f"AS BIGINT)"
    )


def fastrp_embeddings(
    spark: SparkSession,
    edges: DataFrame,
    dims: int = 16,
    iterations: int = 2,
    weights: tuple[int, ...] = (1, 2),
    seed: int = 0,
) -> DataFrame:
    """(node, dim, value): FastRP embedding of every node incident to an
    edge — ``iterations`` neighbor-sum rounds over the symmetrized graph
    from a deterministic sparse {-1,0,+1} projection, iterates combined
    with integer ``weights`` (one per round), then one L2 normalization
    per node, ROUND(_, 9).  All-zero nodes (possible by cancellation)
    emit 0.0 in every dim in both engines."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if len(weights) != iterations:
        raise ValueError(
            f"need one weight per iteration: got {len(weights)} weights "
            f"for {iterations} iterations"
        )
    und = symmetrize_edges(edges).localCheckpoint(eager=True)
    nodes = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    x = nodes.select(
        "node",
        F.array(
            *[_init_entry(F.col("node"), d, seed) for d in range(dims)]
        ).alias("emb"),
    )
    # each state row carries a dims-long BIGINT array, so the broadcast
    # and partition gates must scale by the embedding width, not the node
    # count alone (the same per-row-payload rule bfs_distances_multi
    # applies to its landmark multiplicity)
    state_bound = n * dims
    small = state_bound <= BROADCAST_NODE_BOUND
    loop_parts = loop_shuffle_partitions(spark, state_bound) if small else None
    loop = SuperstepLoop(checkpoint_every=1)
    iterates: list[DataFrame] = []
    with static_superstep_plan(spark, shuffle_partitions=loop_parts):
        for _ in range(iterations):
            xj = F.broadcast(x) if small else x
            x = (
                xj.join(und, xj.node == und.src)
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.array(
                        *[F.sum(F.col("emb")[d]) for d in range(dims)]
                    ).alias("emb")
                )
            )
            x = loop.materialize(x)
            iterates.append(x)
    # combine iterates with integer weights: exact elementwise BIGINT
    acc = iterates[0].select(
        "node",
        F.transform(F.col("emb"), lambda v: v * F.lit(int(weights[0]))).alias(
            "emb"
        ),
    )
    for w, xi in zip(weights[1:], iterates[1:]):
        xr = xi.select("node", F.col("emb").alias("emb_i"))
        acc = acc.join(F.broadcast(xr) if small else xr, "node").select(
            "node",
            F.zip_with(
                F.col("emb"),
                F.col("emb_i"),
                lambda a, b: a + b * F.lit(int(w)),
            ).alias("emb"),
        )
    acc = acc.localCheckpoint(eager=True)  # read by norm + explode branch
    norm = F.sqrt(
        F.aggregate(
            F.col("emb"), F.lit(0).cast("long"), lambda s, v: s + v * v
        ).cast("double")
    )
    return (
        acc.select("node", norm.alias("_n"), F.posexplode("emb").alias("dim", "v"))
        .select(
            "node",
            F.col("dim").cast("int").alias("dim"),
            F.when(
                F.col("_n") > 0,
                F.round(F.col("v").cast("double") / F.col("_n"), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("value"),
        )
    )


def fastrp_oracle_sql(
    edges_sql: str,
    dims: int = 16,
    iterations: int = 2,
    weights: tuple[int, ...] = (1, 2),
    seed: int = 0,
) -> str:
    """DuckDB twin of `fastrp_embeddings`: the identical rounds in long
    (node, dim, v) format — integer sums, one final sqrt + division."""
    if len(weights) != iterations:
        raise ValueError("need one weight per iteration")
    init_v = _init_entry_sql("n.node", "d.dim", seed)
    ctes = [
        f"raw AS ({edges_sql})",
        """und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  ) WHERE src <> dst)""",
        "nod AS (SELECT DISTINCT src AS node FROM und)",
        f"dimt AS (SELECT UNNEST(generate_series(0, {dims - 1})) AS dim)",
        f"""x0 AS MATERIALIZED (
  SELECT n.node, d.dim, {init_v} AS v
  FROM nod n CROSS JOIN dimt d)""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""x{k} AS MATERIALIZED (
  SELECT e.dst AS node, p.dim, CAST(SUM(p.v) AS BIGINT) AS v
  FROM x{k - 1} p JOIN und e ON p.node = e.src
  GROUP BY 1, 2)"""
        )
    terms = " + ".join(
        f"x{k + 1}_v * {int(w)}" for k, w in enumerate(weights)
    )
    join_iters = "".join(
        f"\n  JOIN (SELECT node, dim, v AS x{k + 1}_v FROM x{k + 1}) t{k + 1} "
        f"USING (node, dim)"
        for k in range(1, iterations)
    )
    ctes.append(
        f"""acc AS MATERIALIZED (
  SELECT node, dim, CAST({terms} AS BIGINT) AS v
  FROM (SELECT node, dim, v AS x1_v FROM x1) t1{join_iters})"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body},
nrm AS (SELECT node, SQRT(CAST(SUM(v * v) AS BIGINT)) AS nv
        FROM acc GROUP BY node)
SELECT a.node, CAST(a.dim AS INT) AS dim,
       CASE WHEN m.nv > 0
            THEN ROUND(CAST(a.v AS DOUBLE) / m.nv, 9)
            ELSE 0.0 END AS value
FROM acc a JOIN nrm m ON a.node = m.node
"""
