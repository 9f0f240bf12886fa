"""K-means topic clustering over an embedding column (Lloyd's algorithm).

The scale shape: centroids are k x dim doubles — small by definition — so
each Lloyd iteration is (1) one full pass assigning every vector to its
nearest centroid against a BROADCAST centroid list (map-side only, no
shuffle), and (2) one groupBy(cluster) mean-reduce whose output (k rows)
collects to the driver for the next round's broadcast. Total per iteration:
one shuffle of k*dim partial aggregates — the same physics as IVF cell
assignment (simsearch.py) iterated. This is how k-means is run on any
cluster-scale corpus; the driver never holds more than k*dim doubles.

Cross-engine determinism (the DuckDB oracle replays the identical
recurrence):
- init: the k lowest-id vectors are the seed centroids (no RNG);
- distances round(_, 9) before comparison, argmin ties broken by lowest
  cluster id (numpy first-minimum == ROW_NUMBER ORDER BY dist, cluster);
- centroid means ROUND(_, 6) — parallel-sum association error (~1e-15) is
  far below the rounding step, so both engines see identical centroids;
- empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans_oracle_sql"]


def _assign(df: DataFrame, centroids: list[list[float]], vec_col: str, id_col: str) -> DataFrame:
    """(id, cluster): nearest centroid by round(dist2, 9), ties -> lowest
    cluster id (numpy argmin takes the first minimum).

    Arrow-batched numpy, not a k x dim literal expression tree: the
    expression form re-enters Catalyst analysis + codegen with fresh
    literals EVERY Lloyd iteration (~2 s/iteration of pure planning at
    k=8, dim=64, dwarfing the sub-second data pass), while the mapInPandas
    plan is tiny and constant-shaped and the distance math runs as one
    vectorized (batch x k x dim) matmul-grade kernel — the same
    "dense linear algebra belongs in Arrow/numpy" call as multimodal
    feature extraction. Batch shape: one (n_rows x k) distance matrix per
    Arrow batch, no per-row Python."""
    import pandas as pd

    cents = [list(map(float, c)) for c in centroids]

    def op(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)  # k x dim

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).round(9)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": d2.argmin(axis=1).astype("int32")}
            )

    return df.select(id_col, vec_col).mapInPandas(
        op, schema=f"{id_col} long, cluster int"
    )


def _partial_sums(df: DataFrame, centroids: list[list[float]], vec_col: str, id_col: str) -> DataFrame:
    """One fused Lloyd half-step: assign each vector to its nearest centroid
    AND emit per-partition partial (cluster, dim, sum, count) rows — the
    map-side combine done in numpy, so the only Spark aggregation left is a
    trivial 2-expression groupBy over k*dim*n_partitions tiny rows. No join
    back to the vectors, no k*dim-literal expression tree (which would
    re-enter Catalyst analysis/codegen with fresh literals every iteration
    — measured ~2 s/iteration of pure planning at k=8, dim=64)."""
    import pandas as pd

    cents = [list(map(float, c)) for c in centroids]

    def op(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).round(9)
            a = d2.argmin(axis=1)
            cl, dm, s, n = [], [], [], []
            # values are cluster indices in [0, k): a bincount presence
            # mask gives ascending uniques in O(n) with no sort (numpy's
            # default quicksort is pathological on this CPU — _nputil)
            for c in np.nonzero(np.bincount(a, minlength=len(C)))[0]:
                mask = a == c
                sums = X[mask].sum(axis=0)
                cnt = int(mask.sum())
                for d in range(C.shape[1]):
                    cl.append(int(c))
                    dm.append(d)
                    s.append(float(sums[d]))
                    n.append(cnt)
            yield pd.DataFrame({"cluster": cl, "dim": dm, "s": s, "n": n})

    return df.select(id_col, vec_col).mapInPandas(
        op, schema="cluster int, dim int, s double, n long"
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> list[list[float]]:
    """Train and return the k centroids (`iterations` Lloyd rounds from the
    deterministic lowest-id seed). The centroid list is small by definition
    (k x dim doubles) — hand it to `ivf_assign(centroids=...)` to build a
    trained ANN index, or to `_assign` for labels."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            return []
        dim = len(first[0])
    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    centroids = [[float(x) for x in r[1]] for r in seed_rows]
    for _ in range(iterations):
        upd = (
            _partial_sums(df, centroids, vec_col, id_col)
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        # mean with the same rounding AVG would apply; n is replicated per
        # dim row, so s/n is the true per-dimension mean
        new_centroids = [list(c) for c in centroids]  # empty clusters keep previous
        for r in upd:
            new_centroids[r["cluster"]][r["dim"]] = round(r["s"] / r["n"], 6)
        centroids = new_centroids
    return centroids


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """(id, cluster) after `iterations` Lloyd rounds from the deterministic
    lowest-id seed. `iterations=0` returns the seed assignment (== IVF cell
    assignment with lowest-id centroids)."""
    centroids = kmeans_fit(df, k, iterations, vec_col, id_col, dim)
    if not centroids:
        return df.select(F.col(id_col), F.lit(0).alias("cluster")).limit(0)
    return _assign(df, centroids, vec_col, id_col)


def kmeans_oracle_sql(
    k: int = 8,
    iterations: int = 3,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB SQL replaying the identical recurrence: seed centroids ->
    (assign, mean-update) x iterations -> final assignment. One CTE pair per
    iteration, same rounding and tie-break as the Spark path."""

    def dist2(vec_expr: str, cent_list: str) -> str:
        return (
            f"ROUND(list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (CAST({vec_expr}[i] AS DOUBLE) - {cent_list}[i]) "
            f"* (CAST({vec_expr}[i] AS DOUBLE) - {cent_list}[i]))), 9)"
        )

    ctes = [
        f"""c0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cluster,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS cent
  FROM {table} ORDER BY {id_col} LIMIT {k})"""
    ]
    for it in range(iterations):
        ctes.append(
            f"""a{it} AS MATERIALIZED (
  SELECT {id_col}, cluster FROM (
    SELECT e.{id_col}, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                              ORDER BY {dist2(f"e.{vec_col}", "c.cent")} ASC,
                                       c.cluster ASC) AS rn
    FROM {table} e CROSS JOIN c{it} c
  ) t WHERE rn = 1)"""
        )
        ctes.append(
            f"""m{it} AS MATERIALIZED (
  SELECT cluster, list(ROUND(val, 6) ORDER BY dim) AS cent
  FROM (
    SELECT a.cluster AS cluster, d.dim AS dim,
           AVG(CAST(e.{vec_col}[d.dim] AS DOUBLE)) AS val
    FROM a{it} a
    JOIN {table} e USING ({id_col})
    CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS dim) d
    GROUP BY a.cluster, d.dim
  ) v
  GROUP BY cluster)"""
        )
        # empty clusters keep the previous centroid
        ctes.append(
            f"""c{it + 1} AS MATERIALIZED (
  SELECT p.cluster, COALESCE(m.cent, p.cent) AS cent
  FROM c{it} p LEFT JOIN m{it} m ON p.cluster = m.cluster)"""
        )
    final = f"""
SELECT {id_col}, cluster FROM (
  SELECT e.{id_col}, c.cluster,
         ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                            ORDER BY {dist2(f"e.{vec_col}", "c.cent")} ASC,
                                     c.cluster ASC) AS rn
  FROM {table} e CROSS JOIN c{iterations} c
) t WHERE rn = 1"""
    return "WITH " + ",\n".join(ctes) + final
