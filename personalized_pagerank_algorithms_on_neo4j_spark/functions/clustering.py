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
- distances ROUND(_, 9) before comparison, argmin ties broken by lowest
  cluster id (struct-ordering min == ROW_NUMBER ORDER BY dist, cluster);
- centroid means ROUND(_, 6) — parallel-sum association error (~1e-15) is
  far below the rounding step, so both engines see identical centroids;
- empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans_oracle_sql"]


def _dist2_expr(vec, centroid: list[float]):
    """Squared L2 distance, left-fold accumulation (same evaluation order as
    DuckDB's list_sum over list_transform)."""
    carr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(df: DataFrame, centroids: list[list[float]], vec_col: str, id_col: str) -> DataFrame:
    """(id, cluster): nearest centroid by ROUND(dist2, 9), ties -> lowest
    cluster id. array_min over (dist, cluster) structs = lexicographic min."""
    entries = F.array(
        *[
            F.struct(
                F.round(_dist2_expr(F.col(vec_col), c), 9).alias("d"),
                F.lit(i).alias("cluster"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return df.select(
        F.col(id_col),
        F.array_min(entries)["cluster"].alias("cluster"),
    )


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
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            return df.select(F.col(id_col), F.lit(0).alias("cluster")).limit(0)
        dim = len(first[0])
    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    centroids = [[float(x) for x in r[1]] for r in seed_rows]
    for _ in range(iterations):
        assigned = _assign(df, centroids, vec_col, id_col)
        upd = (
            assigned.join(df.select(id_col, vec_col), id_col)
            .groupBy("cluster")
            .agg(
                *[
                    F.round(F.avg(F.col(vec_col)[i].cast("double")), 6).alias(f"c{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new_centroids = list(centroids)  # empty clusters keep previous
        for r in upd:
            new_centroids[r["cluster"]] = [float(r[f"c{i}"]) for i in range(dim)]
        centroids = new_centroids
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
