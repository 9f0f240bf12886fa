"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: exact brute-force baseline. The dot product is a
  `zip_with`/`aggregate` expression (JVM-side, whole-stage-codegen'd — no
  Python UDF); top-k via TakeOrderedAndProject semantics (tie-aware).
- `lsh_topk`: the scale path — SRP-style sign-sketch buckets with banded
  probing; only bucket-colliding vectors get an exact cosine.
- `ivf_topk`: IVF-flat with deterministic centroid seeding (first C vectors
  by id — reproducible without a k-means dependency); probes the `nprobe`
  nearest centroid cells.

At 100 TB the pattern is: sketch/centroid assignment is one narrow map;
candidate generation is an equi join on the bucket key (shuffle on small
keys, never the O(n^2) cross product); exact re-scoring touches only
candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.topk import retrieve_topk
from .dedup import embedding_sign_sketch


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _query_df(df: DataFrame, query_id: int, vec_col: str, id_col: str) -> DataFrame:
    return df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("_q"))


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to the query vector (tie-aware)."""
    q = _query_df(df, query_id, vec_col, id_col)
    scored = df.crossJoin(F.broadcast(q)).select(
        id_col, F.round(cosine(F.col(vec_col), F.col("_q")), 6).alias("cosine")
    )
    return retrieve_topk(scored, k, value_col="cosine")


def lsh_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    sketch_dims: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe vectors sharing at least one sign-sketch band
    with the query, exact-rescore only those."""
    rows = sketch_dims // bands
    band_cols = [
        (
            F.floor(
                embedding_sign_sketch(F.col(vec_col), sketch_dims)
                / F.lit(float(2 ** (b * rows)))
            ).cast("long")
            % F.lit(2**rows)
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    sk = df.select(F.col(id_col), F.col(vec_col), *band_cols)
    q = sk.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_q"),
        *[F.col(f"band{b}").alias(f"qband{b}") for b in range(bands)],
    )
    j = sk.crossJoin(F.broadcast(q))
    collide = None
    for b in range(bands):
        c = F.col(f"band{b}") == F.col(f"qband{b}")
        collide = c if collide is None else (collide | c)
    scored = j.where(collide).select(
        id_col, F.round(cosine(F.col(vec_col), F.col("_q")), 6).alias("cosine")
    )
    return retrieve_topk(scored, k, value_col="cosine")


def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned): centroids = first n_cells vectors by id;
    every vector is assigned to its max-cosine cell (deterministic tiebreak
    on cell id)."""
    centroids = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cell"),
            F.col(vec_col).alias("cvec"),
        )
    )
    j = df.crossJoin(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "cell",
        F.round(cosine(F.col(vec_col), F.col("cvec")), 9).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
    assigned = (
        j.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )
    return centroids, assigned.select(id_col, vec_col, "cell")


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-flat: score only vectors in the nprobe cells nearest the query."""
    centroids, assigned = ivf_assign(df, n_cells, vec_col, id_col)
    q = _query_df(df, query_id, vec_col, id_col)
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select("cell", F.round(cosine(F.col("cvec"), F.col("_q")), 9).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    cand = assigned.join(F.broadcast(probe_cells), "cell")
    scored = cand.crossJoin(F.broadcast(q)).select(
        id_col, F.round(cosine(F.col(vec_col), F.col("_q")), 6).alias("cosine")
    )
    return retrieve_topk(scored, k, value_col="cosine")
