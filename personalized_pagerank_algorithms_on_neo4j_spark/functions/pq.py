"""Product-quantization (PQ) ANN over an embedding column (array<float>).

The third scale path for similarity search, complementing the LSH sketch
buckets and IVF cells in `simsearch.py`: compress every vector to ``m``
sub-space codes (one byte-ish int per sub-space), then answer queries with
asymmetric distance computation (ADC) — a per-query lookup table of
(sub-space, code) -> partial distance, so scoring a vector is ``m`` table
lookups + a sum instead of a ``dim``-wide float scan. At 100 TB this is the
classic memory-bound ANN layout: the codes table is ~``m`` ints/vector
(16-32x smaller than the raw floats), the LUT is ``m * ksub`` doubles
(broadcast), and the scan is one narrow aggregation over the codes table —
no full-width embedding I/O on the query path at all.

Shapes:
- fit: per-sub-space k-means over `F.slice`d sub-vectors (reuses
  `clustering.kmeans_fit` — broadcast centroids, map-side partial sums), or
  the deterministic lowest-id seed codebook for RNG-free reproducibility.
- encode: ONE `mapInPandas` pass (Arrow-batched numpy argmin over a
  (batch x ksub x dsub) distance tensor); output is `(id, codes array<int>)`.
- query: LUT = codebook x query sub-vectors (m*ksub tiny rows, JVM
  expressions), broadcast-joined to the posexploded codes, sum per id,
  bottom-k with the engine's tie semantics.

Cross-engine determinism (mirrors `clustering.py`): distances ROUND(_, 9)
before argmin, ties -> lowest code; ADC sums ROUND(_, 6). Sub-vector
boundaries are 1-based inclusive slices in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import kmeans_fit

__all__ = [
    "pq_seed_codebooks",
    "pq_fit",
    "pq_encode",
    "pq_adc_topk",
    "ivfpq_topk",
    "pq_oracle_ctes",
    "pq_trained_oracle_ctes",
]


def _subspace_df(df: DataFrame, s: int, dsub: int, vec_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col)
    )


def pq_seed_codebooks(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Deterministic codebooks: sub-vectors of the ``ksub`` lowest-id rows
    (code order == id order). RNG-free — the cross-engine-checkable choice,
    same convention as the IVF seed cells (simsearch.ivf_assign)."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(ksub).collect()
    if not rows:
        return []
    dim = len(rows[0][1])
    dsub = dim // m
    return [
        [[float(x) for x in r[1][s * dsub : (s + 1) * dsub]] for r in rows]
        for s in range(m)
    ]


def pq_fit(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Trained codebooks: an independent Lloyd k-means per sub-space over the
    sliced sub-vectors. Returns ``m`` codebooks of ``ksub`` centroids each.
    ``iterations=0`` degenerates to `pq_seed_codebooks`."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            return []
        dim = len(first[0])
    dsub = dim // m
    return [
        kmeans_fit(
            _subspace_df(df, s, dsub, vec_col, id_col),
            k=ksub,
            iterations=iterations,
            vec_col=vec_col,
            id_col=id_col,
            dim=dsub,
        )
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>): codes[s] = argmin_code round(||x_s - c||^2, 9),
    ties -> lowest code. One Arrow-batched numpy pass, no shuffle — the same
    "dense linear algebra stays in numpy" call as `clustering._assign`
    (a codebook-literal expression tree would be m*ksub*dsub terms of
    Catalyst planning for a one-shot map)."""
    cbs = [[list(map(float, c)) for c in book] for book in codebooks]

    def op(batches):
        import numpy as np
        import pandas as pd

        books = [np.asarray(b, dtype=np.float64) for b in cbs]  # m x (ksub x dsub)
        dsub = books[0].shape[1]

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(pdf), len(books)), dtype=np.int32)
            for s, C in enumerate(books):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).round(9)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": [list(map(int, r)) for r in codes]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        op, schema=f"{id_col} long, codes array<int>"
    )


def _dist2(a, b):  # squared L2 between two array<double> columns
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _adc_scores(codes: DataFrame, lut: DataFrame, id_col: str) -> DataFrame:
    """(id, adist): per-vector ADC score = sum of the m broadcast-LUT partial
    distances — the narrow query-path scan over the codes table."""
    return (
        codes.select(F.col(id_col), F.posexplode("codes").alias("sub", "code"))
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("d"), 6).alias("adist"))
    )


def _adc_query(
    df: DataFrame,
    query_id: int,
    codebooks: list[list[list[float]]],
    codes: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """The shared ADC query tail: build the m*ksub LUT from the query's
    sub-vectors, score the given codes frame, and bottom-k with the
    engine's tie semantics (kth-value filter; result may exceed k). The
    ONE implementation behind `pq_adc_topk` (all codes) and `ivfpq_topk`
    (codes restricted to the probed IVF cells)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    spark = df.sparkSession

    cb = spark.createDataFrame(
        [
            (s, c, codebooks[s][c])
            for s in range(m)
            for c in range(len(codebooks[s]))
        ],
        schema="sub int, code int, cvec array<double>",
    )
    qsub = df.where(F.col(id_col) == query_id).select(
        F.posexplode(
            F.array(*[F.slice(F.col(vec_col), s * dsub + 1, dsub) for s in range(m)])
        ).alias("sub", "qvec")
    )
    lut = cb.join(F.broadcast(qsub), "sub").select(
        "sub", "code", F.round(_dist2(F.col("cvec"), F.col("qvec")), 9).alias("d")
    )
    # materialize the scores once: both the kth-value job and the returned
    # filter read them, and it truncates the encode lineage (at scale the
    # codes table is a persisted index anyway)
    adist = _adc_scores(codes, lut, id_col).localCheckpoint(eager=True)
    # bottom-k with the engine's tie semantics (kth smallest, keep <=)
    kth_rows = adist.select("adist").orderBy(F.asc("adist")).limit(k).collect()
    if len(kth_rows) < k:
        return adist
    return adist.where(F.col("adist") <= F.lit(kth_rows[-1][0]))


def pq_adc_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k nearest (smallest ADC squared-L2) to the query.

    Pass persisted (`codebooks`, `codes`) to amortize the index across
    queries — the query path then touches ONLY the codes table and an
    m*ksub-row broadcast LUT, never the raw embeddings. Tie semantics match
    `operators.topk` (kth-value filter, result may exceed k)."""
    if codebooks is None:
        codebooks = pq_seed_codebooks(df, m, ksub, vec_col, id_col)
    if codes is None:
        codes = pq_encode(df, codebooks, vec_col, id_col)
    return _adc_query(df, query_id, codebooks, codes, k, vec_col, id_col)


def ivfpq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ivf_index: tuple[DataFrame, DataFrame] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ hybrid ANN: the coarse quantizer (IVF cells,
    `simsearch.ivf_assign`) restricts candidates to the ``nprobe`` cells
    nearest the query, and PQ ADC scores ONLY those candidates from the
    codes table — the production ANN layout at corpus scale: the query
    path reads the (cell-bucketed) codes of the probed cells plus an
    m*ksub broadcast LUT, never a raw candidate embedding.

    Pass persisted ``ivf_index`` / ``codebooks`` / ``codes`` to amortize
    both index structures across queries. Tie semantics match
    `pq_adc_topk` (kth-value filter on adist, result may exceed k)."""
    from .simsearch import cosine, ivf_assign

    centroids, assigned = (
        ivf_index
        if ivf_index is not None
        else ivf_assign(df, n_cells, vec_col, id_col)
    )
    if codebooks is None:
        codebooks = pq_seed_codebooks(df, m, ksub, vec_col, id_col)
    if codes is None:
        codes = pq_encode(df, codebooks, vec_col, id_col)

    q = df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("_q"))
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "cell", F.round(cosine(F.col("cvec"), F.col("_q")), 9).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    cand_codes = (
        codes.join(assigned.select(id_col, "cell"), id_col)
        .join(F.broadcast(probe_cells), "cell")
        .select(id_col, "codes")
    )
    return _adc_query(df, query_id, codebooks, cand_codes, k, vec_col, id_col)


def pq_trained_oracle_ctes(
    m: int = 4,
    ksub: int = 16,
    iterations: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB CTE block replaying `pq_fit` + `pq_encode`: an independent
    unrolled Lloyd recurrence per sub-space over the sliced sub-vectors
    (seed = ksub lowest-id sub-vectors; per iteration assign/mean-update/
    empty-keeps-previous, same rounding and tie-break as
    `clustering.kmeans_oracle_sql`), then the final argmin encode against
    the TRAINED codebooks. Exposes ``enc`` (id, sub, code) with the same
    shape as `pq_oracle_ctes` — this gates the trained quantizer
    cross-engine, not just the seed codebook."""
    dsub = dim // m

    def sub_slice(s: int) -> str:
        return (
            f"list_transform({vec_col}[{s * dsub + 1}:{(s + 1) * dsub}], "
            f"x -> CAST(x AS DOUBLE))"
        )

    def dist2(vec_list: str, cent_list: str) -> str:
        return (
            f"ROUND(list_sum(list_transform(range(1, {dsub + 1}), "
            f"i -> ({vec_list}[i] - {cent_list}[i]) "
            f"* ({vec_list}[i] - {cent_list}[i]))), 9)"
        )

    ctes: list[str] = []
    for s in range(m):
        sv = f"sv{s}"
        ctes.append(
            f"""{sv} AS MATERIALIZED (
  SELECT {id_col}, {sub_slice(s)} AS v FROM {table})"""
        )
        ctes.append(
            f"""c0_{s} AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS code, v AS cent
  FROM (SELECT * FROM {sv} ORDER BY {id_col} LIMIT {ksub}))"""
        )
        for it in range(iterations):
            ctes.append(
                f"""a{it}_{s} AS MATERIALIZED (
  SELECT {id_col}, code FROM (
    SELECT e.{id_col}, c.code,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                              ORDER BY {dist2("e.v", "c.cent")} ASC,
                                       c.code ASC) AS rn
    FROM {sv} e CROSS JOIN c{it}_{s} c
  ) t WHERE rn = 1)"""
            )
            ctes.append(
                f"""m{it}_{s} AS MATERIALIZED (
  SELECT code, list(ROUND(val, 6) ORDER BY dim) AS cent
  FROM (
    SELECT a.code AS code, d.dim AS dim, AVG(e.v[d.dim]) AS val
    FROM a{it}_{s} a JOIN {sv} e USING ({id_col})
    CROSS JOIN (SELECT unnest(range(1, {dsub + 1})) AS dim) d
    GROUP BY a.code, d.dim
  ) v GROUP BY code)"""
            )
            ctes.append(
                f"""c{it + 1}_{s} AS MATERIALIZED (
  SELECT p.code, COALESCE(m.cent, p.cent) AS cent
  FROM c{it}_{s} p LEFT JOIN m{it}_{s} m ON p.code = m.code)"""
            )
    cb_union = " UNION ALL ".join(
        f"SELECT {s} AS sub, code, cent AS cvec FROM c{iterations}_{s}"
        for s in range(m)
    )
    ctes.append(f"cbt AS MATERIALIZED ({cb_union})")
    sv_union = " UNION ALL ".join(
        f"SELECT {id_col}, {s} AS sub, v FROM sv{s}" for s in range(m)
    )
    ctes.append(f"svall AS MATERIALIZED ({sv_union})")
    ctes.append(
        f"""enc AS MATERIALIZED (
  SELECT {id_col}, sub, code FROM (
    SELECT e.{id_col}, e.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}, e.sub
                              ORDER BY {dist2("e.v", "c.cvec")} ASC,
                                       c.code ASC) AS rn
    FROM svall e JOIN cbt c USING (sub)
  ) t WHERE rn = 1)"""
    )
    return ",\n".join(ctes)


def pq_oracle_ctes(
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB CTE block (`cb`, `enc`) replaying seed-codebook PQ encoding —
    the shared front half of the `pq_codes` / `simsearch_pq` oracles. Slices
    are 1-based inclusive in DuckDB (`l[a:b]`), matching `F.slice(col, a,
    len)`."""
    dsub = dim // m

    d2 = (
        f"ROUND(list_sum(list_transform(range(1, {dsub + 1}), "
        f"i -> (CAST(e.{vec_col}[c.sub * {dsub} + i] AS DOUBLE) - c.cvec[i]) "
        f"* (CAST(e.{vec_col}[c.sub * {dsub} + i] AS DOUBLE) - c.cvec[i]))), 9)"
    )
    return f"""cb AS MATERIALIZED (
  SELECT s.sub,
         ROW_NUMBER() OVER (PARTITION BY s.sub ORDER BY e.{id_col}) - 1 AS code,
         list_transform(e.{vec_col}[s.sub * {dsub} + 1 : (s.sub + 1) * {dsub}],
                        x -> CAST(x AS DOUBLE)) AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {ksub}) e
  CROSS JOIN (SELECT UNNEST(range(0, {m})) AS sub) s),
enc AS MATERIALIZED (
  SELECT {id_col}, sub, code FROM (
    SELECT e.{id_col}, c.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}, c.sub
                              ORDER BY {d2} ASC, c.code ASC) AS rn
    FROM {table} e CROSS JOIN cb c
  ) t WHERE rn = 1)"""


def _cos_sql(a: str, b: str, dim: int = 64) -> str:
    """DuckDB cosine fragment over list columns (same shape as the
    simsearch_ivf oracle's)."""
    dot = (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    na = (
        f"SQRT(list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )
    nb = (
        f"SQRT(list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    )
    return f"{dot} / ({na} * {nb})"


def ivfpq_oracle_sql(
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB twin of ``ivfpq_topk`` for query vec_id = 0: seed-codebook
    PQ encoding (`pq_oracle_ctes`), first-`n_cells` seed centroids, probe
    the ``nprobe`` closest cells, ADC lookup-table distances, RANK <= k
    (ties kept, matching the Spark side)."""
    dsub = dim // m
    cos = lambda a, b: _cos_sql(a, b, dim)  # noqa: E731
    return f"""
WITH {pq_oracle_ctes(m=m, ksub=ksub, dim=dim)},
cent AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cell, embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT {n_cells}
),
assigned AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY ROUND({cos('e.embedding', 'c.cvec')}, 9) DESC, c.cell ASC) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) t WHERE rn = 1
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cell FROM cent CROSS JOIN q
  ORDER BY ROUND({cos('cent.cvec', 'q.embedding')}, 9) DESC, cell ASC LIMIT {nprobe}
),
lut AS (
  SELECT c.sub, c.code,
         ROUND(list_sum(list_transform(range(1, {dsub + 1}),
           i -> (CAST(q.embedding[c.sub * {dsub} + i] AS DOUBLE) - c.cvec[i])
              * (CAST(q.embedding[c.sub * {dsub} + i] AS DOUBLE) - c.cvec[i]))), 9) AS d
  FROM cb c CROSS JOIN q),
adist AS (
  SELECT e.vec_id, ROUND(SUM(l.d), 6) AS adist
  FROM enc e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN probe p ON a.cell = p.cell
  JOIN lut l USING (sub, code)
  GROUP BY 1)
SELECT vec_id, adist FROM adist
QUALIFY RANK() OVER (ORDER BY adist ASC) <= {int(k)}
"""
