"""Relational HyperLogLog: approximate distinct counts with EXACT
cross-engine register parity.

Spark's built-in `approx_count_distinct` and DuckDB's equivalent use
different sketch internals, so they can never hash-match — this module
instead builds the HLL registers out of portable relational primitives
(the md5-based 48-bit hash shared with `sampling`, an integer CASE ladder
for the leading-zero rank) so Spark and the DuckDB oracle compute
bit-identical registers and the same estimate.

Scale shape — the whole point of HLL on a cluster: one narrow
projection per row (bucket, rho), ONE map-side-combined groupBy down to
at most m=2^p register rows per group, then a per-group fold of m tiny
rows. Cardinality of any group costs O(m) state regardless of input
size, and sketches merge by MAX — the same shape sharded ingest would
use.

Estimator: the classic Flajolet et al. HLL with the small-range
linear-counting correction. All register math is exact integers; the
final estimate's float ops (2^-reg sums are dyadic rationals; one ln in
the small-range branch) stay orders of magnitude inside the ROUND(_, 4)
gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import portable_hash

__all__ = [
    "hll_distinct",
    "hll_register_rows",
    "hll_estimate",
    "hll_oracle_sql",
    "cms_heavy_hitters",
    "cms_pair_rows",
    "cms_sketch",
    "cms_probe",
    "cms_oracle_sql",
    "histogram_quantiles",
    "histogram_quantiles_oracle_sql",
]

_HASH_BITS = 48


def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _rho_column(w: Column, w_bits: int) -> Column:
    """Leading-zero rank of the w_bits-wide value: 1 when the top bit is
    set ... w_bits when w == 1, w_bits + 1 when w == 0. Pure integer
    comparisons — identical in every engine."""
    expr = F.lit(w_bits + 1)
    for rho in range(w_bits, 0, -1):
        expr = F.when(w >= F.lit(1 << (w_bits - rho)), F.lit(rho)).otherwise(expr)
    return expr


def _rho_sql(w_expr: str, w_bits: int) -> str:
    whens = "\n".join(
        f"    WHEN {w_expr} >= {1 << (w_bits - rho)} THEN {rho}"
        for rho in range(1, w_bits + 1)
    )
    return f"(CASE\n{whens}\n    ELSE {w_bits + 1} END)"


def hll_register_rows(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """(group_cols..., _bucket, _rho): the per-row register contributions —
    the shard-able half of the sketch.  Registers merge by MAX, so any
    partial max over these rows (a microbatch, a shard, an epoch
    partition) composes losslessly into the global sketch."""
    group_cols = group_cols or []
    m = 1 << p
    w_bits = _HASH_BITS - p
    h = portable_hash(F.col(value_col))
    # count-distinct semantics ignore NULLs; an unfiltered NULL would
    # hash to a NULL bucket and inflate the register fold
    return df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        (h % F.lit(m)).alias("_bucket"),
        _rho_column(F.floor(h / F.lit(m)).cast("long"), w_bits)
        .cast("int")
        .alias("_rho"),
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str] | None = None, p: int = 12
) -> DataFrame:
    """(group_cols..., approx_distinct) from folded registers
    (group_cols..., _bucket, _reg) — the estimator half, shared by the
    batch operator and the streaming store's read path so the two can
    never drift."""
    group_cols = group_cols or []
    m = 1 << p
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("_reg"))).alias("_s"),
        F.count(F.lit(1)).alias("_present"),
    )
    e_raw = F.lit(_alpha(m) * m * m) / (
        F.col("_s") + (F.lit(m) - F.col("_present"))
    )
    v_zero = F.lit(m) - F.col("_present")  # buckets never hit
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return per_group.select(
        *group_cols, F.round(est, 4).alias("approx_distinct")
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """(group_cols..., approx_distinct) — HLL estimate of distinct
    ``value_col`` per group (or one global row), ROUND(_, 4)."""
    group_cols = group_cols or []
    rows = hll_register_rows(df, value_col, group_cols, p)
    regs = rows.groupBy(*group_cols, "_bucket").agg(F.max("_rho").alias("_reg"))
    return hll_estimate(regs, group_cols, p)


def hll_oracle_sql(
    table_sql: str,
    value_expr: str,
    group_exprs: list[str] | None = None,
    p: int = 12,
) -> str:
    """DuckDB twin computing bit-identical registers and the same
    estimate. ``table_sql`` is any FROM-able SQL; ``value_expr`` and
    ``group_exprs`` are column expressions over it."""
    group_exprs = group_exprs or []
    m = 1 << p
    w_bits = _HASH_BITS - p
    gsel = ", ".join(group_exprs)
    gby = ("GROUP BY " + gsel) if group_exprs else ""
    gpre = (gsel + ",") if group_exprs else ""
    h = (
        f"CAST(('0x' || substring(md5(CAST({value_expr} AS VARCHAR) || '#' || '0'),"
        f" 1, 12)) AS BIGINT)"
    )
    rho = _rho_sql(f"(h // {m})", w_bits)
    alpha = _alpha(m)
    return f"""
WITH src AS ({table_sql}),
hashed AS (SELECT {gpre} {h} AS h FROM src WHERE {value_expr} IS NOT NULL),
regs AS (
  SELECT {gpre} h % {m} AS bucket, MAX({rho}) AS reg
  FROM hashed {("GROUP BY " + gsel + ", bucket") if group_exprs else "GROUP BY bucket"}
),
folded AS (
  SELECT {gpre} SUM(POW(2.0, -reg)) AS s, COUNT(*) AS present
  FROM regs {gby}
)
SELECT {gpre}
  ROUND(CASE
    WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m}) / (s + ({m} - present))
           <= CAST({2.5 * m!r} AS DOUBLE)
         AND ({m} - present) > 0
    THEN CAST({float(m)!r} AS DOUBLE)
         * LN(CAST({float(m)!r} AS DOUBLE) / CAST({m} - present AS DOUBLE))
    ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m}) / (s + ({m} - present))
  END, 4) AS approx_distinct
FROM folded
"""


def cms_pair_rows(
    frame: DataFrame, value_col: str, d: int, w: int, *keep: str
) -> DataFrame:
    """(keep..., _r, _bucket): all d (row, bucket) pairs per record in ONE
    scan — a unionAll of d projections would re-read the input d times.
    Shared by the sketch build, the probe side, and the streaming store's
    per-epoch partials."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("_r"),
                (portable_hash(F.col(value_col), seed=r) % F.lit(w)).alias(
                    "_bucket"
                ),
            )
            for r in range(d)
        ]
    )
    return frame.select(*keep, F.explode(pairs).alias("_p")).select(
        *keep, F.col("_p._r").alias("_r"), F.col("_p._bucket").alias("_bucket")
    )


def cms_sketch(df: DataFrame, value_col: str, d: int = 4, w: int = 2048) -> DataFrame:
    """(_r, _bucket, _n): the d x w Count-Min sketch of ``value_col`` —
    O(d*w) state regardless of input size, mergeable by +, so partial
    sketches (shards, microbatches, epochs) sum into the global one."""
    src = df.where(F.col(value_col).isNotNull())
    return cms_pair_rows(src, value_col, d, w).groupBy("_r", "_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )


def cms_probe(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    threshold: int,
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(value_col, est_count >= threshold): probe candidate ``items``
    against a (possibly merged) sketch — min over rows, the CMS
    upper-bound estimate; shared by the batch operator and the streaming
    store's read path so the two cannot drift."""
    probe = cms_pair_rows(items, value_col, d, w, value_col)
    est = (
        probe.join(sketch, ["_r", "_bucket"])
        .groupBy(value_col)
        .agg(F.min("_n").alias("est_count"))
    )
    return est.where(F.col("est_count") >= threshold)


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(value_col, est_count) for items whose Count-Min estimate reaches
    ``threshold`` — the frequency-sketch twin of `hll_distinct` (HLL
    answers "how many distinct", CMS answers "which items are hot").

    The sketch is d hash rows x w buckets built by ONE
    map-side-combined groupBy over d narrow projections — O(d*w) state
    regardless of input size, mergeable by +. Estimates are
    min over rows of the bucket counts, an upper bound on the true
    count, so the result is a superset of the true heavy hitters (the
    CMS guarantee). The probe set here is the distinct items (exact and
    cheap at dimension-table scale); at petabyte scale probe a candidate
    set from a per-partition local-count pre-filter instead — the sketch
    build is unchanged.

    Deterministic in both engines: per-row hashes are the portable
    md5 hash seeded by the row index, so Spark and the DuckDB oracle
    build bit-identical sketches."""
    src = df.where(F.col(value_col).isNotNull())
    return cms_probe(
        cms_sketch(df, value_col, d, w),
        src.select(value_col).distinct(),
        value_col,
        threshold,
        d,
        w,
    )


def cms_oracle_sql(
    table_sql: str,
    value_expr: str,
    threshold: int,
    d: int = 4,
    w: int = 2048,
    out_alias: str | None = None,
) -> str:
    """DuckDB twin of `cms_heavy_hitters` (bit-identical sketch).

    ``out_alias`` names the output value column; it defaults from
    ``value_expr`` only when that is a bare (possibly dotted) identifier —
    a computed expression (e.g. ``lower(user_id)``) would otherwise
    produce invalid SQL or an alias diverging from the Spark side."""
    import re as _re

    if out_alias is None:
        tail = value_expr.split(".")[-1]
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tail):
            raise ValueError(
                f"value_expr {value_expr!r} is not a bare identifier; pass "
                "out_alias explicitly so the oracle column matches Spark's"
            )
        out_alias = tail

    def h(seed: int, expr: str) -> str:
        # parameterized on the hashed expression — never string-replaced
        return (
            f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR) || '#' ||"
            f" '{seed}'), 1, 12)) AS BIGINT) % {w}"
        )

    long_sql = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {h(r, value_expr)} AS bucket FROM src" for r in range(d)
    )
    probe_sql = "\nUNION ALL\n".join(
        f"SELECT v, {r} AS r, {h(r, 'v')} AS bucket FROM items" for r in range(d)
    )
    return f"""
WITH src AS (SELECT * FROM ({table_sql}) WHERE {value_expr} IS NOT NULL),
longf AS ({long_sql}),
sketch AS (SELECT r, bucket, COUNT(*) AS n FROM longf GROUP BY 1, 2),
items AS (SELECT DISTINCT {value_expr} AS v FROM src),
probe AS ({probe_sql}),
est AS (
  SELECT p.v, MIN(s.n) AS est_count
  FROM probe p JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
  GROUP BY p.v
)
SELECT v AS {out_alias}, est_count FROM est
WHERE est_count >= {threshold}
"""

def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    group_col: str | None = None,
    resolution: int = 100,
) -> DataFrame:
    """(group?, prob, value): quantiles from a fixed-resolution integer
    histogram — the SCALE path for percentiles. `F.percentile` is exact
    but sorts every row per group; this instead buckets values to
    1/``resolution`` units (one map-side-combinable groupBy — state is
    the number of DISTINCT buckets, not rows), cumulates over the bounded
    bucket table (window per group over buckets), and answers each prob
    with the inverted-CDF rule: the smallest bucket whose cumulative
    count >= ceil(prob * n). Exact to the bucket resolution,
    deterministic at any parallelism, identical in the DuckDB twin.
    """
    from pyspark.sql import Window

    if not probs:
        raise ValueError("probs is empty")
    gcols = [group_col] if group_col else []
    bucketed = df.where(F.col(value_col).isNotNull()).select(
        *gcols,
        F.round(F.col(value_col) * resolution).cast("long").alias("_b"),
    )
    hist = bucketed.groupBy(*gcols, "_b").agg(F.count(F.lit(1)).alias("_n"))
    w = (
        Window.partitionBy(*gcols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*gcols)
    cum = hist.select(
        *gcols,
        "_b",
        F.sum("_n").over(w).alias("_cum"),
        F.sum("_n").over(wn).alias("_tot"),
    )
    pf = df.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "prob double"
    )
    return (
        cum.crossJoin(F.broadcast(pf))
        .where(F.col("_cum") >= F.ceil(F.col("prob") * F.col("_tot")))
        .groupBy(*gcols, "prob")
        .agg(
            (F.min("_b").cast("double") / F.lit(float(resolution))).alias("value")
        )
    )


def histogram_quantiles_oracle_sql(
    table_sql: str,
    value_expr: str,
    probs: list[float],
    group_expr: str | None = None,
    resolution: int = 100,
) -> str:
    """DuckDB twin of `histogram_quantiles`. ``group_expr`` must be a bare
    column name (it is also the output column name, matching Spark)."""
    import re as _re

    if group_expr is not None and not _re.fullmatch(
        r"[A-Za-z_][A-Za-z0-9_]*", group_expr
    ):
        raise ValueError(
            f"group_expr {group_expr!r} must be a bare column name so the "
            "oracle column matches the Spark side's"
        )
    g_sel = f"{group_expr}," if group_expr else ""
    g_col = f"{group_expr}," if group_expr else ""
    g_out = f"{group_expr}," if group_expr else ""
    part = f"PARTITION BY {group_expr}" if group_expr else ""
    probs_values = ", ".join(f"({float(p)!r})" for p in probs)
    return f"""
WITH src AS (
  SELECT {g_sel}
         CAST(ROUND(({value_expr}) * {resolution}) AS BIGINT) AS b
  FROM ({table_sql}) WHERE {value_expr} IS NOT NULL
),
hist AS (SELECT {g_col} b, COUNT(*) AS n FROM src GROUP BY ALL),
cum AS (
  SELECT {g_col} b,
         SUM(n) OVER ({part} ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(n) OVER ({part}) AS tot
  FROM hist
),
probs(prob) AS (VALUES {probs_values})
SELECT {g_out} prob,
       CAST(MIN(b) AS DOUBLE) / {float(resolution)!r} AS value
FROM cum CROSS JOIN probs
WHERE c >= CEIL(prob * tot)
GROUP BY ALL
"""


def similar_docs_oracle_sql(shingles_sql: str, probe_id: int, k: int) -> str:
    """DuckDB twin of the shingle-Jaccard probe: exact overlap vs every
    other document, top-k by (jaccard DESC, doc_id).  ``shingles_sql``
    yields (doc_id, sh)."""
    return f"""
WITH ds AS MATERIALIZED ({shingles_sql}),
probe AS (SELECT sh FROM ds WHERE doc_id = {int(probe_id)}),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY 1),
common AS (
  SELECT ds.doc_id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM ds JOIN probe USING (sh)
  WHERE ds.doc_id <> {int(probe_id)}
  GROUP BY 1
)
SELECT c.doc_id, c.n_common,
       ROUND(CAST(c.n_common AS DOUBLE)
             / CAST(s.n_sh + (SELECT n FROM np) - c.n_common AS DOUBLE), 6)
         AS jaccard
FROM common c JOIN sizes s USING (doc_id)
ORDER BY jaccard DESC, c.doc_id
LIMIT {int(k)}
"""
