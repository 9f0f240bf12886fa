"""Declarative data-quality expectations (the Deequ/Great-Expectations
shape): a rule list compiles to ONE conditional-aggregation pass over the
table — every not-null / range / regex / set-membership rule becomes a
`SUM(CASE WHEN violated)` column in a single global aggregate, so the
whole report costs one scan regardless of rule count. Uniqueness rules
need a distinct count and compile to one extra groupBy per keyed column.

At 100 TB this is the only sane shape: N rules never mean N scans, and
the aggregate is map-side-combined to a single row per partition before
the one-row exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect",
    "validate_expectations",
    "snapshot_diff",
    "snapshot_diff_oracle_sql",
]


def expect(kind: str, col: str, *args) -> tuple:
    """Rule constructor: kinds are 'not_null', 'in_range' (lo, hi,
    inclusive), 'matches' (regex), 'in_set' (values...), 'unique'."""
    return (kind, col, args)


def _violation(kind: str, col: str, args: tuple) -> Column:
    c = F.col(col)
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        lo, hi = args
        return c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    if kind == "matches":
        (pattern,) = args
        return c.isNull() | ~c.rlike(pattern)
    if kind == "in_set":
        return c.isNull() | ~c.isin(list(args))
    raise ValueError(f"unknown expectation kind {kind!r}")


def validate_expectations(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """(rule, col_name, violations, total): one row per rule.

    All row-local rules ride one aggregate; each 'unique' rule adds one
    groupBy over its column (violations = rows beyond the first per
    duplicated value)."""
    row_rules = [(k, c, a) for (k, c, a) in rules if k != "unique"]
    uniq_rules = [(k, c, a) for (k, c, a) in rules if k == "unique"]

    spark = df.sparkSession
    parts = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.sum(_violation(k, c, a).cast("long")).alias(f"_r{i}")
            for i, (k, c, a) in enumerate(row_rules)
        ]
        row = df.agg(*aggs).collect()[0]
        parts.append(
            spark.createDataFrame(
                [
                    (f"{k}:{c}", c, int(row[f"_r{i}"] or 0), int(row["_total"]))
                    for i, (k, c, a) in enumerate(row_rules)
                ],
                "rule string, col_name string, violations long, total long",
            )
        )
    for k, c, _a in uniq_rules:
        dup = df.groupBy(c).agg(F.count(F.lit(1)).alias("n"))
        agg = dup.agg(
            F.sum(F.col("n") - 1).alias("v"), F.sum("n").alias("t")
        ).collect()[0]
        parts.append(
            spark.createDataFrame(
                [(f"unique:{c}", c, int(agg["v"] or 0), int(agg["t"] or 0))],
                "rule string, col_name string, violations long, total long",
            )
        )
    if not parts:
        raise ValueError("rules must be non-empty")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(id_col, status): reconcile two snapshots of a keyed table —
    'added' (key only in new), 'removed' (key only in old), 'changed'
    (key in both, any compared column differs); unchanged keys are
    omitted.  The incremental-ingestion audit every versioned corpus
    needs before promoting a new crawl.

    Each side collapses to (id, digest) FIRST — so the full-outer join
    ships two narrow columns per row, co-partitions on the key, and never
    compares wide payloads twice.  The digest is md5 over an INJECTIVE
    length-prefixed encoding of the compared columns ("v<len>:<value>|"
    per value, "n|" for NULL): plain separator-joined concatenation is
    injectable — a value containing the separator can shift bytes between
    columns and make genuinely different rows hash equal.  Spark cannot
    broadcast either side of a full outer join (it would drop the hint),
    so none is attempted.
    """
    cols = compare_cols or [c for c in new.columns if c != id_col]

    def digest() -> Column:
        parts = []
        for c in cols:
            s = F.col(c).cast("string")
            parts.append(
                F.when(s.isNull(), F.lit("n|")).otherwise(
                    F.concat(
                        F.lit("v"), F.length(s), F.lit(":"), s, F.lit("|")
                    )
                )
            )
        return F.md5(F.concat(*parts))

    o = old.select(F.col(id_col), digest().alias("_od"))
    nw = new.select(F.col(id_col), digest().alias("_nd"))
    joined = o.join(nw, [id_col], "full_outer")
    status = (
        F.when(F.col("_od").isNull(), F.lit("added"))
        .when(F.col("_nd").isNull(), F.lit("removed"))
        .when(F.col("_od") != F.col("_nd"), F.lit("changed"))
    )
    return (
        joined.select(F.col(id_col), status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def snapshot_diff_oracle_sql(
    old_sql: str, new_sql: str, id_col: str, compare_cols: list[str]
) -> str:
    """DuckDB twin of `snapshot_diff` — the identical injective
    length-prefixed md5 digest."""
    def dig() -> str:
        parts = " || ".join(
            f"CASE WHEN CAST({c} AS VARCHAR) IS NULL THEN 'n|'"
            f" ELSE 'v' || length(CAST({c} AS VARCHAR)) || ':'"
            f" || CAST({c} AS VARCHAR) || '|' END"
            for c in compare_cols
        )
        return f"md5({parts})"

    return f"""
WITH o AS (SELECT {id_col}, {dig()} AS od FROM ({old_sql})),
n AS (SELECT {id_col}, {dig()} AS nd FROM ({new_sql})),
j AS (
  SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col}, od, nd
  FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
)
SELECT {id_col},
       CASE WHEN od IS NULL THEN 'added'
            WHEN nd IS NULL THEN 'removed'
            WHEN od <> nd THEN 'changed' END AS status
FROM j
WHERE od IS NULL OR nd IS NULL OR od <> nd
"""


ORDERS_EXPECTATIONS_ORACLE_SQL = """
SELECT 'not_null:o_custkey' AS rule, 'o_custkey' AS col_name,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       COUNT(*) AS total
FROM orders
UNION ALL
SELECT 'in_range:o_totalprice', 'o_totalprice',
       CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
                     OR o_totalprice > 600000.0 THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'matches:o_orderstatus', 'o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus IS NULL
                     OR NOT regexp_matches(o_orderstatus, '^[OFP]$')
                THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'unique:o_orderkey', 'o_orderkey',
       CAST(SUM(n - 1) AS BIGINT), CAST(SUM(n) AS BIGINT)
FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
"""
