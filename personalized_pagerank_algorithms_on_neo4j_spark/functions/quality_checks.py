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

__all__ = ["expect", "validate_expectations"]


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
