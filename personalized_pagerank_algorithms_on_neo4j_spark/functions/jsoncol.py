"""Typed extraction over semi-structured JSON string columns.

Event streams carry a free-form ``props`` JSON payload next to the typed
columns (the driver's `events` table mirrors this shape). These helpers
turn selected JSON fields into real typed columns so every downstream
operator (filters, aggregates, joins) runs on native columns.

Scale shape: ``from_json`` parses each string ONCE into a typed struct
inside whole-stage codegen (Jackson on the JVM) — never a Python UDF, and
never N repeated ``get_json_object`` calls re-parsing the same string per
field. Fields the caller doesn't request are never materialized, so
Catalyst prunes the struct down to the extracted columns. Malformed
documents yield NULL fields (PERMISSIVE parse), which aggregates then
skip. DuckDB's ``json_extract`` instead ERRORS on malformed JSON, so the
oracle twin guards every extraction with ``json_valid`` to reproduce the
same null algebra (one malformed row must degrade to a NULL in both
engines, not turn the parity check into a hard error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_fields(
    df: DataFrame, col: str, fields: dict[str, str]
) -> DataFrame:
    """All of ``df``'s columns plus one typed column per requested JSON
    field (``fields`` maps field name -> Spark DDL type, e.g.
    ``{"k": "long"}``). A requested field whose name collides with an
    existing column is rejected up front (the silent alternative is two
    same-named output columns and ambiguous-reference errors downstream).
    """
    clash = set(fields) & set(df.columns)
    if clash:
        raise ValueError(
            f"JSON field(s) {sorted(clash)} collide with existing columns"
        )
    tmp = "_parsed"
    while tmp in df.columns:  # never replace a caller's column
        tmp += "_"
    ddl = ", ".join(f"{name} {typ}" for name, typ in fields.items())
    parsed = df.withColumn(tmp, F.from_json(F.col(col), ddl))
    return parsed.select(
        *df.columns,
        *[F.col(f"{tmp}.{name}").alias(name) for name in fields],
    )


def json_field_stats(
    df: DataFrame, col: str, field: str, group_col: str
) -> DataFrame:
    """Per-``group_col`` integer stats over one JSON number field:
    (group, n_events, k_sum, k_max, k_distinct) — all BIGINT, so the
    DuckDB twin is hash-exact."""
    p = parse_json_fields(df, col, {field: "long"})
    return p.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(field).alias("k_sum"),
        F.max(field).alias("k_max"),
        F.countDistinct(field).alias("k_distinct"),
    )


def json_field_stats_oracle_sql(
    table_sql: str, col: str, field: str, group_col: str
) -> str:
    """DuckDB twin of `json_field_stats` (json_extract + the same
    aggregate set; every integer aggregate CAST to BIGINT — DuckDB's
    HUGEINT SUM otherwise surfaces as float64 in fetchdf). Extraction is
    gated on ``json_valid`` because DuckDB raises 'Malformed JSON' where
    Spark's PERMISSIVE parse yields NULL."""
    j = (
        f"CASE WHEN json_valid({col}) "
        f"THEN CAST(json_extract({col}, '$.{field}') AS BIGINT) END"
    )
    return f"""
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM({j}) AS BIGINT) AS k_sum,
       CAST(MAX({j}) AS BIGINT) AS k_max,
       CAST(COUNT(DISTINCT {j}) AS BIGINT) AS k_distinct
FROM ({table_sql}) t
GROUP BY {group_col}
"""
