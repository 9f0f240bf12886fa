"""Shared literal-graph fixture builders for the graph-operator gates.

One copy of the edge/label table builders (Spark frame + DuckDB VALUES
twin) so the BIGINT-cast discipline the dtype-parity gate depends on
lives in exactly one place.
"""

from __future__ import annotations


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def edges_sql(pairs):
    vals = ", ".join(f"({s}, {d})" for s, d in pairs)
    return (
        f"SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst "
        f"FROM (VALUES {vals}) AS t(src, dst)"
    )


def labels_sql(pairs):
    vals = ", ".join(f"({n}, {l})" for n, l in pairs)
    return (
        f"SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label "
        f"FROM (VALUES {vals}) AS t(node, label)"
    )
