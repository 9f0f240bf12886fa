"""Benchmark report sink (S6).

The reference appends timestamped metric rows to `<db>_AlgoPerfResults.txt`
(Gen_Util.java:329, 505-510; rows at 139-247). Spark-native: a results
DataFrame appended as CSV with the same column layout (FIXTURES.md F8), plus
a run timestamp column instead of section headers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPORT_COLUMNS = [
    "run_ts", "suite", "algo", "param", "k",
    "prep_ms", "prep_bytes", "avg_ms", "avg_precision", "avg_ndcg", "avg_max_err",
]

_SCHEMA = (
    "suite string, algo string, param double, k int, prep_ms long, "
    "prep_bytes long, avg_ms long, avg_precision double, avg_ndcg double, "
    "avg_max_err double"
)


def report_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    data = [
        tuple(r.get(c) for c in REPORT_COLUMNS[1:]) for r in rows
    ]
    df = spark.createDataFrame(data, schema=_SCHEMA)
    return df.select(
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias("run_ts"),
        *REPORT_COLUMNS[1:],
    )


def append_report(df: DataFrame, path: str) -> None:
    df.write.mode("append").option("header", True).csv(path)


def read_report(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("header", True).csv(path)
