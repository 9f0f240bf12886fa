"""Star-schema table loaders.

`load_events` converts the nanosecond-precision `ts` (read as long under
`spark.sql.legacy.parquet.nanosAsLong`) to a microsecond timestamp with
floor semantics — exactly how DuckDB ingests TIMESTAMP(NANOS), so oracle
comparisons stay bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); Spark 4 refuses it unless
        # read as long — set the conf here so sessions not built by
        # session.build_spark (e.g. the verify driver's) work too
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — a double-division floor loses ulps at 1.7e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
