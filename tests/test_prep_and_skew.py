"""Legacy text prep-store roundtrip (S4/S5/P6) + salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.plans.skew import salted_join
from personalized_pagerank_algorithms_on_neo4j_spark.sources.prep_store import (
    read_prep_text,
    write_prep_text,
)


def test_prep_text_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, 0.25), (2, 10, 0.125)],
        "source long, target long, ppr double",
    )
    path = str(tmp_path / "prep_text")
    write_prep_text(df, path)
    back = read_prep_text(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    pruned = read_prep_text(spark, path, source=1)
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # source= prune survives the text format


def test_salted_join_equivalence(spark):
    big = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(0, "a"), (1, "b")], "k long, tag string")
    plain = big.join(small, "k").groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(big, small, "k").groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(tuple(r) for r in plain.collect()) == sorted(
        tuple(r) for r in salted.collect()
    )


def test_salted_join_salt_is_deterministic_and_spreads(spark):
    """Row-identical inputs produce IDENTICAL per-row salt routing under a
    physical reshuffle (retry/AQE safety — F.rand would flutter), and a hot
    key's rows still spread across buckets (hash-of-key-only would not)."""
    big = spark.range(0, 1000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "hot")], "k long, tag string")
    a = salted_join(big, small, "k", salt_buckets=8)
    b = salted_join(big.repartition(13, "v"), small, "k", salt_buckets=8)
    assert sorted(tuple(r) for r in a.collect()) == sorted(
        tuple(r) for r in b.collect()
    )
    # the deterministic salt must actually split the single hot key
    # (same expression salted_join builds: hash over all big columns)
    salted = big.withColumn(
        "_salt", F.pmod(F.hash("k", "v"), F.lit(8)).cast("int")
    )
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 8


def test_salted_join_skips_map_columns(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.plans.skew import (
        salted_join,
    )

    big = spark.createDataFrame(
        [(1, {"a": "b"}, 10), (1, {"c": "d"}, 20), (2, {}, 30)],
        schema="k int, props map<string,string>, v int",
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    out = salted_join(big, small, "k", salt_buckets=4).collect()
    assert sorted((r["k"], r["v"], r["name"]) for r in out) == [
        (1, 10, "one"),
        (1, 20, "one"),
        (2, 30, "two"),
    ]
    # all-map big side has no hashable salt input: explicit error, not a
    # silent analysis failure
    import pytest as _pytest

    only_maps = big.select("props")
    with _pytest.raises(ValueError, match="only MapType"):
        salted_join(only_maps, small.withColumnRenamed("k", "props"), "props")
