"""Mergeable level-sampling quantile sketch (functions/quantile_sketch):
exact fold==batch mergeability, rank-error accuracy, level-cap headroom,
plan shape, and a Hypothesis fuzz of the oracle builder against a
pure-Python replay."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions.quantile_sketch import (
    HASH_BITS,
    MAX_LEVEL,
    fold_quantile_partials,
    quantile_partials,
    quantile_sketch,
    quantile_sketch_oracle_sql,
)

PROBS = [0.1, 0.5, 0.9]


def _li_values(spark, sf="0.01"):
    li = spark.read.parquet(f"/root/testdata/sf{sf}/lineitem.parquet")
    return li.select(
        F.col("l_returnflag").alias("stratum"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("key"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )


def test_fold_equals_batch_exactly(spark):
    """The mergeability contract: folding per-epoch partials over ANY
    partition of the data reproduces the whole-data sketch row-for-row
    (nested level filters + additive counts — see module docstring)."""
    src = _li_values(spark, "0.001")
    whole = sorted(
        map(tuple, quantile_sketch(src, "v", "key", "stratum", PROBS, k=64).collect())
    )
    parts = None
    for i in range(4):  # skewed 4-way split (uneven epoch sizes)
        p = quantile_partials(
            src.where(F.col("key") % 4 == i),
            "v", "key", "stratum", k=64,
        )
        parts = p if parts is None else parts.unionAll(p)
    folded = sorted(
        map(tuple, fold_quantile_partials(parts, PROBS, k=64).collect())
    )
    assert folded == whole


def test_rank_accuracy(spark):
    """Realized rank error on the gate fixture: |rank(est) - p*N| within
    the level-sampling bound (loose 6/sqrt(k) of N — deterministic given
    the seed, so this is a fixed regression pin, not a flaky bound)."""
    src = _li_values(spark).localCheckpoint(eager=True)
    k = 512
    out = quantile_sketch(src, "v", "key", "stratum", PROBS, k=k).collect()
    assert out
    by_stratum = {}
    for row in src.collect():
        by_stratum.setdefault(row.stratum, []).append(row.v)
    tol = 6.0 / math.sqrt(k)
    for r in out:
        vals = sorted(by_stratum[r.stratum])
        n = len(vals)
        assert r.n_total == n
        import bisect
        rank = bisect.bisect_right(vals, r.est)
        assert abs(rank - r.p * n) <= tol * n, (
            r.stratum, r.p, rank, r.p * n, tol * n,
        )


def test_level_cap_headroom(spark):
    """MAX_LEVEL never binds at gate scale: the chosen level leaves >= 25
    levels of headroom (a 2**25x data blow-up before the cap matters)."""
    out = quantile_sketch(
        _li_values(spark), "v", "key", "stratum", PROBS, k=128
    ).collect()
    assert max(r.level for r in out) <= MAX_LEVEL - 25


def test_empty_sample_stratum_keeps_count(spark):
    """A stratum whose sample legally empties (tiny stratum, adverse
    hashes) still reports its exact n_total through the meta row."""
    df = spark.createDataFrame(
        [("s", i, 100 + i) for i in range(5)], "stratum string, key long, v long"
    )
    parts = quantile_partials(df, "v", "key", "stratum", k=64)
    meta = [r for r in parts.collect() if r.is_meta]
    assert len(meta) == 1 and meta[0].n_total == 5


def test_plan_shape(spark):
    """No cartesian on data paths (the probs explode rides the totals
    frame), no Python, bounded exchanges, and the sample window is
    stratum-partitioned (never global)."""
    df = quantile_sketch(_li_values(spark), "v", "key", "stratum", PROBS, k=128)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    n = plan.count("Exchange")
    assert n <= 12, f"quantile_sketch: {n} exchanges > 12"


# --- oracle-builder fuzz: DuckDB replay vs pure Python ---------------------


def _ph(x, seed=7):
    return int(hashlib.md5(f"{x}#{seed}".encode()).hexdigest()[:12], 16)


def _py_sketch(rows, probs, k):
    """Pure-Python replay of the sketch over (stratum, key, v) rows."""
    strata = {}
    for s, key, v in rows:
        strata.setdefault(s, []).append((v, _ph(key)))
    out = []
    for s, vals in strata.items():
        n = len(vals)
        level = 0
        for l in range(MAX_LEVEL + 1):
            if sum(1 for _, h in vals if h < (1 << (HASH_BITS - l))) > k:
                level += 1
        thr = 1 << (HASH_BITS - level)
        samp = sorted((v, h) for v, h in vals if h < thr)
        n_sample = len(samp)
        for p in probs:
            t = math.ceil(p * n)
            est = None
            for i, (v, _) in enumerate(samp, start=1):
                if i * (1 << level) >= t:
                    est = v
                    break
            if est is None and samp:
                est = samp[-1][0]
            out.append((s, p, est, level, n_sample, n))
    return sorted(out)


rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["x", "y"]),
        st.integers(0, 10_000),
        st.integers(-50, 50),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[1],  # unique keys (the sketch's contract)
)


@settings(max_examples=50, deadline=None)
@given(rows=rows_strategy)
def test_oracle_matches_python_replay(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE vals(stratum VARCHAR, key BIGINT, v BIGINT)")
    con.executemany("INSERT INTO vals VALUES (?,?,?)", rows)
    sql = quantile_sketch_oracle_sql(
        "SELECT stratum, key, v FROM vals", [0.25, 0.75], k=4
    )
    got = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == _py_sketch(rows, [0.25, 0.75], k=4)
    con.close()
