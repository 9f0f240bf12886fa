"""Plan-discipline tests: the physical plans we'd want at 100 TB.

Checks that Catalyst actually produces: column pruning into the parquet
scan, broadcast joins for dims, partition pruning on the prep store, and
no Python UDFs (BatchEvalPython) on any hot path.
"""

from __future__ import annotations

import re

import __spark_entry__ as E

from .conftest import SF_ORACLE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_revenue(spark):
    plan = _plan(E.q_revenue_by_customer(spark, SF_ORACLE))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li = [s for s in schemas if "l_extendedprice" in s]
    assert li, plan
    # the lineitem scan reads exactly the 3 needed columns
    assert set(li[0].split(",")) == {
        "l_orderkey:bigint", "l_extendedprice:double", "l_discount:double"
    }


def test_broadcast_join_for_dims(spark):
    plan = _plan(E.q_revenue_by_nation(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown(spark):
    df = E._t(spark, SF_ORACLE, "orders").where("o_totalprice > 100000").select(
        "o_orderkey"
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_no_python_udf_on_hot_paths(spark):
    for name in ("revenue_by_customer", "ppr_power", "text_profile",
                 "minhash_lsh_candidates", "simsearch_cosine"):
        plan = _plan(E.queries()[name](spark, SF_ORACLE))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_whole_stage_codegen_spans(spark):
    # join+agg pipelines fuse into codegen stages (higher-order array lambdas
    # in text_profile legitimately stay interpreted — not asserted there)
    import contextlib
    import io

    # AQE defers codegen to per-stage runtime plans; disable it to inspect
    # the statically fused plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = E.q_revenue_by_customer(spark, SF_ORACLE)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="codegen")
        out = buf.getvalue()
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", out)
        assert m and int(m.group(1)) >= 1, out[:500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_partial_aggregation_mapside(spark):
    """Sum-by-key merges must partial-aggregate before the exchange."""
    plan = _plan(E.q_revenue_by_customer(spark, SF_ORACLE))
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # partial below
