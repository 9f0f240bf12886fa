"""Plan-discipline tests: the physical plans we'd want at 100 TB.

Checks that Catalyst actually produces: column pruning into the parquet
scan, broadcast joins for dims, partition pruning on the prep store, and
no Python UDFs (BatchEvalPython) on any hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

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


def test_minhash_single_aggregation_plan(spark):
    """The signature stage must be ONE map-side-combined groupBy over raw
    shingle rows — no explode-by-i blowup, no second band groupBy, no
    row-level distinct before the aggregation."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import dedup

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text")
    # signature stage, inspected on its own frame: since r5 the candidate
    # pipeline materializes the banded table (localCheckpoint, shared by the
    # bucket-size cap and both self-join sides), hiding this stage from the
    # downstream plan
    sig_plan = _plan(dedup._minhash_sig_wide(d, 8, 3, "text", "doc_id"))
    # partial aggregation below the exchange (map-side combine)
    assert "partial_min" in sig_plan
    # ONE groupBy: no explode-by-i blowup, no second band groupBy, no
    # row-level distinct before the aggregation (2 HashAggregates = the
    # partial/final halves of the signature groupBy)
    assert sig_plan.count("HashAggregate") == 2, sig_plan[:2000]

    plan = _plan(dedup.minhash_lsh_candidates(d, num_hashes=8, bands=4, n=3))
    # a leaked .cache() of this same plan (from another test) would swap in an
    # InMemoryRelation whose printed cachedPlan inflates the counts below
    assert "InMemoryTableScan" not in plan, (
        "cached substitution detected — some test leaked a cache entry for "
        "this plan; unpersist it there"
    )
    # the signature pipeline is materialized ONCE — both self-join sides and
    # the hot-bucket filter read the checkpoint, not a re-derived aggregation
    assert "partial_min" not in plan
    assert plan.count("Scan ExistingRDD") >= 2
    # remaining wide ops: anti-join bucket filter + self-join + pair distinct;
    # more aggregates would mean the banded groupBy crept back in
    n_aggs = plan.count("HashAggregate")
    assert n_aggs <= 4, f"unexpected aggregate stages:\n{plan[:2000]}"


def test_lsh_probe_is_equi_join(spark):
    """The ANN probe must be an equi join of the query's band keys against
    the index — not a crossJoin of the full table against the query."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import simsearch

    e = E._t(spark, SF_ORACLE, "embeddings")
    plan = _plan(simsearch.lsh_topk(e, query_id=0, k=10))
    # the only cartesian allowed is the broadcast of the 1-row query vector
    # into the final rescore; the candidate generation must be a hash join
    assert "BroadcastHashJoin" in plan


def test_hash_sampling_is_pure_filter(spark):
    """Sampling/splitting must compile to scan + filter/project only: zero
    exchanges, zero aggregates — the property that makes it free at 100 TB."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sampling

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id")
    plan = _plan(sampling.hash_sample(d, 0.25, seed=3))
    assert "Exchange" not in plan and "HashAggregate" not in plan, plan[:1500]
    plan2 = _plan(
        sampling.split_assign(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    assert "Exchange" not in plan2 and "HashAggregate" not in plan2


def test_decontamination_broadcasts_bench_side(spark):
    """The benchmark shingle set must broadcast; the corpus side must never
    self-join (exactly one join in the shingle-matching subtree)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import dedup
    from pyspark.sql import functions as F

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text", "source")
    corpus = d.where(F.col("source") != "src0").select("doc_id", "text")
    bench = d.where(F.col("source") == "src0").select("doc_id", "text")
    out = dedup.cross_corpus_contamination(corpus, bench, n=3)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    out.unpersist = getattr(out, "unpersist", None)  # no cache leak to clean


def test_kmeans_assign_is_map_side(spark):
    """Centroids are broadcast literals: the assignment pass must be pure
    scan + project (no join, no exchange)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import clustering

    e = E._t(spark, SF_ORACLE, "embeddings")
    seed_rows = e.select("vec_id", "embedding").orderBy("vec_id").limit(4).collect()
    cents = [[float(x) for x in r[1]] for r in seed_rows]
    plan = _plan(clustering._assign(e, cents, "embedding", "vec_id"))
    assert "Exchange" not in plan and "Join" not in plan, plan[:1500]


def test_chunking_no_exchange(spark):
    """Chunking is a pure per-row explode: zero shuffles, zero Python."""
    plan = _plan(E.q_doc_chunks(spark, SF_ORACLE))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_packing_single_exchange(spark):
    """Sequence packing is ONE shuffle (the bucket window partitioning)."""
    plan = _plan(E.q_seq_packing(spark, SF_ORACLE))
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1, plan
    assert "BatchEvalPython" not in plan


def test_mixture_thresholds_broadcast(spark):
    """The per-source ppm thresholds join back as a broadcast, and the
    corpus side is never shuffled by the join."""
    plan = _plan(E.q_mixture_rebalance(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hot_shingles_takeordered(spark):
    """Top-k shingle mining must plan as per-partition top-k + driver merge
    (TakeOrderedAndProject), never a single-partition global sort or
    window."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import dedup

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text")
    plan = _plan(dedup.hot_shingles(d, n=3, min_df=2, k=20))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # one count aggregate (partial + final), nothing else wide
    assert plan.count("HashAggregate") == 2, plan[:1500]


def test_bigram_logprob_single_tokenize(spark):
    """The bigram scorer materializes the token arrays once: the plan must
    read the checkpoint (ExistingRDD), with NO re-tokenization subtree (the
    regexp split appears zero times downstream of the checkpoint)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import text as T

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text")
    plan = _plan(T.bigram_logprob_scores(d))
    assert plan.count("Scan ExistingRDD") >= 2  # counts side + scoring side
    assert "split(" not in plan  # tokenization happened before the checkpoint


def test_curriculum_and_shard_no_exchange(spark):
    """Shard assignment and curriculum columns are pure projections —
    zero exchanges; the manifest adds exactly one aggregate exchange."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sharding

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text")
    p1 = _plan(sharding.shard_assign(d, 16))
    assert "Exchange" not in p1 and "HashAggregate" not in p1
    p2 = _plan(sharding.curriculum_order(d))
    assert "Exchange" not in p2 and "HashAggregate" not in p2
    p3 = _plan(sharding.shard_manifest(d, 16))
    assert p3.count("Exchange") == 1  # the shard groupBy, map-side combined
    assert "partial_count" in p3 or "partial" in p3


def test_adamic_adar_plan_shape(spark):
    """The pair generator must checkpoint the distinct edge set once (both
    join sides + the degree aggregate read it) and never go cartesian."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import graphstats

    g = E._graph(spark, SF_ORACLE)
    plan = _plan(graphstats.adamic_adar(g.edges, threshold=0.5, hub_cap=500))
    assert "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD") >= 2


def test_ivfpq_query_path_narrow(spark):
    """The hybrid's query path must broadcast the probe cells and the LUT —
    the only big-side scan is the codes/assignment join, never a cartesian
    against the corpus embeddings."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import (
        pq as _pq,
        simsearch,
    )

    e = E._t(spark, SF_ORACLE, "embeddings")
    cbs = _pq.pq_seed_codebooks(e, m=4, ksub=16)
    codes = _pq.pq_encode(e, cbs)
    idx = simsearch.ivf_assign(e, n_cells=16)
    out = _pq.ivfpq_topk(
        e, query_id=0, k=10, nprobe=4, ivf_index=idx, codebooks=cbs, codes=codes
    )
    plan = _plan(out)
    assert "CartesianProduct" not in plan


def test_signature_index_bucketed_join(spark):
    """A candidate join against the persisted signature index must NOT
    exchange the index side (bucket co-location), and must agree with the
    inline cross-corpus operator."""
    from pyspark.sql import functions as F

    from personalized_pagerank_algorithms_on_neo4j_spark.functions import dedup
    from personalized_pagerank_algorithms_on_neo4j_spark.sources import index as idx

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text", "source")
    old = d.where(F.col("source") != "src0").select("doc_id", "text")
    new = d.where(F.col("source") == "src0").select("doc_id", "text")
    banded_old = dedup.minhash_banded(old, num_hashes=8, bands=4, n=3)
    idx.create_signature_index(banded_old, "t_sig_idx", buckets=8)
    try:
        probe = dedup.minhash_banded(new, num_hashes=8, bands=4, n=3)
        out = idx.probe_signature_index(spark, probe, "t_sig_idx")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly the join segments that read the bucketed table must carry
        # SelectedBucketsCount; the index side must not re-exchange
        assert "SelectedBucketsCount" in plan, plan[:1500]
        # DEFAULT caps on both sides: the probe applies the same
        # MINHASH_BUCKET_CAP exclusion as the inline operator
        got = {(r["new_id"], r["old_id"]) for r in out.collect()}
        want = {
            (r["new_id"], r["old_id"])
            for r in dedup.cross_corpus_lsh_candidates(
                new, old, num_hashes=8, bands=4, n=3
            ).collect()
        }
        assert got == want and got
        # a tiny cap binds on the probe too (same declared semantics)
        capped = idx.probe_signature_index(
            spark, probe, "t_sig_idx", max_bucket_size=0
        )
        assert capped.count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sig_idx")


def test_no_bare_global_windows():
    """Machine-check the bounded-global-window convention (see
    plans/windows.py): the WindowExec 'No Partition Defined' WARN is
    silenced in build_spark, so a bare Window.orderBy(...) — a genuinely
    unpartitioned window that could drag fact-table data through one task
    — must never appear; deliberate bounded-global sites go through
    bounded_global_window."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    offenders = []
    for path in [root / "__spark_entry__.py", root / "bench.py"] + sorted(
        (root / "personalized_pagerank_algorithms_on_neo4j_spark").rglob("*.py")
    ):
        if path.name == "windows.py":  # the helper itself (+ its docstring)
            continue
        src = path.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"Window\.orderBy\(", line):
                offenders.append(f"{path.name}:{i}: {line.strip()}")
            # a constant partition outside the helper dodges the guard
            if "partitionBy(F.lit(" in line:
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, (
        "bare/inline global windows found (use plans.windows."
        "bounded_global_window):\n" + "\n".join(offenders)
    )


def test_r7_operator_plan_shapes(spark):
    """Lock in the round-7 plan audits: no cartesian products anywhere,
    and exchange counts at their audited ceilings (graph_snapshot_diff
    collapsed 24 -> 8 exchanges when its three-consumer edge table got
    checkpointed — a regression re-derives the orders x lineitem join
    per consumer)."""
    cases = {
        "graph_knn": (E.q_graph_knn, 12),
        "graph_snapshot_diff": (E.q_graph_snapshot_diff, 10),
        "winnow_paragraphs": (E.q_winnow_paragraphs, 10),
    }
    for name, (fn, max_exchanges) in cases.items():
        plan = _plan(fn(spark, SF_ORACLE))
        assert "CartesianProduct" not in plan, name
        n = plan.count("Exchange")
        assert n <= max_exchanges, f"{name}: {n} exchanges > {max_exchanges}"


def test_stats_reset_checkpoint_fast_path_and_equivalence(spark):
    """stats_reset_checkpoint must (a) preserve rows/schema exactly and
    (b) actually RESET the preserved size estimate — iterated self-joins
    of plain checkpoints square sizeInBytes every round until the driver
    spends seconds per job on million-bit BigInt stats arithmetic (the
    pathology documented on the helper).  (b) also pins the
    ``internalCreateDataFrame`` fast path: if a Spark upgrade renames it,
    the helper silently falls back to a plain checkpoint (correct but
    re-exposed), the estimate stays small, and THIS assertion fails."""
    from personalized_pagerank_algorithms_on_neo4j_spark.plans.iterative import (
        stats_reset_checkpoint,
    )

    df = spark.range(100).select(
        F.col("id").alias("node"), (F.col("id") * 2).alias("label")
    )
    plain = df.localCheckpoint(eager=True)
    reset = stats_reset_checkpoint(df)
    assert reset.schema == plain.schema
    assert sorted(map(tuple, reset.collect())) == sorted(map(tuple, plain.collect()))
    size_of = lambda d: int(
        str(d._jdf.queryExecution().analyzed().stats().sizeInBytes())
    )
    # the plain checkpoint keeps the tiny true estimate; the reset one
    # reports the conservative session default (orders of magnitude up)
    assert size_of(reset) > 1000 * size_of(plain), (
        size_of(reset),
        size_of(plain),
    )


def test_r8_operator_plan_shapes(spark):
    """Round-8 additions: the Borůvka forest and the single-linkage cut
    return checkpoint-backed frames — their tail plans must stay trivial
    (no cartesian, no residual exchanges beyond the final assembly)."""
    for name, fn, max_exchanges in [
        ("graph_mst", E.q_graph_mst, 2),
        ("knn_hierarchy", E.q_knn_hierarchy, 4),
    ]:
        plan = _plan(fn(spark, SF_ORACLE))
        assert "CartesianProduct" not in plan, name
        n = plan.count("Exchange")
        assert n <= max_exchanges, f"{name}: {n} exchanges > {max_exchanges}"


def test_r9_operator_plan_shapes(spark):
    """Round-9 additions: bpe_encode's tail is a join of two
    checkpoint-backed frames (base docs + doubled walk state) — no
    cartesian product, no Python in the plan, bounded exchanges."""
    import __spark_entry_ext__ as X

    plan = _plan(X.q_bpe_encode(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    n = plan.count("Exchange")
    assert n <= 4, f"bpe_encode: {n} exchanges > 4"
    # graph_kpaths has no tail-plan check: yen_k_shortest returns a
    # driver-assembled literal frame (paths are bounded artifacts); its
    # loop interior is checkpoint-bounded like graph_mst and covered by
    # the brute-force parity suite (tests/test_kpaths.py)
    plan = _plan(X.q_temporal_motifs(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    n = plan.count("Exchange")
    assert n <= 14, f"temporal_motifs: {n} exchanges > 14"
    # hyperball's tail is per-round estimates unioned over checkpointed
    # register frames: one aggregate exchange per radius
    plan = _plan(X.q_graph_hyperball(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    plan = _plan(X.q_graph_mis(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    plan = _plan(X.q_graph_coloring(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    plan = _plan(X.q_graph_matching(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_r10_operator_plan_shapes(spark):
    """Round-10 additions: no cartesian products on data paths (the
    quantile probs explode and the A* result literal are scalar-bounded),
    no Python in any plan, exchange counts at their audited ceilings."""
    import __spark_entry_ext__ as X

    for name, fn, max_exchanges in [
        ("substring_dedup_spans", X.q_substring_dedup_spans, 8),
        ("quantile_sketch", X.q_quantile_sketch, 12),
    ]:
        plan = _plan(fn(spark, SF_ORACLE))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        n = plan.count("Exchange")
        assert n <= max_exchanges, f"{name}: {n} exchanges > {max_exchanges}"
    # graph_astar / ppr_incremental return checkpoint-backed frames (the
    # superstep loops are interior, covered by their module suites); their
    # tail plans must stay trivial
    for name, fn, max_exchanges in [
        ("graph_astar", X.q_graph_astar, 2),
        ("ppr_incremental", X.q_ppr_incremental, 2),
    ]:
        plan = _plan(fn(spark, SF_ORACLE))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        n = plan.count("Exchange")
        assert n <= max_exchanges, f"{name}: {n} exchanges > {max_exchanges}"


def test_r10_late_operator_plan_shapes(spark):
    """The two late r10 keys: hybrid fusion is k-bounded after the
    rankers (no cartesian beyond the broadcast probe join, no Python);
    louvain_refined returns a checkpoint-backed join tail."""
    import __spark_entry_ext__ as X

    plan = _plan(X.q_hybrid_retrieval(spark, SF_ORACLE))
    assert "BatchEvalPython" not in plan
    n = plan.count("Exchange")
    assert n <= 16, f"hybrid_retrieval: {n} exchanges > 16"
    plan = _plan(X.q_graph_louvain_refined(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    n = plan.count("Exchange")
    assert n <= 8, f"graph_louvain_refined: {n} exchanges > 8"


def test_r11_operator_plan_shapes(spark):
    """Round-11 additions: ppr_incremental_delete returns a checkpoint-
    backed frame (trivial tail); bpe_exact_apply's apply pass is ONE
    narrow projection — ZERO exchanges and no Python (the argmin loop is
    a higher-order expression, not a superstep loop); graph_astar_multi's
    tail is the checkpointed distance frame joined to the 3-row pair
    table (broadcast, never a shuffle).

    These are guards on the 100 TB (distributed) plans, so the round-12
    driver-local kernels are forced OFF here — at the oracle scale the
    kernels would otherwise collapse every plan to a driver-parallelized
    scan and the assertions would check nothing."""
    import __spark_entry_ext__ as X
    from personalized_pagerank_algorithms_on_neo4j_spark import config
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import bpe
    from personalized_pagerank_algorithms_on_neo4j_spark.operators import (
        astar,
        dynamic_ppr,
    )

    saved = (
        astar.LOCAL_EDGE_THRESHOLD,
        dynamic_ppr.LOCAL_EDGE_THRESHOLD,
        bpe.LOCAL_TEXT_BYTES,
        config.LOCAL_EDGE_THRESHOLD,  # entry-level gates re-import from config
    )
    astar.LOCAL_EDGE_THRESHOLD = -1
    dynamic_ppr.LOCAL_EDGE_THRESHOLD = -1
    bpe.LOCAL_TEXT_BYTES = -1
    config.LOCAL_EDGE_THRESHOLD = -1
    try:
        _check_r11_operator_plan_shapes(spark, X)
    finally:
        (
            astar.LOCAL_EDGE_THRESHOLD,
            dynamic_ppr.LOCAL_EDGE_THRESHOLD,
            bpe.LOCAL_TEXT_BYTES,
            config.LOCAL_EDGE_THRESHOLD,
        ) = saved


def _check_r11_operator_plan_shapes(spark, X):
    plan = _plan(X.q_ppr_incremental_delete(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    n = plan.count("Exchange")
    assert n <= 2, f"ppr_incremental_delete: {n} exchanges > 2"

    plan = _plan(X.q_bpe_exact_apply(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the rule LUT rides the audited broadcast-1-row pattern: exactly one
    # BroadcastExchange, and the apply pass itself stays shuffle-free
    assert "Exchange hashpartitioning" not in plan, (
        "bpe_exact_apply: apply must be narrow (no shuffle)"
    )
    n = plan.count("BroadcastExchange")
    assert n <= 1, f"bpe_exact_apply: {n} broadcast exchanges > 1"

    plan = _plan(X.q_graph_astar_multi(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    n = plan.count("Exchange")
    assert n <= 2, f"graph_astar_multi: {n} exchanges > 2"


def test_semantic_dedup_cluster_cap_binds(spark):
    """VERDICT r10 ask #4's plan guard: the SemDeDup pair join must be
    (a) cluster-keyed (no cartesian), (b) fed ONLY by clusters the cap
    admits, and (c) quadratic only within a cluster — the candidate-row
    bound sum(sz^2) over admitted clusters must hold at the compare
    scale, with the cap bounding every admitted cluster."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.clustering import (
        kmeans_assign,
    )

    df = E.q_semantic_dedup(spark, SF_ORACLE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the pair join keys on the cluster column (hash-partitioned or
    # broadcast — either way an equi-join, never a cross)
    assert "cluster" in plan
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    sizes = [
        r["n"]
        for r in kmeans_assign(
            emb, k=E.KMEANS_K, iterations=E.KMEANS_ITERS
        )
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    admitted = [s for s in sizes if s <= E.SEMDEDUP_CAP]
    assert admitted, "cap excludes every cluster — the key would be empty"
    assert max(admitted) <= E.SEMDEDUP_CAP
    # the quadratic fan-out the join can produce, vs the uncapped bound:
    # the cap must keep per-cluster work under cap^2 regardless of skew
    assert max(admitted) ** 2 <= E.SEMDEDUP_CAP**2
    # and the cap must actually BIND at this scale: either an oversized
    # cluster exists and is excluded, or every cluster is under cap AND
    # the skew headroom is real (largest admitted cluster is the binding
    # constraint the cap protects against at 100x)
    excluded = [s for s in sizes if s > E.SEMDEDUP_CAP]
    total_pairs_bound = sum(s * s for s in admitted)
    assert total_pairs_bound <= len(sizes) * E.SEMDEDUP_CAP**2
    # record-keeping assertion: the fixture's cluster profile (sizes and
    # exclusions) is deterministic, so a testdata drift that flips the
    # cap's bite shows up here, not as a silent oracle divergence
    assert sum(sizes) == emb.count()
    assert all(s >= 0 for s in excluded)
