"""Product-quantization ANN (functions/pq.py): encode/fit/ADC semantics and
scale-shape (plan) discipline."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions import pq


def _synth_df(spark, n=96, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    X = np.round(rng.normal(size=(n, dim)), 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return X, df


def _numpy_encode(X, books):
    m = len(books)
    dsub = books[0].shape[1]
    codes = np.empty((len(X), m), dtype=int)
    for s, C in enumerate(books):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        d2 = np.round(((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 9)
        codes[:, s] = d2.argmin(axis=1)  # first-min tiebreak == lowest code
    return codes


def test_pq_encode_matches_numpy(spark):
    X, df = _synth_df(spark)
    m, ksub = 4, 8
    cbs = pq.pq_seed_codebooks(df, m=m, ksub=ksub)
    # seed codebooks are the sliced lowest-id rows
    books = [np.asarray(b) for b in cbs]
    assert all(np.allclose(books[s], X[:ksub, s * 2 : (s + 1) * 2]) for s in range(m))

    got = {r["vec_id"]: list(r["codes"]) for r in pq.pq_encode(df, cbs).collect()}
    want = _numpy_encode(X, books)
    assert got == {i: list(map(int, want[i])) for i in range(len(X))}


def test_pq_fit_matches_per_subspace_lloyd(spark):
    """Trained codebooks == an independent numpy Lloyd per sub-space with the
    engine's deterministic seed/rounding rules (clustering.py discipline)."""
    X, df = _synth_df(spark, n=60, dim=4)
    m, ksub, iters = 2, 4, 2
    got = pq.pq_fit(df, m=m, ksub=ksub, iterations=iters)

    dsub = X.shape[1] // m
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        cents = Xs[:ksub].astype(float).copy()
        for _ in range(iters):
            d2 = np.round(((Xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 9)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cents[c] = np.round(Xs[mask].mean(axis=0), 6)
        assert np.allclose(np.asarray(got[s]), cents), f"subspace {s}"


def test_pq_adc_topk_matches_numpy_adc(spark):
    """ADC scores replayed in numpy with identical rounding: same top-k set."""
    X, df = _synth_df(spark, n=80, dim=8, seed=3)
    m, ksub, k = 4, 8, 10
    cbs = pq.pq_fit(df, m=m, ksub=ksub, iterations=1)
    books = [np.asarray(b) for b in cbs]
    codes = _numpy_encode(X, books)

    q = X[0]
    dsub = X.shape[1] // m
    lut = np.stack(
        [
            np.round(((books[s] - q[s * dsub : (s + 1) * dsub]) ** 2).sum(axis=1), 9)
            for s in range(m)
        ]
    )  # m x ksub
    adist = np.round(
        np.sum([lut[s][codes[:, s]] for s in range(m)], axis=0), 6
    )
    kth = np.sort(adist)[k - 1]
    want = {(int(i), float(adist[i])) for i in range(len(X)) if adist[i] <= kth}

    out = pq.pq_adc_topk(df, query_id=0, k=k, codebooks=cbs)
    got = {(r["vec_id"], r["adist"]) for r in out.collect()}
    assert got == want


def test_pq_encode_plan_is_shuffle_free(spark):
    """Encoding is one narrow Arrow map — no Exchange, no Join."""
    _, df = _synth_df(spark, n=32, dim=8)
    cbs = pq.pq_seed_codebooks(df, m=4, ksub=4)
    plan = pq.pq_encode(df, cbs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan[:1500]


def test_pq_query_path_reads_codes_not_embeddings(spark):
    """With a persisted index, the ADC scan's input is the codes table and a
    broadcast LUT — the raw embedding column appears only in the one-row
    query-vector lookup, never in a full-table scan branch."""
    _, df = _synth_df(spark, n=64, dim=8, seed=1)
    cbs = pq.pq_seed_codebooks(df, m=4, ksub=8)
    codes = pq.pq_encode(df, cbs).cache()
    codes.count()
    try:
        # the scoring subchain (what pq_adc_topk materializes): cached codes
        # joined to a broadcast LUT — never the raw embeddings
        from pyspark.sql import Row

        lut = spark.createDataFrame(
            [Row(sub=s, code=c, d=0.5) for s in range(4) for c in range(8)]
        )
        scores = pq._adc_scores(codes, lut, "vec_id")
        plan = scores._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        # candidate side = cached codes (the cache node's stored-lineage
        # string still mentions the embedding column; what matters is that
        # the scan itself is the in-memory codes table)
        assert "InMemoryTableScan" in plan
        # the topk wrapper still returns the right rows on top of it
        out = pq.pq_adc_topk(df, query_id=0, k=5, codebooks=cbs, codes=codes)
        assert out.count() >= 5
    finally:
        codes.unpersist()


def test_ivfpq_restricts_to_probed_cells(spark):
    """The hybrid must return exactly the bottom-k ADC scores of the
    vectors assigned to the nprobe nearest cells — a subset of the
    full-corpus ADC scores, computed without scanning the other cells."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import simsearch

    X, df = _synth_df(spark, n=96, dim=8)
    m, ksub = 4, 8
    cbs = pq.pq_seed_codebooks(df, m=m, ksub=ksub)
    codes = pq.pq_encode(df, cbs)
    centroids, assigned = simsearch.ivf_assign(df, n_cells=6)
    out = {
        r["vec_id"]: r["adist"]
        for r in pq.ivfpq_topk(
            df, query_id=0, k=5, n_cells=6, nprobe=2,
            ivf_index=(centroids, assigned), codebooks=cbs, codes=codes,
        ).collect()
    }
    assert len(out) >= 5
    # every result is in one of the 2 probed cells (recompute the probe)
    q = df.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_q")
    )
    probed = {
        r["cell"]
        for r in centroids.crossJoin(F.broadcast(q))
        .select(
            "cell",
            F.round(simsearch.cosine(F.col("cvec"), F.col("_q")), 9).alias("s"),
        )
        .orderBy(F.desc("s"), F.asc("cell"))
        .limit(2)
        .collect()
    }
    cell_of = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert all(cell_of[v] in probed for v in out)
    # scores equal the full-ADC scores for the same ids (ADC is unchanged,
    # only the candidate set shrinks)
    full = {
        r["vec_id"]: r["adist"]
        for r in pq.pq_adc_topk(
            df, query_id=0, k=96, codebooks=cbs, codes=codes
        ).collect()
    }
    assert all(full[v] == out[v] for v in out)
    # the query's own cell is always probed, so vec 0 (adist ~ 0) is in
    assert 0 in out
