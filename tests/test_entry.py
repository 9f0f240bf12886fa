"""Driver-contract harness: replicates the t2 correctness gate locally.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` DuckDB result: column names, row count, and values
(order-insensitive, doubles rounded to 1e-9) must match exactly.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402

from .conftest import SF_ORACLE, SF_SMALL  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    return con


def _normalize(pdf):
    """Type-SENSITIVE value normalization mirroring the driver's hash.

    The driver distinguishes int64 from float64 (15000 != 15000.0), so each
    value is tagged with its numeric kind. DuckDB returns integer SUM() as
    HUGEINT which fetchdf() converts to float64 — a bare integer SUM in an
    oracle therefore FAILS here, exactly as it fails on the driver (root
    cause of the r4 seq_packing/corpus_report/data_expectations reds).
    """
    import numpy as np

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False):
        row = []
        for v in tup:
            if v is None:
                row.append(None)
            elif isinstance(v, (bool, np.bool_)):
                row.append(("b", bool(v)))
            elif isinstance(v, (float, np.floating)):
                if math.isnan(v):
                    row.append(("f", "nan"))
                else:
                    row.append(("f", round(float(v), 9)))
            elif isinstance(v, (int, np.integer)):
                row.append(("i", int(v)))
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


_KIND_CLASS = {"i": "int", "u": "int", "f": "float"}


def _assert_dtype_parity(name, spark_pdf, duck_pdf):
    """Column-level int-vs-float parity between Spark and DuckDB results.

    Only numeric-kind disagreement fails (the driver's hash is blind to
    object-dtype representation details but not to int64 vs float64).
    """
    for col in spark_pdf.columns:
        sk = _KIND_CLASS.get(spark_pdf.dtypes[col].kind)
        dk = _KIND_CLASS.get(duck_pdf.dtypes[col].kind)
        if sk and dk and sk != dk:
            raise AssertionError(
                f"{name}.{col}: Spark dtype kind {sk} vs DuckDB {dk} — "
                f"driver hash is type-sensitive; CAST the oracle column"
            )


ORACLE = E.oracle_sql()
ALL_QUERIES = E.queries()
CHECKED = sorted(set(ALL_QUERIES) & set(ORACLE))
ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ORACLE))


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, duck, name):
    spark_pdf = ALL_QUERIES[name](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(ORACLE[name]).fetchdf()
    s_cols, s_rows = _normalize(spark_pdf)
    d_cols, d_rows = _normalize(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    _assert_dtype_parity(name, spark_pdf, duck_pdf)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"{s_rows[mism[0]]} vs {d_rows[mism[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_SMALL)
    assert df.count() > 0
    assert len(df.schema.fields) >= 1


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["node", "name", "ppr"]


def test_sql_oracle_depths_cover_convergence(spark):
    """The unrolled-CTE oracle depths must dominate the kernels' actual
    superstep counts at the compare scale (sf0.01) — guards the constants
    against testdata or parameter drift."""
    import numpy as np

    from personalized_pagerank_algorithms_on_neo4j_spark.operators import _kernels

    g = E._graph(spark, SF_ORACLE)
    lg = g.local
    s = lg.dense(E._source(g))
    _, _, steps = _kernels.forward_push_batch(lg, s, E.ALPHA, E.FWD_RMAX)
    assert steps <= E.FWD_STEPS, f"fwdpush needs {steps} > {E.FWD_STEPS}"
    _, _, bsteps = _kernels.backward_search_batch(
        lg, lg.dense(E.BWD_TARGET), E.BWD_ALPHA, E.BWD_RMAX
    )
    assert bsteps <= E.BWD_STEPS, f"backward needs {bsteps} > {E.BWD_STEPS}"
    # base: max supersteps over a deterministic sample of targets
    rng = np.random.default_rng(0)
    sample = rng.choice(lg.n, size=min(100, lg.n), replace=False)
    worst = 0
    for t in sample:
        if lg.in_deg[t] == 0:
            continue
        _, _, st = _kernels.backward_search_batch(
            lg, int(t), E.BWD_ALPHA, E.BASE_THRESHOLD
        )
        worst = max(worst, st)
    assert worst <= E.BASE_STEPS, f"base needs {worst} > {E.BASE_STEPS}"
    # k-core: the Spark side peels to the fixed point while the oracle
    # unrolls exactly KCORE_ORACLE_ROUNDS CTE steps — peel under that bound
    # and let k_core's own RuntimeError fail the test if depth outgrows it
    # (e.g. running the gate at a larger scale factor)
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        k_core,
    )

    k_core(
        E._graph(spark, SF_ORACLE).edges,
        k=E.KCORE_K,
        max_rounds=E.KCORE_ORACLE_ROUNDS,
    ).count()
    # k-truss: same discipline — peel under the oracle's unroll depth and
    # let k_truss's own RuntimeError fail the test if depth outgrows it
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        k_truss,
    )

    k_truss(
        E._graph(spark, SF_ORACLE).edges,
        k=E.KTRUSS_K,
        max_rounds=E.KTRUSS_ORACLE_ROUNDS,
    ).count()
    # sssp: oracle parity holds at ANY round count past Spark's stopping
    # round (fixed-point algebra, operators/sssp.py), but the EXACT-
    # distances claim needs true convergence within SSSP_ROUNDS at the
    # compare scale — replay Bellman-Ford in plain Python and count rounds
    from pyspark.sql import functions as F
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.sssp import (
        undirected_min_cost,
    )

    ue = [
        (r["src"], r["dst"], r["w"])
        for r in undirected_min_cost(
            E._weighted_edges(spark, SF_ORACLE).select(
                "src", "dst", F.col("weight").alias("w")
            )
        ).collect()
    ]
    # SYNCHRONOUS (Jacobi) rounds — in-place sweeps would undercount vs
    # the per-round semantics both engines implement
    dist = {E._source(g): 0}
    rounds = 0
    while True:
        new = dict(dist)
        for u, v, w in ue:
            du = dist.get(u)
            if du is not None and du + w < new.get(v, float("inf")):
                new[v] = du + w
        if new == dist:
            break
        dist = new
        rounds += 1
    assert rounds <= E.SSSP_ROUNDS, f"sssp needs {rounds} > {E.SSSP_ROUNDS}"
    # MST: Borůvka rounds past convergence are no-ops in the unrolled
    # oracle (fixed-round trick), but the Spark side must CONVERGE within
    # MST_ORACLE_ROUNDS at the compare scale — run it under that bound and
    # let boruvka_msf's own strict RuntimeError fail the test if the kNN
    # graph ever needs more
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.simsearch import (
        knn_weighted_edges,
    )
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.mst import (
        boruvka_msf,
    )

    boruvka_msf(
        knn_weighted_edges(E._t(spark, SF_ORACLE, "embeddings"), k=E.KNN_GRAPH_K),
        maximize=True,
        max_rounds=E.MST_ORACLE_ROUNDS,
        strict=True,
    ).count()
    # DAG layers: same fixed-round trick — the Spark side must reach its
    # fixed point within TOPO_ORACLE_ROUNDS at the compare scale (strict
    # raises otherwise, failing this test)
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.dag import (
        topological_layers,
    )

    topological_layers(
        E._graph(spark, SF_ORACLE).edges,
        max_rounds=E.TOPO_ORACLE_ROUNDS,
        strict=True,
    ).count()


def test_minhash_bucket_cap_never_binds_at_gate_scale(spark):
    """The LSH hot-bucket cap (functions/dedup.MINHASH_BUCKET_CAP) is not
    modeled by the DuckDB oracles of minhash_lsh_candidates /
    dedup_clusters / dedup_survivors / semantic-family queries: Spark
    drops oversized (band, bucket) keys, the oracle keeps them. That is
    the intended behavior at corpus scale, so this guard asserts the cap
    CANNOT bind at the compare scale — if testdata drift ever produces a
    bucket above the cap at sf0.01, fail here with a clear message instead
    of a silent driver hash mismatch (same discipline as the
    KCORE_ORACLE_ROUNDS guard above)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import dedup

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text")
    # same parameters as every oracle-checked minhash query (num_hashes=8,
    # bands=4, n=3)
    wide = dedup._minhash_sig_wide(d, 8, 3, "text", "doc_id")
    from pyspark.sql import functions as F

    rows = 8 // 4
    sizes = []
    for b in range(4):
        sig = F.md5(
            F.concat_ws(
                ",",
                *[F.col(f"_m{b * rows + j}").cast("string") for j in range(rows)],
            )
        )
        sizes.append(
            wide.groupBy(sig.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
    assert max(sizes) < dedup.MINHASH_BUCKET_CAP, (
        f"a (band, bucket) key holds {max(sizes)} docs at the compare scale "
        f">= MINHASH_BUCKET_CAP={dedup.MINHASH_BUCKET_CAP}: the capped Spark "
        "side would diverge from the uncapped oracles — raise the cap or "
        "model it in the oracle SQL"
    )


def test_window_queue_matches_coverage_ledger():
    """The 50-row driver window must match COVERAGE.md's rotation ledger
    (it drifted twice in r5 before this guard).  r12 composition: the
    two never-observed r11 post-window registrations first
    (`containment_dedup`, `graph_salsa` — VERDICT r11 ask #1, the
    r6 -> r7 precedent), the r12 registrations (held in
    __spark_entry_ext__.R12_NEW — the entry-file budget overflow), no
    anchor this round, the 14 protected family reps, and oldest-evidence
    rotation debt (the r6-band tail `dedup_eval`/`url_policy` then the
    r7/r8-observed keys in registration order) filling to 50.
    Everything past 50 is the r13 queue (displaced debt tail, then the
    r9-observed keys, the r10-observed keys, the r11-observed keys).
    The VERDICT r11 ask #1 contract needs >=28 debt keys in-window, so
    R12_NEW holds at most 6 keys (closed at 2 this round; the 2-key
    r6-band tail plus 30 r7/r8 keys drain — 32 total)."""
    order = list(E.queries())
    expected_window = (
        E._R12_NEVER_OBSERVED
        + E._R12_NEW
        + E._R12_ANCHORS
        + E._FAMILY_REPS
        + E._ROTATION_DEBT
    )[:50]
    assert order[:50] == expected_window
    assert E._R12_NEVER_OBSERVED == ["containment_dedup", "graph_salsa"]
    assert len(E._R12_NEW) <= 6
    assert E._R12_ANCHORS == []
    assert len(E._FAMILY_REPS) == 14 and E._FAMILY_REPS[-1] == "report_layout"
    # the r6-band tail heads the debt list, then the 72 r7/r8 keys
    assert len(E._ROTATION_DEBT) == 74
    assert E._ROTATION_DEBT[:2] == ["dedup_eval", "url_policy"]
    assert E._ROTATION_DEBT[2] == "ppr_power"
    assert E._ROTATION_DEBT[-1] == "graph_snapshot_diff"
    # >=28 rotation-debt keys must re-observe inside the 50-row window
    assert len(set(order[:50]) & set(E._ROTATION_DEBT)) >= 28
    # every registered query appears exactly once (priority list has no
    # typos/dups and nothing silently dropped from the registry); the
    # priority list is EXHAUSTIVE this round (no fall-through strays)
    assert len(set(order)) == len(order)
    assert set(E._WINDOW_PRIORITY) == set(order)
    # the ledger in COVERAGE.md must name the new-registration keys in
    # its r12 row
    ledger = (
        Path(__file__).resolve().parent.parent / "COVERAGE.md"
    ).read_text()
    r12_row = next(
        line for line in ledger.splitlines() if line.startswith("| r12 |")
    )
    for key in E._R12_NEVER_OBSERVED + E._R12_NEW + E._R12_ANCHORS:
        assert f"`{key}`" in r12_row, f"{key} missing from the COVERAGE r12 row"
    # the r13 row must name the head of the overflow queue
    r13_row = next(
        line for line in ledger.splitlines() if line.startswith("| r13 |")
    )
    for key in order[50:52]:
        assert f"`{key}`" in r13_row, f"{key} missing from the COVERAGE r13 row"
