"""GOT end-to-end parity report (VERDICT r11 ask #6): the full
`algo_perf_batch_test` on the actual GOT CSVs (107 nodes / 352 edges),
asserting the report layout equals Gen_Util.java:139-247's column set,
the published quality floors hold (Precision >= 0.65, NDCG >= 0.955 at
the tight sweep endpoints — dissertation §5.4), the MaxErr ordering
BASE < FORA < FWP/MC holds at matched params, and the quality-metric
columns match the committed fixture artifacts row for row — timings
excluded, they are machine-dependent.

Two fixtures, because GOT_Rels.csv is strictly DIRECTED (352 edges, zero
reverse pairs — verified) and backward search is only sound against the
dangling-to-source forward oracle on undirected graphs (dissertation
4.1.3, FIXTURES.md F3):

- tests/fixtures/got_report.csv — the DIRECTED run, the reference's own
  traversal semantics (Backward_Search.java uses Direction.INCOMING on
  whatever graph is loaded).  Precision/NDCG floors hold here; BASE's
  MaxErr is structurally ~0.37 at EVERY threshold (the backward linear
  system solves the pure chain while the forward oracle routes dangling
  mass back to the source — GOT has many out-degree-0 nodes), which this
  suite pins as a property rather than hiding.
- tests/fixtures/got_report_undirected.csv — the symmetrized (F3) run,
  BASE's soundness domain, where the published ordering BASE < FORA <
  FWP/MC at matched params is asserted.

Regenerate both after an intentional algorithm change with:
    python -m tests.test_got_report
"""

from __future__ import annotations

import csv
from pathlib import Path

import pytest
from pyspark.sql import functions as F

import personalized_pagerank_algorithms_on_neo4j_spark as P
from personalized_pagerank_algorithms_on_neo4j_spark import bench_driver
from personalized_pagerank_algorithms_on_neo4j_spark.sources.report import (
    REPORT_COLUMNS,
    read_report,
)

pytestmark = pytest.mark.slow

FIXDIR = Path(__file__).parent / "fixtures"
FIXTURE_DIR = FIXDIR / "got_report.csv"
FIXTURE_UND = FIXDIR / "got_report_undirected.csv"
QUERY_NUM = 12  # sources sampled with replacement (Gen_Util.java:99-107)
K = 10
SWEEP_POINTS = 2  # each sweep's loose + tight endpoint

# the stable (machine-independent) report columns the fixtures pin;
# avg_ms / prep_ms / prep_bytes / run_ts are timing- or layout-dependent
STABLE = ["suite", "algo", "param", "k", "avg_precision", "avg_ndcg", "avg_max_err"]


def _stable_rows(rows: list[dict]) -> list[dict]:
    out = []
    for r in rows:
        out.append(
            {
                c: ("" if r.get(c) is None else f"{r[c]:.9f}"
                    if isinstance(r.get(c), float) else str(r[c]))
                for c in STABLE
            }
        )
    return out


def _symmetrized(spark, got):
    e = got.edges
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return P.PropertyGraph(spark, got.nodes, sym)


@pytest.fixture(scope="module")
def got_report(got, tmp_path_factory):
    """One full three-suite DIRECTED run; the report sink exercises S6."""
    path = str(tmp_path_factory.mktemp("got_report") / "report")
    rows = bench_driver.algo_perf_batch_test(
        got, query_num=QUERY_NUM, k=K, report_path=path,
        sweep_points=SWEEP_POINTS, seed=42,
    )
    return rows, path


@pytest.fixture(scope="module")
def got_report_und(spark, got):
    """The symmetrized (F3) run — BASE's soundness domain."""
    return bench_driver.algo_perf_batch_test(
        _symmetrized(spark, got), query_num=QUERY_NUM, k=K,
        sweep_points=SWEEP_POINTS, seed=42,
    )


def test_report_layout_matches_reference(spark, got_report):
    """The persisted report carries exactly Gen_Util.java:139-247's
    column set (FIXTURES.md F8 layout): run_ts + suite/algo/param/k +
    prep/timing + the three quality metrics."""
    _, path = got_report
    back = read_report(spark, path)
    assert back.columns == REPORT_COLUMNS
    assert back.count() > 0


def test_published_quality_floors_directed(got_report):
    """Dissertation §5.4 floors on the DIRECTED GOT graph at the TIGHT
    sweep endpoints: Precision@10 >= 0.65 and NDCG@10 >= 0.955 for every
    top-k algorithm."""
    rows, _ = got_report
    topk = [r for r in rows if r["suite"] == "topk"]
    tight = {}
    for r in topk:
        a = r["algo"]
        sweep = bench_driver.SWEEPS.get(a, bench_driver.SWEEPS["fora"])
        if r["param"] == float(sweep[-1]):
            tight[a] = r
    assert set(tight) == {"fwdpush", "montecarlo", "fora_topk", "pagerank"}
    for a, r in tight.items():
        assert r["avg_precision"] >= 0.65, (a, r)
        assert r["avg_ndcg"] >= 0.955, (a, r)


def test_directed_base_unsoundness_is_structural(got_report):
    """On the directed graph BASE's MaxErr is threshold-INDEPENDENT (the
    error is the dangling-rule model mismatch, not push truncation): both
    sweep endpoints produce the identical ~0.37, far above every
    forward-family tight endpoint.  Pinning this stops the mismatch from
    ever being misread as a BASE implementation bug."""
    rows, _ = got_report
    base = [
        r["avg_max_err"] for r in rows
        if r["suite"] == "preprocessing" and r["algo"] == "base"
    ]
    assert len(base) == SWEEP_POINTS
    assert abs(base[0] - base[1]) < 1e-12  # identical at every threshold
    assert base[0] > 0.1  # structural, not truncation noise
    fwd_tight = [
        r["avg_max_err"] for r in rows
        if r["suite"] == "whole_graph"
        and r["param"] == float(bench_driver.SWEEPS[r["algo"]][-1])
    ]
    assert base[0] > 100 * max(fwd_tight)


def test_published_maxerr_ordering_undirected(got_report_und):
    """On the symmetrized (F3) graph — backward search's soundness
    domain — the published ordering holds at matched params:
    BASE(5e-7) < FORA(0.05) < MC(0.05), and BASE(5e-7) < FWP at its
    LOOSE endpoint (1e-4; the tight 1e-8 fwdpush is a near-exact solve
    the dissertation's FWP operating point does not use)."""
    rows = got_report_und
    base_tight = min(
        r["avg_max_err"] for r in rows
        if r["suite"] == "preprocessing" and r["algo"] == "base"
    )
    wg = {
        (r["algo"], r["param"]): r["avg_max_err"]
        for r in rows if r["suite"] == "whole_graph"
    }
    assert base_tight < wg[("fora", 0.05)], (base_tight, wg)
    assert wg[("fora", 0.05)] < wg[("montecarlo", 0.05)], wg
    assert base_tight < wg[("fwdpush", 1e-4)], (base_tight, wg)
    # floors hold on the undirected run too
    for r in rows:
        if r["suite"] == "topk":
            a = r["algo"]
            sweep = bench_driver.SWEEPS.get(a, bench_driver.SWEEPS["fora"])
            if r["param"] == float(sweep[-1]):
                assert r["avg_precision"] >= 0.65, r
                assert r["avg_ndcg"] >= 0.955, r


def test_report_matches_committed_fixtures(got_report, got_report_und):
    """The quality-metric columns are deterministic (seeded sampling,
    seeded walks) — both regenerated reports must equal the committed
    artifacts row for row."""
    rows, _ = got_report
    for rows_i, fixture in ((rows, FIXTURE_DIR), (got_report_und, FIXTURE_UND)):
        got = _stable_rows(rows_i)
        with fixture.open() as f:
            want = list(csv.DictReader(f))
        assert got == want, (
            f"GOT report drifted from {fixture.name}; if intentional "
            "regenerate with: python -m tests.test_got_report"
        )


def _regenerate():  # pragma: no cover — manual fixture refresh
    spark = P.build_spark(master="local[8]", shuffle_partitions=8)
    got = P.load_csv_graph(
        spark,
        "/root/reference/dataset/got/GOT_Nodes.csv",
        "/root/reference/dataset/got/GOT_Rels.csv",
    )
    FIXDIR.mkdir(parents=True, exist_ok=True)
    for graph, fixture in (
        (got, FIXTURE_DIR),
        (_symmetrized(spark, got), FIXTURE_UND),
    ):
        rows = bench_driver.algo_perf_batch_test(
            graph, query_num=QUERY_NUM, k=K, sweep_points=SWEEP_POINTS,
            seed=42,
        )
        with fixture.open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=STABLE)
            w.writeheader()
            w.writerows(_stable_rows(rows))
        print(f"wrote {fixture} ({len(rows)} rows)")
        for r in _stable_rows(rows):
            print(r)


if __name__ == "__main__":  # pragma: no cover
    _regenerate()
