"""Exact substring dedup with removal spans (functions/substr_dedup):
known-fixture parity, structural span invariants, a Hypothesis fuzz of
the DuckDB oracle builder against a pure-Python replay, and the plan
guard."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions.substr_dedup import (
    _A,
    substring_dedup_oracle_sql,
    substring_dedup_spans,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import PRIME53


def _py_spans(docs, n, min_docs, min_span):
    """Pure-Python replay: identical md5 token hashes, Horner gram
    hashes, cross-doc duplicate grams, islands-and-gaps span merge."""

    def tok_hash(t):
        return int(hashlib.md5(f"{t}#0".encode()).hexdigest()[:7], 16)

    grams = {}  # doc_id -> [(pos, gh)]
    for doc_id, toks in docs:
        toks = [t.lower() for t in toks]
        if len(toks) < n:
            grams[doc_id] = []
            continue
        th = [tok_hash(t) for t in toks]
        out = []
        for i in range(len(th) - n + 1):
            acc = th[i]
            for j in range(1, n):
                acc = (acc * _A + th[i + j]) % PRIME53
            out.append((i, acc))
        grams[doc_id] = out
    docs_per_gh = {}
    for doc_id, g in grams.items():
        for _, gh in g:
            docs_per_gh.setdefault(gh, set()).add(doc_id)
    dup = {gh for gh, d in docs_per_gh.items() if len(d) >= min_docs}
    spans = []
    for doc_id, g in grams.items():
        pos = sorted(p for p, gh in g if gh in dup)
        if not pos:
            continue
        start, end, cnt = pos[0], pos[0] + n, 1
        for p in pos[1:]:
            if p > end:
                if end - start >= min_span:
                    spans.append((doc_id, start, end, end - start, cnt))
                start, end, cnt = p, p + n, 1
            else:
                end, cnt = p + n, cnt + 1
        if end - start >= min_span:
            spans.append((doc_id, start, end, end - start, cnt))
    return sorted(spans)


def test_known_fixture_spans(spark):
    """Two documents sharing one long run + one short run: the long run
    becomes a removal span in BOTH docs at its own positions, the short
    run is invisible at gram granularity."""
    shared = "alpha beta gamma delta epsilon zeta".split()  # 6 tokens
    a = ["x1", "x2"] + shared + ["x3"]
    b = ["y1"] + shared + ["y2", "y3", "y4"]
    c = ["z%d" % i for i in range(10)]  # no duplication
    docs = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(c))],
        "doc_id long, text string",
    )
    got = sorted(
        map(
            tuple,
            substring_dedup_spans(
                docs, n=4, min_docs=2, min_span=5
            ).collect(),
        )
    )
    # shared 6-token run -> 3 grams of 4 tokens, one island of 6 tokens:
    # doc 0 at positions [2, 8), doc 1 at [1, 7)
    assert got == [(0, 2, 8, 6, 3), (1, 1, 7, 6, 3)]


def test_all_copies_flagged_and_min_span(spark):
    """Every duplicated copy is flagged (including 3-way sharing) and
    sub-min_span islands are dropped."""
    run = "p q r s".split()
    docs = spark.createDataFrame(
        [
            (0, " ".join(["a0", "a1"] + run)),
            (1, " ".join(run + ["b0", "b1"])),
            (2, " ".join(["c0"] + run + ["c1"])),
        ],
        "doc_id long, text string",
    )
    got = substring_dedup_spans(docs, n=4, min_docs=2, min_span=4)
    assert sorted(r.doc_id for r in got.collect()) == [0, 1, 2]
    # raising min_span past the island width drops everything
    assert (
        substring_dedup_spans(docs, n=4, min_docs=2, min_span=5).count() == 0
    )


def test_spans_disjoint_with_gaps(spark):
    """Islands are MAXIMAL: per doc, spans are disjoint and separated by
    at least one uncovered token (adjacent islands would have merged)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    rows = (
        substring_dedup_spans(docs, n=8, min_docs=2, min_span=8)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    assert rows, "fixture must contain injected duplicated substrings"
    prev = {}
    for r in rows:
        assert r.span_end - r.span_start == r.span_tokens >= 8
        if r.doc_id in prev:
            assert r.span_start > prev[r.doc_id]  # strict gap
        prev[r.doc_id] = r.span_end


def test_plan_shape(spark):
    """No cartesian product, no Python in the plan, bounded exchanges:
    postings agg + semi join + doc windows only."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    plan = (
        substring_dedup_spans(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    n = plan.count("Exchange")
    assert n <= 8, f"substring_dedup_spans: {n} exchanges > 8"


# --- oracle-builder fuzz: DuckDB replay vs pure Python ---------------------

token = st.sampled_from(["a", "b", "c", "d", "ee"])
corpus = st.lists(
    st.lists(token, min_size=0, max_size=14), min_size=0, max_size=6
)


@settings(max_examples=60, deadline=None)
@given(docs=corpus)
def test_oracle_matches_python_replay(docs):
    docs = list(enumerate(docs))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    if docs:
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            [(i, " ".join(toks)) for i, toks in docs],
        )
    got = sorted(
        map(
            tuple,
            con.execute(
                substring_dedup_oracle_sql(n=3, min_docs=2, min_span=4)
            ).fetchall(),
        )
    )
    assert got == _py_spans(docs, n=3, min_docs=2, min_span=4)
    con.close()


def test_contamination_spans_cross_corpus_only(spark):
    """Contamination spans flag TRAIN intervals covered by BENCH grams —
    duplication purely inside the training corpus must NOT flag, and the
    flagged span is exactly the leaked run."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.substr_dedup import (
        substring_contamination_spans,
    )

    leak = "alpha beta gamma delta epsilon".split()  # 5 tokens
    intra = "q1 q2 q3 q4 q5".split()  # duplicated only within train
    train = spark.createDataFrame(
        [
            (0, " ".join(["t0"] + leak + ["t1"])),
            (1, " ".join(intra + ["x0"])),
            (2, " ".join(["y0"] + intra)),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(["b0", "b1"] + leak + ["b2"]))],
        "doc_id long, text string",
    )
    got = sorted(
        map(
            tuple,
            substring_contamination_spans(
                train, bench, n=4, min_span=4
            ).collect(),
        )
    )
    # leak = 5 tokens -> 2 grams of 4, one island [1, 6) in doc 0 only
    assert got == [(0, 1, 6, 5, 2)]


bench_corpus = st.lists(
    st.lists(token, min_size=0, max_size=10), min_size=0, max_size=3
)


@settings(max_examples=40, deadline=None)
@given(train=corpus, bench=bench_corpus)
def test_contamination_oracle_matches_python_replay(train, bench):
    """The cross-corpus oracle = the self-dedup replay with the dup-gram
    set swapped for the bench gram set."""
    import hashlib as _h

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.substr_dedup import (
        substring_contamination_oracle_sql,
    )

    n, min_span = 3, 4

    def tok_hash(t):
        return int(_h.md5(f"{t}#0".encode()).hexdigest()[:7], 16)

    def grams(toks):
        toks = [t.lower() for t in toks]
        if len(toks) < n:
            return []
        th = [tok_hash(t) for t in toks]
        out = []
        for i in range(len(th) - n + 1):
            acc = th[i]
            for j in range(1, n):
                acc = (acc * _A + th[i + j]) % PRIME53
            out.append((i, acc))
        return out

    bench_ghs = {gh for toks in bench for _, gh in grams(toks)}
    want = []
    for doc_id, toks in enumerate(train):
        pos = sorted(p for p, gh in grams(toks) if gh in bench_ghs)
        if not pos:
            continue
        start, end, cnt = pos[0], pos[0] + n, 1
        for p in pos[1:]:
            if p > end:
                if end - start >= min_span:
                    want.append((doc_id, start, end, end - start, cnt))
                start, end, cnt = p, p + n, 1
            else:
                end, cnt = p + n, cnt + 1
        if end - start >= min_span:
            want.append((doc_id, start, end, end - start, cnt))

    con = duckdb.connect()
    con.execute("CREATE TABLE tr(doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE be(doc_id BIGINT, text VARCHAR)")
    if train:
        con.executemany(
            "INSERT INTO tr VALUES (?,?)",
            [(i, " ".join(t)) for i, t in enumerate(train)],
        )
    if bench:
        con.executemany(
            "INSERT INTO be VALUES (?,?)",
            [(100 + i, " ".join(t)) for i, t in enumerate(bench)],
        )
    got = sorted(
        map(
            tuple,
            con.execute(
                substring_contamination_oracle_sql(
                    "SELECT doc_id, text FROM tr",
                    "SELECT doc_id, text FROM be",
                    n=n,
                    min_span=min_span,
                )
            ).fetchall(),
        )
    )
    assert got == sorted(want)
    con.close()
