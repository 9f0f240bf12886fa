"""Hypothesis property tests extending the r9/r10 oracle-builder fuzz
program (VERDICT r10 ask #7): the remaining heavy builders — k-truss
peeling, k-core peeling, 1-WL color refinement, FastRP embeddings — and
the winnowing + substring gram algebra at adversarial token lengths
(docs shorter than the gram width, exactly-boundary lengths, repeated
runs).  Each generated DuckDB oracle must equal an independent
pure-Python replay on random inputs — no Spark in the loop."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.slow

from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
    k_core_oracle_sql,
    k_truss_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions.substr_dedup import (
    _A as SUB_A,
    substring_dedup_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
    PRIME53,
    _WINNOW_A,
    _WINNOW_HASH_LIMIT,
    _WINNOW_POS_LIMIT,
    _WINNOW_POS_MASK,
    winnow_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.fastrp import (
    fastrp_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.wl import (
    WL_MIX,
    WL_MOD,
    WL_STEP,
    wl_oracle_sql,
)

N = 8

edge_lists = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=0,
    max_size=24,
).map(lambda es: sorted({(u, v) for u, v in es if u != v}))


def _con_edges(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE te(src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?,?)", edges)
    return con


# --- k-truss -----------------------------------------------------------------


def _py_triangle_support(und):
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    sup = {}
    for u, v in und:
        sup[(u, v)] = len(adj[u] & adj[v])
    return sup


def _py_ktruss(edges, k, rounds):
    und = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    for _ in range(rounds):
        sup = _py_triangle_support(und)
        und = [e for e in und if sup[e] >= k - 2]
    sup = _py_triangle_support(und)
    return sorted(
        (u, v, sup[(u, v)]) for u, v in und if sup[(u, v)] >= k - 2
    )


# k >= 3 is the builder's (and k-truss's) domain: at k = 2 the peel's
# inner support join drops triangle-free edges that "support >= 0" would
# keep — the entry key runs k = 3 and the definition needs k - 2 >= 1
@settings(max_examples=40, deadline=None)
@given(edges=edge_lists, k=st.integers(3, 4))
def test_ktruss_oracle_matches_python(edges, k):
    con = _con_edges(edges)
    got = sorted(
        con.execute(
            k_truss_oracle_sql("SELECT src, dst FROM te", k=k, rounds=4)
        ).fetchall()
    )
    assert got == _py_ktruss(edges, k, 4)
    con.close()


# --- k-core ------------------------------------------------------------------


def _py_kcore(edges, k, rounds):
    und = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    for _ in range(rounds):
        deg = {}
        for u, v in und:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        und = [(u, v) for u, v in und if u in keep and v in keep]
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return sorted(deg.items())


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists, k=st.integers(1, 4))
def test_kcore_oracle_matches_python(edges, k):
    con = _con_edges(edges)
    got = sorted(
        con.execute(
            k_core_oracle_sql("SELECT src, dst FROM te", k=k, rounds=8)
        ).fetchall()
    )
    assert got == _py_kcore(edges, k, 8)
    con.close()


# --- 1-WL color refinement -----------------------------------------------------


def _py_wl(edges, rounds):
    und = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    color = {}
    for a, _ in und:
        color[a] = color.get(a, 0) + 1
    color = {a: c % WL_MOD for a, c in color.items()}
    for _ in range(rounds):
        hsum = {}
        for a, b in und:
            hsum[a] = (
                hsum.get(a, 0) + color[b] % WL_MOD * WL_MIX % WL_MOD
            ) % WL_MOD
        color = {
            a: (color[a] * WL_STEP + hsum[a]) % WL_MOD for a in color
        }
    return sorted(color.items())


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists, rounds=st.integers(0, 3))
def test_wl_oracle_matches_python(edges, rounds):
    con = _con_edges(edges)
    got = sorted(
        con.execute(
            wl_oracle_sql("SELECT src, dst FROM te", rounds=rounds)
        ).fetchall()
    )
    assert got == _py_wl(edges, rounds)
    con.close()


# --- FastRP ---------------------------------------------------------------------

FRP_DIMS = 4
FRP_MOD = 8  # fastrp._MOD: the sparse-projection density knob


def _md5_48(payload: str) -> int:
    return int(hashlib.md5(payload.encode()).hexdigest()[:12], 16)


def _py_fastrp(edges, dims, iterations, weights, seed):
    und = sorted(
        {(u, v) for u, v in edges if u != v}
        | {(v, u) for u, v in edges if u != v}
    )
    nodes = sorted({u for u, _ in und})
    x = {}
    for nd in nodes:
        for d in range(dims):
            h = _md5_48(f"{nd}|{d}#{seed}") % FRP_MOD
            x[(nd, d)] = 1 if h == 0 else (-1 if h == 1 else 0)
    acc = {k2: 0 for k2 in x}
    cur = x
    for k_i in range(iterations):
        nxt = {}
        for u, v in und:
            for d in range(dims):
                nxt[(v, d)] = nxt.get((v, d), 0) + cur.get((u, d), 0)
        # nodes with no in-neighbor in und cannot happen (symmetrized),
        # but keep the zero default for clarity
        cur = {(nd, d): nxt.get((nd, d), 0) for nd in nodes for d in range(dims)}
        for key in acc:
            acc[key] += weights[k_i] * cur[key]
    out = []
    for nd in nodes:
        nv = math.sqrt(sum(acc[(nd, d)] ** 2 for d in range(dims)))
        for d in range(dims):
            out.append(
                (nd, d, round(acc[(nd, d)] / nv, 9) if nv > 0 else 0.0)
            )
    return sorted(out)


@settings(max_examples=30, deadline=None)
@given(edges=edge_lists)
def test_fastrp_oracle_matches_python(edges):
    con = _con_edges(edges)
    got = sorted(
        con.execute(
            fastrp_oracle_sql(
                "SELECT src, dst FROM te",
                dims=FRP_DIMS,
                iterations=2,
                weights=(1, 2),
                seed=0,
            )
        ).fetchall()
    )
    want = _py_fastrp(edges, FRP_DIMS, 2, (1, 2), 0)
    assert [(n, d) for n, d, _ in got] == [(n, d) for n, d, _ in want]
    for (gn, gd, gv), (_, _, wv) in zip(got, want):
        assert abs(gv - wv) <= 2e-9, (gn, gd, gv, wv)
    con.close()


# --- winnowing gram algebra at adversarial lengths ------------------------------

WK, WW = 4, 4  # the production constants (k-gram width, window width)

_tok = st.sampled_from(["a", "b", "c", "aa"])
_wdoc = st.lists(_tok, min_size=1, max_size=12).map(" ".join)


def _md5_28(tok: str) -> int:
    return int(hashlib.md5(f"{tok}#0".encode()).hexdigest()[:7], 16)


def _py_winnow(doc_rows, k, w):
    out = set()
    for doc_id, text in doc_rows:
        toks = text.strip().lower().split()
        th = [_md5_28(t) for t in toks]

        def horner(get):
            acc = get(0)
            for j in range(1, k):
                acc = (acc * _WINNOW_A + get(j)) % PRIME53
            return acc % _WINNOW_HASH_LIMIT

        if len(th) >= k:
            gs = [
                horner(lambda j, i=i: th[i + j])
                for i in range(len(th) - k + 1)
            ]
        else:
            pad = _md5_28("")
            gs = [horner(lambda j: th[j] if j < len(th) else pad)]
        ng = len(gs)
        packed = [
            gs[i] * _WINNOW_POS_LIMIT + (_WINNOW_POS_MASK - i)
            for i in range(min(ng, _WINNOW_POS_LIMIT))
        ]
        for pos in range(max(ng - w, 0) + 1):
            m = min(packed[pos : pos + w])
            out.add(
                (
                    doc_id,
                    _WINNOW_POS_MASK - (m % _WINNOW_POS_LIMIT),
                    m // _WINNOW_POS_LIMIT,
                )
            )
    return sorted(out)


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(_wdoc, min_size=1, max_size=4))
def test_winnow_oracle_adversarial_lengths(texts):
    rows = list(enumerate(texts))
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", rows)
    got = sorted(
        con.execute(
            winnow_oracle_sql("SELECT doc_id, text FROM d", k=WK, w=WW)
        ).fetchall()
    )
    assert got == _py_winnow(rows, WK, WW)
    con.close()


# --- substring (ExactSubstr) gram algebra ---------------------------------------

SN, SMIN_DOCS, SMIN_SPAN = 3, 2, 4


def _py_substr_spans(doc_rows, n, min_docs, min_span):
    grams = {}  # gh -> {doc_id}
    pos_by_doc = {}
    for doc_id, text in doc_rows:
        toks = text.strip().lower().split()
        if len(toks) < n:
            continue
        th = [_md5_28(t) for t in toks]
        for i in range(len(th) - n + 1):
            acc = th[i]
            for j in range(1, n):
                acc = (acc * SUB_A + th[i + j]) % PRIME53
            grams.setdefault(acc, set()).add(doc_id)
            pos_by_doc.setdefault(doc_id, []).append((i, acc))
    dup = {gh for gh, docs in grams.items() if len(docs) >= min_docs}
    out = []
    for doc_id, poss in pos_by_doc.items():
        cov = sorted(i for i, gh in poss if gh in dup)
        if not cov:
            continue
        spans = []
        start, end, cnt = cov[0], cov[0] + n, 1
        for p in cov[1:]:
            if p > end:
                spans.append((start, end, cnt))
                start, end, cnt = p, p + n, 1
            else:
                end, cnt = p + n, cnt + 1
        spans.append((start, end, cnt))
        for s, e, c in spans:
            if e - s >= min_span:
                out.append((doc_id, s, e, e - s, c))
    return sorted(out)


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
def test_substring_dedup_oracle_adversarial_lengths(texts):
    rows = [(i, t if t else "x") for i, t in enumerate(texts)]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", rows)
    got = sorted(
        con.execute(
            substring_dedup_oracle_sql(
                "SELECT doc_id, text FROM d",
                n=SN,
                min_docs=SMIN_DOCS,
                min_span=SMIN_SPAN,
            )
        ).fetchall()
    )
    assert got == _py_substr_spans(rows, SN, SMIN_DOCS, SMIN_SPAN)
    con.close()


# --- eigenvector + ArticleRank (beyond ask #7 — remaining cheap builders) -----


def _py_eigenvector(edges, iterations):
    und = sorted(
        {(u, v) for u, v in edges if u != v}
        | {(v, u) for u, v in edges if u != v}
    )
    nodes = sorted({u for u, _ in und} | {v for _, v in und})
    score = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        nxt = dict(score)  # the +identity term (shifted power iteration)
        for u, v in und:
            nxt[v] = nxt.get(v, 0.0) + score[u]
        score = nxt
    nv = math.sqrt(sum(s * s for s in score.values()))
    return sorted((n, round(s / nv, 9)) for n, s in score.items())


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists, iters=st.integers(1, 6))
def test_eigenvector_oracle_matches_python(edges, iters):
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.eigenvector import (
        eigenvector_oracle_sql,
    )

    if not edges:
        return  # empty graph: the normalization divides by zero upstream
    con = _con_edges(edges)
    got = sorted(
        con.execute(
            eigenvector_oracle_sql("SELECT src, dst FROM te", iterations=iters)
        ).fetchall()
    )
    want = _py_eigenvector(edges, iters)
    assert [n for n, _ in got] == [n for n, _ in want]
    for (gn, gv), (_, wv) in zip(got, want):
        assert abs(gv - wv) <= 2e-9, (gn, gv, wv)
    con.close()


def _py_articlerank(edges, nodes, iterations, alpha):
    d = 1.0 - alpha
    od = {}
    for u, _ in edges:
        od[u] = od.get(u, 0) + 1
    n = float(len(nodes))
    avg = len(edges) / n
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        nxt = {v: alpha / n for v in nodes}
        for u, v in edges:
            # only nodes holding rank contribute; sources outside the
            # node table cannot occur (edges reference registered ids)
            nxt[v] = nxt.get(v, 0.0) + d * rank.get(u, 0.0) / (od[u] + avg)
        rank = nxt
    return sorted((v, round(r, 9)) for v, r in rank.items())


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists, iters=st.integers(1, 5))
def test_articlerank_oracle_matches_python(edges, iters):
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.pagerank import (
        article_rank_oracle_sql,
    )

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges} | {0})
    con = _con_edges(edges)
    con.execute("CREATE TABLE n(id BIGINT)")
    con.executemany("INSERT INTO n VALUES (?)", [(x,) for x in nodes])
    got = sorted(
        con.execute(
            article_rank_oracle_sql(
                "SELECT src, dst FROM te",
                "SELECT id FROM n",
                iterations=iters,
                alpha=1.0 / 7.0,
            )
        ).fetchall()
    )
    want = _py_articlerank(edges, nodes, iters, 1.0 / 7.0)
    assert [n for n, _ in got] == [n for n, _ in want]
    for (gn, gv), (_, wv) in zip(got, want):
        assert abs(gv - wv) <= 2e-9, (gn, gv, wv)
    con.close()
