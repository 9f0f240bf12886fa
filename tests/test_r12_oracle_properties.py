"""Hypothesis property tests extending the r9-r11 oracle-builder fuzz
program (VERDICT r11 ask #7): the `graph_anf` SUMMARY algebra over the
HyperBall registers (the registers themselves are covered by
test_r10_oracle_properties.test_hyperball_oracle_matches_python — this
isolates the new aggregate layer), the `zorder_manifest` bounds algebra,
and the `corpus_pipeline` six-stage composition.  Each generated DuckDB
oracle must equal an independent pure-Python replay on random inputs —
no Spark in the loop."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.slow

import __spark_entry__ as E

from personalized_pagerank_algorithms_on_neo4j_spark.functions.corpus import (
    corpus_pipeline_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions.sampling import (
    BUCKETS,
    sampling_oracle_fragments,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions.sharding import (
    zorder_manifest_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
    LANG_STOPWORDS,
    PRIME53,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.hyperball import (
    hyperball_oracle_sql,
)


def _ph(x, seed=0):
    return int(hashlib.md5(f"{x}#{seed}".encode()).hexdigest()[:12], 16)


def _round6(x: float) -> float:
    """DuckDB ROUND(x, 6): half away from zero (python round is banker's)."""
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


# ---------------------------------------------------------------------------
# graph_anf: the summary aggregate over the HyperBall per-node estimates
# ---------------------------------------------------------------------------

N = 8
edge_lists = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=0,
    max_size=24,
).map(lambda es: sorted({(u, v) for u, v in es if u != v}))

ANF_RADIUS = 3
ANF_P = 4


def _anf_wrapper_sql(hb_sql: str) -> str:
    """The exact graph_anf summary layer from __spark_entry_ext__.register."""
    return f"""
WITH anf_hb AS (
{hb_sql}
)
SELECT radius, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(CAST(ROUND(approx_ball * 10000) AS BIGINT)) AS BIGINT)
         AS reach_x1e4,
       ROUND(CAST(SUM(CAST(ROUND(approx_ball * 10000) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 10000.0, 6) AS avg_ball
FROM anf_hb GROUP BY radius
"""


@settings(max_examples=25, deadline=None)
@given(edges=edge_lists)
def test_anf_summary_matches_python_fold(edges):
    """The graph_anf wrapper must equal a python fold of the SAME
    per-node HyperBall estimates — isolating the summary algebra (the
    register estimator has its own r10 replay property)."""
    nodes = sorted({x for e in edges for x in e}) or [0]
    con = duckdb.connect()
    con.execute("CREATE TABLE te(src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?,?)", edges)
    con.execute("CREATE TABLE n(id BIGINT)")
    con.executemany("INSERT INTO n VALUES (?)", [(x,) for x in nodes])
    hb = hyperball_oracle_sql(
        "SELECT id, CAST(id AS VARCHAR) AS name FROM n",
        "SELECT src, dst FROM te",
        radius=ANF_RADIUS,
        p=ANF_P,
    )
    per_node = con.execute(hb).fetchall()  # (radius, node, approx_ball)
    got = {
        int(r): (int(nn), int(reach), ab)
        for r, nn, reach, ab in con.execute(_anf_wrapper_sql(hb)).fetchall()
    }
    want: dict[int, list[int]] = {}
    for r, _, ball in per_node:
        want.setdefault(int(r), []).append(
            int(math.floor(abs(ball) * 10000 + 0.5))
        )
    assert set(got) == set(want)
    for r, vals in want.items():
        n_nodes, reach, avg = got[r]
        assert n_nodes == len(vals)
        assert reach == sum(vals)
        assert abs(avg - _round6(sum(vals) / len(vals) / 10000.0)) <= 1e-9
    con.close()


# ---------------------------------------------------------------------------
# zorder_manifest: Morton scale/interleave/shard + per-shard min/max bounds
# ---------------------------------------------------------------------------

ZO_BITS = 6
ZO_SHARDS = 5  # non-power-of-two: exercises the LEAST clamp on max zkey

zo_rows = st.lists(
    st.tuples(
        st.integers(-50, 50),   # a (negative ranges exercised)
        st.integers(0, 9_999),  # b (wide range)
    ),
    min_size=1,
    max_size=30,
)


def _py_zorder_manifest(rows, bits, n_shards):
    top = (1 << bits) - 1
    alo, ahi = min(a for a, _ in rows), max(a for a, _ in rows)
    blo, bhi = min(b for _, b in rows), max(b for _, b in rows)

    def scale(x, lo, hi):
        rng = hi - lo if hi > lo else 1
        # DuckDB // on ints is floor division — python // matches
        return ((x - lo) * top) // rng

    span = (1 << (2 * bits)) // n_shards or 1
    out = {}
    for i, (a, b) in enumerate(rows):
        sa, sb = scale(a, alo, ahi), scale(b, blo, bhi)
        zk = 0
        for j in range(bits):
            zk += ((sa >> j) & 1) << (2 * j)
            zk += ((sb >> j) & 1) << (2 * j + 1)
        shard = min(zk // span, n_shards - 1)
        st_ = out.setdefault(shard, [0, a, a, b, b])
        st_[0] += 1
        st_[1], st_[2] = min(st_[1], a), max(st_[2], a)
        st_[3], st_[4] = min(st_[3], b), max(st_[4], b)
    return {s: tuple(v) for s, v in out.items()}


@settings(max_examples=50, deadline=None)
@given(rows=zo_rows)
def test_zorder_manifest_matches_python(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE zt(id BIGINT, a BIGINT, b BIGINT)")
    con.executemany(
        "INSERT INTO zt VALUES (?,?,?)",
        [(i, a, b) for i, (a, b) in enumerate(rows)],
    )
    got = {
        int(s): (int(n), int(amn), int(amx), int(bmn), int(bmx))
        for s, n, amn, amx, bmn, bmx in con.execute(
            zorder_manifest_oracle_sql(
                "SELECT id, a, b FROM zt", "a", "b", "id",
                n_shards=ZO_SHARDS, bits=ZO_BITS,
            )
        ).fetchall()
    }
    want = _py_zorder_manifest(rows, ZO_BITS, ZO_SHARDS)
    assert got == want
    con.close()


# ---------------------------------------------------------------------------
# corpus_pipeline: the full six-stage composition replayed in pure Python
# ---------------------------------------------------------------------------

# word pool: en-stopword-heavy (so the language gate passes often), with
# foreign stopwords, fillers, and punctuation tokens to vary quality/lang
_WORDS = (
    LANG_STOPWORDS["en"] * 3
    + LANG_STOPWORDS["de"]
    + LANG_STOPWORDS["es"]
    + ["cat", "dog", "tree", "banana", "zzz", "!!!", "a?b", "run"]
)

CPF_MIN_Q = 0.3
CPF_DECON_MAX = 0.3
CPF_MIX_BUDGET = 30
CPF_PACK_BUDGET = 8
CPF_BUCKETS = 2
CPF_STEPS = 6
CPF_SEED = 7

doc_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


def _toks_raw(text):
    return re.split(" +", text.strip())


def _normalized(text):
    return re.sub(r"\s+", " ", text.lower())


def _shingles(text, n=3):
    toks = [t for t in _toks_raw(_normalized(text).strip())]
    out = []
    for i in range(0, max(len(toks) - n, 0) + 1):
        s = " ".join(toks[i : i + n])
        if s and s not in out:
            out.append(s)
    return out


def _quality_raw(text):
    len_score = min(len(text) / 500.0, 1.0)
    toks_l = _toks_raw(text.strip().lower())
    sw = sum(1 for t in toks_l if t in LANG_STOPWORDS["en"]) / max(
        len(toks_l), 1
    )
    punct = (len(text) - len(re.sub(r"[^\w\s]", "", text))) / max(
        len(text), 1
    )
    return (
        len_score * 0.4
        + min(sw * 4.0, 1.0) * 0.4
        + (1.0 - min(punct * 2.0, 1.0)) * 0.2
    )


def _lang_pred(text):
    toks_l = _toks_raw(text.strip().lower())
    n = max(len(toks_l), 1)
    scores = {
        lg: sum(1 for t in toks_l if t in ws) / n
        for lg, ws in sorted(LANG_STOPWORDS.items())
    }
    mx = max(scores.values())
    for lg in sorted(scores):  # CASE order = sorted langs, first hit wins
        if scores[lg] > 0.0 and scores[lg] == mx:
            return lg
    return "unknown"


def _py_corpus_pipeline(docs, bench_texts):
    """docs: [(doc_id, source, text)] (corpus only).  Returns the pack
    summary {(bucket, pack): (n_docs, pack_tokens, first_doc, last_doc)}."""
    # stage 1: quality + language gate
    q = [
        (i, s, t)
        for i, s, t in docs
        if _lang_pred(t) == "en" and _round6(_quality_raw(t)) >= CPF_MIN_Q
    ]
    # stage 2: exact dedup (min id per normalized md5 group)
    byh: dict[str, int] = {}
    for i, _, t in q:
        h = hashlib.md5(_normalized(t).encode()).hexdigest()
        byh[h] = min(byh.get(h, i), i)
    exact = [
        (i, s, t)
        for i, s, t in q
        if byh[hashlib.md5(_normalized(t).encode()).hexdigest()] == i
    ]
    # stage 3: minhash LSH -> clusters -> survivor election
    sigs: dict[int, list[int]] = {}
    for i, _, t in exact:
        shs = _shingles(t)
        if not shs:
            continue
        sig = []
        for k in range(8):
            sig.append(
                min(
                    ((1000 * k + 12289) * _ph(sh, 0) + k * _ph(sh, 1))
                    % PRIME53
                    for sh in shs
                )
            )
        sigs[i] = sig
    banded: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        for band in range(4):
            key = hashlib.md5(
                ",".join(str(sig[band * 2 + j]) for j in range(2)).encode()
            ).hexdigest()
            banded.setdefault((band, key), []).append(i)
    cand = set()
    for members in banded.values():
        for a in members:
            for b in members:
                if a < b:
                    cand.add((a, b))
    und: dict[int, set[int]] = {}
    for a, b in cand:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    labels = {v: v for v in und}
    for _ in range(CPF_STEPS):
        nxt = dict(labels)
        for v, nbrs in und.items():
            for u in nbrs:
                if labels[u] < nxt[v]:
                    nxt[v] = labels[u]
        labels = nxt
    tlen = {i: len(t) for i, _, t in exact}
    clusters: dict[int, list[int]] = {}
    for v, lab in labels.items():
        clusters.setdefault(lab, []).append(v)
    dropped = set()
    for members in clusters.values():
        surv = sorted(members, key=lambda v: (-tlen[v], v))[0]
        dropped.update(m for m in members if m != surv)
    near = [(i, s, t) for i, s, t in exact if i not in dropped]
    # stage 4: decontamination
    bench_sh = set()
    for t in bench_texts:
        bench_sh.update(_shingles(t))
    kept = []
    for i, s, t in near:
        shs = _shingles(t)
        if shs:
            cont = _round6(
                sum(1 for sh in shs if sh in bench_sh) / len(shs)
            )
            if cont > CPF_DECON_MAX:
                continue
        kept.append((i, s, t))
    # stage 5: token-budget mixture (per-source greedy prefix)
    by_src: dict[str, list] = {}
    for i, s, t in kept:
        by_src.setdefault(s, []).append((i, t))
    mix = []  # (doc_id, n_tok)
    for s, rows in by_src.items():
        rows.sort(key=lambda r: (-_quality_raw(r[1]), r[0]))
        cum = 0
        for i, t in rows:
            n_tok = len(_toks_raw(t))
            cum += n_tok
            if cum <= CPF_MIX_BUDGET:
                mix.append((i, n_tok))
    # stage 6: packing + summary
    by_bucket: dict[int, list] = {}
    for i, n_tok in mix:
        by_bucket.setdefault(
            (_ph(i, CPF_SEED) % BUCKETS) % CPF_BUCKETS, []
        ).append((i, n_tok))
    out: dict[tuple[int, int], list] = {}
    for bucket, rows in by_bucket.items():
        rows.sort()
        cum = 0
        for i, n_tok in rows:
            pack = cum // CPF_PACK_BUDGET
            row = out.setdefault((bucket, pack), [0, 0, i, i])
            row[0] += 1
            row[1] += n_tok
            row[2], row[3] = min(row[2], i), max(row[3], i)
            cum += n_tok
    return {k: tuple(v) for k, v in out.items()}


@settings(max_examples=25, deadline=None)
@given(texts=doc_texts, bench_pick=st.integers(0, 4))
def test_corpus_pipeline_oracle_matches_python(texts, bench_pick):
    """The six-stage composition oracle equals a pure-Python replay of
    quality gate, exact dedup, minhash-LSH survivorship, decon, mixture,
    and packing — including md5/minhash bit algebra and tie rules."""
    docs = [(i, f"s{i % 2}", t) for i, t in enumerate(texts)]
    # benchmark = one corpus text re-used (overlap guaranteed) when it
    # exists, plus a fixed foreign sentence
    bench_texts = ["der hund und die katze"]
    if len(texts) > bench_pick:
        bench_texts.append(texts[bench_pick])
    con = duckdb.connect()
    con.execute("CREATE TABLE cdocs(doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO cdocs VALUES (?,?,?)", docs)
    con.executemany(
        "INSERT INTO cdocs VALUES (?,?,?)",
        [(1000 + j, "bench", t) for j, t in enumerate(bench_texts)],
    )
    lang_scores = {lg: E._sql_sw_raw(lg) for lg in sorted(LANG_STOPWORDS)}
    sql = corpus_pipeline_oracle_sql(
        "SELECT doc_id, source, text FROM cdocs WHERE source <> 'bench'",
        "SELECT doc_id, source, text FROM cdocs WHERE source = 'bench'",
        shingles_expr=E._SQL_SHINGLES,
        sql_hash=E._sql_hash,
        quality_raw_expr=E._sql_quality_raw(
            E._SQL_LEN_SCORE, lang_scores["en"], E._SQL_PUNCT_RAW
        ),
        lang_scores=lang_scores,
        lang="en",
        cluster_chain=E._cluster_chain,
        bucket_expr=(
            f"({sampling_oracle_fragments(CPF_SEED, 'doc_id')})"
            f" % {CPF_BUCKETS}"
        ),
        min_quality=CPF_MIN_Q,
        cluster_steps=CPF_STEPS,
        decon_max=CPF_DECON_MAX,
        mix_budget=CPF_MIX_BUDGET,
        pack_budget=CPF_PACK_BUDGET,
    )
    got = {
        (int(b), int(p)): (int(n), int(tok), int(fd), int(ld))
        for b, p, n, tok, fd, ld in con.execute(sql).fetchall()
    }
    want = _py_corpus_pipeline(docs, bench_texts)
    assert got == want
    con.close()


# ---------------------------------------------------------------------------
# ppr_nibble: the sweep algebra (incremental cut identity) vs brute force
# ---------------------------------------------------------------------------

from personalized_pagerank_algorithms_on_neo4j_spark.operators.nibble import (  # noqa: E402
    ppr_nibble_oracle_sql,
)

NB_STEPS = 60  # far past convergence on 8-node graphs at rmax 1e-3


@settings(max_examples=30, deadline=None)
@given(edges=edge_lists, seed=st.integers(0, N - 1))
def test_nibble_sweep_matches_bruteforce(edges, seed):
    """For every sweep prefix the oracle's (cut, vol, phi) must equal a
    BRUTE-FORCE recount over the symmetrized graph given the oracle's own
    ranking — validating the incremental cut identity
    cut(S+v) = cut(S) + deg(v) - 2*e(v,S) independently, plus the
    min-conductance election (ties to the smallest prefix)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE te(src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?,?)", edges)
    sql = ppr_nibble_oracle_sql(
        "SELECT src, dst FROM te",
        f"SELECT CAST({seed} AS BIGINT) AS s",
        rmax=1e-3,
        alpha=0.15,
        steps=NB_STEPS,
    )
    rows = sorted(con.execute(sql).fetchall())  # by rank
    con.close()
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
    vol_g = len(und)
    has_out = any(u == seed for u, _ in und)
    if not has_out:
        # isolated seed: the chain's precondition fails by design — the
        # oracle returns no rows (the Spark side short-circuits earlier)
        assert rows == []
        return
    prefix: set[int] = set()
    best = None  # (phi, rank)
    for rank, node, score, cut, vol, phi, in_best in rows:
        prefix.add(node)
        brute_cut = sum(
            1 for (u, v) in und if (u in prefix) != (v in prefix)
        ) // 1  # und holds both directions; crossing pairs counted twice
        # both directions of a crossing undirected edge satisfy the xor,
        # so the directed-row count equals 2 * undirected cut... except
        # each (u,v)/(v,u) pair contributes 2 rows -> halve:
        brute_cut = brute_cut // 2
        brute_vol = sum(len(adj.get(x, ())) for x in prefix)
        assert cut == brute_cut, (rank, cut, brute_cut)
        assert vol == brute_vol, (rank, vol, brute_vol)
        if 0 < vol < vol_g:
            want_phi = round(cut / min(vol, vol_g - vol), 9)
            assert phi is not None and abs(phi - want_phi) <= 1e-9
            if best is None or (phi, rank) < best:
                best = (phi, rank)
        else:
            assert phi is None
    for rank, node, score, cut, vol, phi, in_best in rows:
        assert in_best == (best is not None and rank <= best[1])


# ---------------------------------------------------------------------------
# triangles_doulion: sampling + exact-count-on-sample vs pure Python
# ---------------------------------------------------------------------------

from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (  # noqa: E402
    triangles_doulion_oracle_sql,
)


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists, seed=st.integers(0, 5), denom=st.integers(1, 3))
def test_doulion_oracle_matches_python(edges, seed, denom):
    """The DOULION oracle equals a python replay: identical hash draw,
    exact triangle count on the sampled undirected graph, denom^3 scale."""
    con = duckdb.connect()
    con.execute("CREATE TABLE te(src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?,?)", edges)
    got = con.execute(
        triangles_doulion_oracle_sql(
            "SELECT src, dst FROM te", seed=seed, denom=denom
        )
    ).fetchone()
    con.close()
    und = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    samp = [
        (u, v) for u, v in und if _ph(f"{u}|{v}", seed) % denom == 0
    ]
    adj: dict[int, set[int]] = {}
    for u, v in samp:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = 0
    for u, v in samp:
        tri += sum(1 for w in adj[u] & adj[v] if w > v)  # u < v < w once?
    # count each triangle once: for edge (u,v) with u<v, count common
    # neighbors w with w > v — every triangle u<v<w found exactly once
    # via its (u,v) edge
    assert got == (len(und), len(samp), tri, tri * denom**3), (got, tri)
