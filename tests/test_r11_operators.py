"""Round-11 operators: dynamic-PPR DELETE maintenance (oracle-builder
fuzz vs a pure-Python pipeline replay), exact merge-order BPE apply
(fold equivalence on adversarial rule tables + a pure-Python replay),
and multi-pair A* (per-pair parity with the single-pair kernel, the
amortized heuristic's admissibility, unreachable pairs, oracle fuzz
vs pure-Python Dijkstra)."""

from __future__ import annotations

import heapq
import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions.bpe import (
    bpe_exact_apply_counts,
    bpe_fold_apply_counts,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.astar import (
    alt_heuristic,
    alt_heuristic_multi,
    astar_multi_oracle_sql,
    astar_multi_pair,
    astar_single_pair,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.dynamic_ppr import (
    incremental_ppr_delete_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.sssp import (
    sssp_weighted,
    undirected_min_cost,
)

ALPHA = 1.0 / 7.0


# --- exact merge-order BPE apply --------------------------------------------


def _py_fold(text: str, merges: list[tuple[str, str]]) -> str:
    """The committed exact semantics: the merge table replayed as a left
    fold of literal replaces over the double-space stream."""
    s = "  " + "  ".join(re.split(r" +", text.strip().lower())) + "  "
    for l, r in merges:
        s = s.replace(f" {l}  {r} ", f" {l}_{r} ")
    return s


BPE_DOCS = [
    (1, "a b c d"),
    (2, "a a a"),          # chain overlap: greedy-left fuse
    (3, "x a b c d"),      # a later rule's pattern created by an earlier fire
    (4, "single"),
    (5, "a b b c a b"),    # multiple occurrences of one rule
    (6, "c a b"),          # a pair that never re-enters after its turn
    (7, "a a a a"),        # two disjoint fuses in one replace pass
    (8, "b c b c b c"),
]

# rank 3 (a,a) fires AFTER rank 1/2; rank 4 consumes rank 3's product;
# rank 5's rhs is rank 2's product (hierarchy); rank 6 DUPLICATES rank 1
# (legal in an arbitrary table — must behave as the fold: a later no-op)
BPE_MERGES = [
    ("b", "c"),
    ("a", "b"),
    ("a", "a"),
    ("a_a", "a"),
    ("x", "a_b"),
    ("b", "c"),
]


def test_exact_apply_matches_fold_and_python(spark):
    docs = spark.createDataFrame(BPE_DOCS, "doc_id long, text string")
    ex = {
        r.doc_id: (r.s, r.n_words, r.n_tokens)
        for r in bpe_exact_apply_counts(
            docs, BPE_MERGES, with_stream=True
        ).collect()
    }
    fo = {
        r.doc_id: (r.s, r.n_words, r.n_tokens)
        for r in bpe_fold_apply_counts(
            docs, BPE_MERGES, with_stream=True
        ).collect()
    }
    assert ex == fo
    for doc_id, text in BPE_DOCS:
        want = _py_fold(text, BPE_MERGES)
        assert ex[doc_id][0] == want, (doc_id, ex[doc_id][0], want)
        assert ex[doc_id][2] == len(want.strip().split("  "))


def test_exact_apply_empty_vocab_is_identity(spark):
    docs = spark.createDataFrame(BPE_DOCS, "doc_id long, text string")
    for r in bpe_exact_apply_counts(docs, []).collect():
        assert r.n_tokens == r.n_words


# random rule tables need NOT be training-consistent — the `last`
# qualifier makes the argmin iteration fold-equivalent unconditionally,
# and this property pins exactly that claim
_sym = st.sampled_from(["a", "b", "c", "a_b", "b_c", "a_a"])
_rules = st.lists(st.tuples(_sym, _sym), min_size=0, max_size=8)
_doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=10
).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(rules=_rules, texts=st.lists(_doc, min_size=1, max_size=3))
def test_exact_apply_fold_equivalence_fuzz(spark, rules, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.s
        for r in bpe_exact_apply_counts(
            docs, rules, with_stream=True
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_fold(t, rules), (t, rules)


# --- dynamic-PPR DELETE oracle fuzz ------------------------------------------

N = 6
RMAX_FUZZ = 1e-2


def _od(edges):
    od = {}
    for u, _ in edges:
        od[u] = od.get(u, 0) + 1
    return od


def _py_push(state, edges, first, steps, rmax, alpha):
    od = _od(edges)
    in_adj = {}
    for u, v in edges:
        in_adj.setdefault(v, []).append(u)
    for i in range(steps):
        thr = 0.0 if (i == 0 and first) else rmax
        nxt = {}

        def add(key, dr, dp):
            r, p = nxt.get(key, (0.0, 0.0))
            nxt[key] = (r + dr, p + dp)

        moved = False
        for (t, v), (r, p) in state.items():
            if abs(r) > thr:
                moved = True
                add((t, v), 0.0, p + alpha * r)
                for u in in_adj.get(v, ()):
                    add((t, u), (1 - alpha) * r / od[u], 0.0)
            else:
                add((t, v), r, p)
        if not moved:
            return state
        state = nxt
    return state


def _py_pipeline_delete(
    all_edges, dels, targets, rmax, alpha, init_steps, resume_steps
):
    dset = set(dels)
    keep = [e for e in all_edges if e not in dset]
    state = {(t, t): (1.0, 0.0) for t in targets}
    state = _py_push(state, all_edges, True, init_steps, rmax, alpha)
    d_all = _od(all_edges)
    d_del = _od(dels)
    deltas = {}
    for t in targets:
        p = {v: pv for (tt, v), (_, pv) in state.items() if tt == t}
        for u, c in d_del.items():
            d = d_all[u]
            dp = d - c
            term = 0.0
            if dp > 0:
                px = sum(p.get(x, 0.0) for (uu, x) in keep if uu == u)
                term += (1.0 / dp - 1.0 / d) * px
            pw = sum(p.get(w, 0.0) for (uu, w) in dels if uu == u)
            term -= pw / d
            if term:
                deltas[(t, u)] = (
                    deltas.get((t, u), 0.0) + (1 - alpha) / alpha * term
                )
    for key, dr in deltas.items():
        r, p = state.get(key, (0.0, 0.0))
        state[key] = (r + dr, p)
    state = _py_push(state, keep, False, resume_steps, rmax, alpha)
    return {
        (t, v): (round(p, 9), round(r, 9))
        for (t, v), (r, p) in state.items()
        if round(p, 9) > 0 or round(r, 9) != 0
    }


@st.composite
def _graph_and_dels(draw):
    base = draw(
        st.lists(
            st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
            min_size=0,
            max_size=18,
        ).map(lambda es: sorted({(u, v) for u, v in es if u != v}))
    )
    dels = [e for e in base if draw(st.booleans())]
    return base, dels


@settings(max_examples=40, deadline=None)
@given(gd=_graph_and_dels())
def test_delete_oracle_matches_python_replay(gd):
    base, dels = gd
    keep = [e for e in base if e not in set(dels)]
    targets = [0, N - 1]
    con = duckdb.connect()
    con.execute("CREATE TABLE ae(src BIGINT, dst BIGINT)")
    con.execute("CREATE TABLE de(src BIGINT, dst BIGINT)")
    con.execute("CREATE TABLE ke(src BIGINT, dst BIGINT)")
    if base:
        con.executemany("INSERT INTO ae VALUES (?,?)", base)
    if dels:
        con.executemany("INSERT INTO de VALUES (?,?)", dels)
    if keep:
        con.executemany("INSERT INTO ke VALUES (?,?)", keep)
    sql = incremental_ppr_delete_oracle_sql(
        "SELECT src, dst FROM ae",
        "SELECT src, dst FROM de",
        "SELECT src, dst FROM ke",
        f"SELECT * FROM (VALUES (0),({N - 1})) t(target)",
        RMAX_FUZZ,
        ALPHA,
        init_steps=60,
        resume_steps=30,
    )
    got = {
        (t, v): (ppr, res) for t, v, ppr, res in con.execute(sql).fetchall()
    }
    want = _py_pipeline_delete(base, dels, targets, RMAX_FUZZ, ALPHA, 60, 30)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k][0] - want[k][0]) <= 2e-9, (k, got[k], want[k])
        assert abs(got[k][1] - want[k][1]) <= 2e-9, (k, got[k], want[k])
    con.close()


# --- multi-pair A* ------------------------------------------------------------


def _grid_edges(spark, w=6, h=6):
    rows = []
    for y in range(h):
        for x in range(w):
            u = y * w + x
            if x + 1 < w:
                rows.append((u, u + 1, 1 + (x + y) % 3))
            if y + 1 < h:
                rows.append((u, u + w, 1 + (x * y) % 4))
    return undirected_min_cost(
        spark.createDataFrame(rows, "src long, dst long, w long")
    )


def test_multi_pair_parity_with_single_and_sssp(spark):
    """Every pair's distance equals both the single-pair A* kernel's and
    plain SSSP's — including an s == t pair (distance 0)."""
    e = _grid_edges(spark).localCheckpoint(eager=True)
    n = 36
    pairs = [(0, 35), (5, 30), (7, 7)]
    lm = spark.createDataFrame([(0,), (5,), (30,)], "source long")
    tdf = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(pairs)], "pid int, t long"
    )
    hx = alt_heuristic_multi(spark, e, lm, tdf, n_hint=n * 3)
    got = {
        (r.src, r.dst): r.dist
        for r in astar_multi_pair(
            spark, e, pairs, hx, n_hint=n * len(pairs)
        ).collect()
    }
    assert len(got) == len(pairs)
    for s, t in pairs:
        want = {
            r.node: r.dist
            for r in sssp_weighted(spark, e, s, n_hint=n).collect()
        }[t]
        assert got[(s, t)] == want, (s, t)
        h1 = alt_heuristic(spark, e, lm, target=t, n_hint=n * 3)
        single = astar_single_pair(spark, e, s, t, h1, n_hint=n).collect()
        assert (single[0].src, single[0].dst, single[0].dist) == (s, t, want)


def test_multi_heuristic_admissible_per_pid(spark):
    """h(pid, v) <= d(v, t_pid) for every node with a finite distance —
    the multi-target ALT bound inherits single-target admissibility."""
    e = _grid_edges(spark).localCheckpoint(eager=True)
    n = 36
    targets = [(0, 35), (1, 14)]
    lm = spark.createDataFrame([(0,), (5,), (30,)], "source long")
    tdf = spark.createDataFrame(targets, "pid int, t long")
    hx = {
        (r.pid, r.node): r.h
        for r in alt_heuristic_multi(
            spark, e, lm, tdf, n_hint=n * 3
        ).collect()
    }
    for pid, t in targets:
        dist = {
            r.node: r.dist
            for r in sssp_weighted(spark, e, t, n_hint=n).collect()
        }
        for (p, v), h in hx.items():
            if p == pid and v in dist:
                assert h <= dist[v], (pid, v, h, dist[v])


def test_multi_pair_unreachable_emits_no_row(spark):
    e = undirected_min_cost(
        spark.createDataFrame(
            [(0, 1, 2), (2, 3, 5)], "src long, dst long, w long"
        )
    )
    lm = spark.createDataFrame([(0,)], "source long")
    pairs = [(0, 1), (0, 3)]  # second pair crosses components
    tdf = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(pairs)], "pid int, t long"
    )
    hx = alt_heuristic_multi(spark, e, lm, tdf, n_hint=8)
    got = astar_multi_pair(spark, e, pairs, hx, n_hint=8).collect()
    assert [(r.src, r.dst, r.dist) for r in got] == [(0, 1, 2)]


def test_multi_heuristic_unconverged_raises(spark):
    e = _grid_edges(spark).localCheckpoint(eager=True)
    lm = spark.createDataFrame([(0,)], "source long")
    tdf = spark.createDataFrame([(0, 35)], "pid int, t long")
    with pytest.raises(RuntimeError, match="not converged"):
        alt_heuristic_multi(spark, e, lm, tdf, max_rounds=2, n_hint=36)


NW = 7

_wedges = st.lists(
    st.tuples(
        st.integers(0, NW - 1), st.integers(0, NW - 1), st.integers(1, 9)
    ),
    min_size=0,
    max_size=20,
).map(
    lambda es: sorted(
        {(min(u, v), max(u, v)): w for u, v, w in es if u != v}.items()
    )
)


def _py_dijkstra(edges, src):
    adj: dict[int, list[tuple[int, int]]] = {}
    for (u, v), w in edges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


@settings(max_examples=40, deadline=None)
@given(edges=_wedges)
def test_multi_oracle_matches_python_dijkstra(edges):
    pairs = [(0, NW - 1), (1, 3)]
    con = duckdb.connect()
    con.execute("CREATE TABLE we(src BIGINT, dst BIGINT, w BIGINT)")
    rows = [(u, v, w) for (u, v), w in edges] + [
        (v, u, w) for (u, v), w in edges
    ]
    if rows:
        con.executemany("INSERT INTO we VALUES (?,?,?)", rows)
    sql = astar_multi_oracle_sql(
        "SELECT src, dst, w FROM we",
        "SELECT 0 AS pid, CAST(0 AS BIGINT) AS s, "
        f"CAST({NW - 1} AS BIGINT) AS t "
        "UNION ALL SELECT 1, CAST(1 AS BIGINT), CAST(3 AS BIGINT)",
        rounds=NW,
    )
    got = sorted(con.execute(sql).fetchall())
    want = sorted(
        (s, t, _py_dijkstra(edges, s)[t])
        for s, t in pairs
        if t in _py_dijkstra(edges, s)
    )
    assert got == want
    con.close()


# --- streaming store #15: tokenizer counts on document arrival ---------------


def _bpe_store_fixture(spark):
    docs = [
        (1, "a b c d a b"),
        (2, "a a a b c"),
        (3, "x a b c d"),
        (4, "c d c d c d"),
        (5, "single"),
        (6, "b c b c a b"),
    ]
    merges = [("b", "c"), ("a", "b"), ("c", "d"), ("a", "a")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return docs, merges, df


def test_streaming_bpe_counts_match_batch_twin_and_replay(spark, tmp_path):
    """Per-epoch exact-apply counts; the read-side first-seen fold must
    equal the batch operator over the distinct documents EXACTLY, and a
    replayed epoch (same rows, same id) must change nothing."""
    from personalized_pagerank_algorithms_on_neo4j_spark.streaming import (
        bpe_stream as B,
    )

    docs, merges, df = _bpe_store_fixture(spark)
    store = str(tmp_path / "bpe_store")
    mb = B.make_merge_batch(spark, store, merges)
    rows = df.collect()
    mb(spark.createDataFrame(rows[:2], df.schema), 0)
    mb(spark.createDataFrame(rows[2:4], df.schema), 1)
    mb(spark.createDataFrame(rows[4:], df.schema), 2)

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.bpe import (
        bpe_exact_apply_counts,
    )

    want = sorted(
        map(tuple, bpe_exact_apply_counts(df, merges).collect())
    )
    got = sorted(map(tuple, B.read_token_counts(spark, store).collect()))
    assert got == want and got

    # replay the last epoch: identical partial overwrites its own
    # partition — byte-identical reads
    mb(spark.createDataFrame(rows[4:], df.schema), 2)
    assert sorted(
        map(tuple, B.read_token_counts(spark, store).collect())
    ) == want

    stats = B.read_corpus_stats(spark, store).collect()[0]
    assert stats["n_docs"] == len(docs)
    assert stats["n_words"] == sum(len(t.split()) for _, t in docs)


def test_streaming_bpe_counts_redelivery_and_compaction(spark, tmp_path):
    """A document RE-DELIVERED in a later epoch must not double-count
    (first-seen rule), compaction folds history losslessly, and folded
    history (epoch=-1) keeps winning over post-compaction re-delivery."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.bpe import (
        bpe_exact_apply_counts,
    )
    from personalized_pagerank_algorithms_on_neo4j_spark.streaming import (
        bpe_stream as B,
    )

    docs, merges, df = _bpe_store_fixture(spark)
    store = str(tmp_path / "bpe_store2")
    mb = B.make_merge_batch(spark, store, merges)
    rows = df.collect()
    mb(spark.createDataFrame(rows[:3], df.schema), 0)
    # doc 1 re-delivered alongside new docs
    mb(spark.createDataFrame([rows[0]] + rows[3:5], df.schema), 1)
    mb(spark.createDataFrame(rows[5:], df.schema), 2)

    want = sorted(
        map(tuple, bpe_exact_apply_counts(df, merges).collect())
    )
    assert sorted(
        map(tuple, B.read_token_counts(spark, store).collect())
    ) == want

    folded = B.compact_store(spark, store)
    assert folded == 2  # epochs 0 and 1 -> epoch=-1; newest stays
    assert sorted(
        map(tuple, B.read_token_counts(spark, store).collect())
    ) == want
    # re-deliver doc 2 after compaction: folded history still wins
    mb(spark.createDataFrame([rows[1]], df.schema), 3)
    assert sorted(
        map(tuple, B.read_token_counts(spark, store).collect())
    ) == want


# --- containment dedup (doc-in-doc, r11 post-window registration) -------------


def test_containment_catches_doc_in_doc_that_jaccard_misses(spark):
    """A short quote fully embedded in a long article: containment 1.0,
    Jaccard far below any resemblance threshold — the measure's reason to
    exist.  Orientation small-first, ties by id."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import (
        dedup as D,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.replace("w", "z")),
            (3, "totally unrelated text about spark joins and shuffles"),
            (4, quote),  # exact twin of 1: containment 1.0, tie by id
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_small, r.doc_big): r.containment
        for r in D.containment_pairs(docs, threshold=0.9, n=3).collect()
    }
    assert got[(1, 2)] == 1.0  # quote-in-article, small first
    assert got[(4, 2)] == 1.0
    assert got[(1, 4)] == 1.0  # equal sizes -> lower id first
    assert all(k[0] != 3 and k[1] != 3 for k in got)
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.0, n=3).collect()
    }
    # resemblance on the quote-in-article pair is far below 0.5 — the
    # pair is INVISIBLE to the Jaccard key at its production threshold
    assert jac[(1, 2)] < 0.2


def test_containment_hot_shingle_cap_underestimates_only(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import (
        dedup as D,
    )

    docs = spark.createDataFrame(
        [(i, "common stop shingle " + f"unique{i} tail{i}") for i in range(6)],
        "doc_id long, text string",
    )
    uncapped = {
        (r.doc_small, r.doc_big): r.containment
        for r in D.containment_pairs(
            docs, threshold=0.0, n=3, max_shingle_df=None
        ).collect()
    }
    capped = {
        (r.doc_small, r.doc_big): r.containment
        for r in D.containment_pairs(
            docs, threshold=0.0, n=3, max_shingle_df=3
        ).collect()
    }
    for k, v in capped.items():
        assert v <= uncapped[k] + 1e-9  # cap only ever underestimates


# --- SALSA (r11 post-window registration) -------------------------------------


def _py_salsa(edges, iterations):
    od, idg = {}, {}
    for u, v in edges:
        od[u] = od.get(u, 0) + 1
        idg[v] = idg.get(v, 0) + 1
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {u: 1.0 / len(od) for u in od}
    a = {}
    for _ in range(iterations):
        a = {}
        for u, v in edges:
            a[v] = a.get(v, 0.0) + h.get(u, 0.0) / od[u]
        h = {}
        for u, v in edges:
            h[u] = h.get(u, 0.0) + a.get(v, 0.0) / idg[v]
    return sorted(
        (n, round(h.get(n, 0.0), 9), round(a.get(n, 0.0), 9))
        for n in nodes
    )


@settings(max_examples=40, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=20,
    ).map(lambda es: sorted({(u, v) for u, v in es if u != v})),
    iters=st.integers(1, 5),
)
def test_salsa_oracle_matches_python(edges, iters):
    import duckdb as _duck

    from personalized_pagerank_algorithms_on_neo4j_spark.operators.salsa import (
        salsa_oracle_sql,
    )

    if not edges:
        return
    con = _duck.connect()
    con.execute("CREATE TABLE tse(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO tse VALUES (?,?)", edges)
    got = sorted(
        con.execute(
            salsa_oracle_sql("SELECT src, dst FROM tse", iterations=iters)
        ).fetchall()
    )
    want = _py_salsa(edges, iters)
    assert [n for n, _, _ in got] == [n for n, _, _ in want]
    for (gn, gh, ga), (_, wh, wa) in zip(got, want):
        assert abs(gh - wh) <= 2e-9 and abs(ga - wa) <= 2e-9, (gn,)
    con.close()


def test_salsa_mass_conservation_and_degree_fixed_point(spark, got):
    """Stochastic half-steps conserve mass exactly (sum hub == sum
    authority == 1), and on the GOT graph the Spark result matches the
    pure-Python recurrence row-for-row at ROUND(_, 9)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.salsa import (
        salsa,
    )

    out = salsa(got, iterations=6).collect()
    hub_sum = sum(r.hub for r in out)
    auth_sum = sum(r.authority for r in out)
    assert abs(hub_sum - 1.0) < 1e-6 and abs(auth_sum - 1.0) < 1e-6
    edges = [
        (int(r.src), int(r.dst))
        for r in got.edges.select("src", "dst").collect()
    ]
    want = {n: (h, a) for n, h, a in _py_salsa(edges, 6)}
    for r in out:
        wh, wa = want[int(r.node)]
        assert abs(r.hub - wh) <= 2e-9 and abs(r.authority - wa) <= 2e-9
