"""Hypothesis property tests extending the r9 oracle-builder fuzz suite
(VERDICT r9 ask #4): each generated DuckDB oracle must equal an
independent pure-Python replay on random inputs — no Spark in the loop.
Covers the remaining r9 builders (hyperball register algebra,
betweenness_sampled pivot draw + quantized Brandes, temporal-motif time
bands) and two older high-CTE builders (Borůvka MST, SCC closure)."""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.slow

from personalized_pagerank_algorithms_on_neo4j_spark.functions.tmotif import (
    temporal_motifs_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.betweenness import (
    DELTA_SCALE,
    betweenness_sampled_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.hyperball import (
    hyperball_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.mst import (
    boruvka_oracle_sql,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators.scc import (
    scc_oracle_sql,
)

N = 8


def _ph(x, seed=0):
    return int(hashlib.md5(f"{x}#{seed}".encode()).hexdigest()[:12], 16)


edge_lists = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=0,
    max_size=24,
).map(lambda es: sorted({(u, v) for u, v in es if u != v}))


def _con_graph(edges, nodes=None):
    con = duckdb.connect()
    con.execute("CREATE TABLE te(src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?,?)", edges)
    if nodes is not None:
        con.execute("CREATE TABLE n(id BIGINT)")
        if nodes:
            con.executemany("INSERT INTO n VALUES (?)", [(x,) for x in nodes])
    return con


# --- HyperBall: bit-identical HLL registers + shared estimator --------------

HB_P = 4  # 16 buckets — small enough that sparse strata exercise both
HB_RADIUS = 3  # estimator branches (linear counting vs raw)
_HASH_BITS = 48


def _py_hyperball(nodes, edges, radius, p):
    m = 1 << p
    w_bits = _HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    succ = {}
    for u, v in edges:
        succ.setdefault(u, set()).add(v)
    regs = {}
    for v in nodes:
        h = _ph(v)
        w = h // m
        rho = (w_bits - w.bit_length() + 1) if w > 0 else w_bits + 1
        regs[v] = {h % m: rho}

    def estimate(r):
        out = {}
        for v in nodes:
            present = len(regs[v])
            s = sum(2.0 ** -x for _, x in sorted(regs[v].items()))
            e_raw = alpha * m * m / (s + (m - present))
            v_zero = m - present
            if e_raw <= 2.5 * m and v_zero > 0:
                est = float(m) * math.log(float(m) / v_zero)
            else:
                est = e_raw
            out[(r, v)] = est
        return out

    results = {}
    for r in range(1, radius + 1):
        nxt = {}
        for v in nodes:
            merged = dict(regs[v])
            for x in succ.get(v, ()):
                for b, rho in regs[x].items():
                    if rho > merged.get(b, 0):
                        merged[b] = rho
            nxt[v] = merged
        regs = nxt
        results.update(estimate(r))
    return results


@settings(max_examples=30, deadline=None)
@given(edges=edge_lists)
def test_hyperball_oracle_matches_python(edges):
    nodes = sorted({x for e in edges for x in e}) or [0]
    con = _con_graph(edges, nodes=nodes)
    got = {
        (int(r), int(node)): ball
        for r, node, ball in con.execute(
            hyperball_oracle_sql(
                "SELECT id, CAST(id AS VARCHAR) AS name FROM n",
                "SELECT src, dst FROM te",
                radius=HB_RADIUS,
                p=HB_P,
            )
        ).fetchall()
    }
    want = _py_hyperball(nodes, edges, HB_RADIUS, HB_P)
    assert set(got) == set(want)
    for k, est in want.items():
        # the oracle rounds to 4; allow the rounding quantum plus ulp
        assert abs(got[k] - est) <= 6e-5, (k, got[k], est)
    con.close()


# --- Brandes-Pich sampled betweenness: pivot draw + micro-unit algebra ------

BS_SEED = 9
BS_HOPS = 4


def _py_betweenness_sampled(edges, n_pivots, seed, max_hops):
    succ = {}
    for u, v in edges:
        succ.setdefault(u, set()).add(v)
    eligible = sorted(succ)
    if not eligible:
        return {}
    k = min(n_pivots, len(eligible)) or 1
    pivots = sorted(eligible, key=lambda x: (_ph(x, seed), x))[:n_pivots]
    bc = {}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        for h in range(1, max_hops + 1):
            cand = {}
            for u in frontier:
                for v in succ.get(u, ()):
                    if v not in dist:
                        cand[v] = cand.get(v, 0) + sigma[u]
            if not cand:
                break
            for v, sg in cand.items():
                dist[v] = h
                sigma[v] = sg
            frontier = list(cand)
        lmax = max(dist.values())
        if lmax == 0:
            continue
        delta = {v: 0 for v in dist if dist[v] == lmax}
        for lvl in range(lmax - 1, 0, -1):
            new_delta = {}
            for v in [x for x in dist if dist[x] == lvl]:
                tot = 0
                for w in succ.get(v, ()):
                    if dist.get(w) == lvl + 1:
                        x = (
                            float(sigma[v])
                            / float(sigma[w])
                            * float(DELTA_SCALE + delta[w])
                        )
                        tot += math.floor(x + 0.5)
                new_delta[v] = tot
            for v, d in new_delta.items():
                delta[v] = d
            # freeze: deeper levels already final
        for v, d in delta.items():
            bc[v] = bc.get(v, 0) + d
    n_eligible = len(eligible)
    return {v: (d * n_eligible) // k for v, d in bc.items()}


@settings(max_examples=30, deadline=None)
@given(edges=edge_lists, n_pivots=st.integers(1, 5))
def test_betweenness_sampled_oracle_matches_python(edges, n_pivots):
    con = _con_graph(edges)
    got = {
        int(node): int(v)
        for node, v in con.execute(
            betweenness_sampled_oracle_sql(
                "SELECT src, dst FROM te",
                n_pivots=n_pivots,
                seed=BS_SEED,
                max_hops=BS_HOPS,
            )
        ).fetchall()
    }
    want = _py_betweenness_sampled(edges, n_pivots, BS_SEED, BS_HOPS)
    assert got == want
    con.close()


# --- temporal motifs: handoff derivation + time-band joins ------------------

TM_PAGES = 3
TM_DELTA = 50

events_strategy = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 120)),  # (user, t_seconds)
    min_size=0,
    max_size=25,
)


def _py_tmotif(events, n_pages, delta_s):
    # events: list of (event_id, user, t)
    by_page = {}
    for eid, u, t in events:
        by_page.setdefault(eid % n_pages, []).append((t, eid, u))
    tm_e = []
    for rows in by_page.values():
        rows.sort()
        for (t1, e1, u1), (t2, e2, u2) in zip(rows, rows[1:]):
            if u1 != u2:
                tm_e.append((u1, u2, t2))
    paths = []
    for (s1, d1, t1) in tm_e:
        for (s2, d2, t2) in tm_e:
            if d1 == s2 and t1 < t2 <= t1 + delta_s and d2 != s1:
                paths.append((s1, d1, d2, t1, t2))
    n_paths = {}
    n_tri = {}
    for (u, mid, w, t1, t2) in paths:
        n_paths[mid] = n_paths.get(mid, 0) + 1
        for (cs, cd, ct) in tm_e:
            if cs == w and cd == u and t2 < ct <= t1 + delta_s:
                n_tri[mid] = n_tri.get(mid, 0) + 1
    return {
        mid: (np_, n_tri.get(mid, 0)) for mid, np_ in n_paths.items()
    }


@settings(max_examples=30, deadline=None)
@given(raw=events_strategy)
def test_temporal_motifs_oracle_matches_python(raw):
    events = [(i, u, t) for i, (u, t) in enumerate(raw)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, user_id BIGINT, ts TIMESTAMP)"
    )
    if events:
        base = datetime.datetime(2024, 1, 1)
        con.executemany(
            "INSERT INTO events VALUES (?,?,?)",
            [
                (eid, u, base + datetime.timedelta(seconds=t))
                for eid, u, t in events
            ],
        )
    got = {
        int(m): (int(p), int(t))
        for m, p, t in con.execute(
            temporal_motifs_oracle_sql(TM_DELTA, n_pages=TM_PAGES)
        ).fetchall()
    }
    base_epoch = int(datetime.datetime(2024, 1, 1).timestamp())
    want = _py_tmotif(
        [(eid, u, base_epoch + t) for eid, u, t in events],
        TM_PAGES,
        TM_DELTA,
    )
    assert got == want
    con.close()


# --- SCC: transitive closure + mutual-min labeling --------------------------


def _py_scc(edges):
    nodes = sorted({x for e in edges for x in e})
    succ = {}
    for u, v in edges:
        succ.setdefault(u, set()).add(v)
    reach = {v: set() for v in nodes}
    for v in nodes:
        stack, seen = [v], set()
        while stack:
            x = stack.pop()
            for y in succ.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        reach[v] = seen
    out = {}
    for v in nodes:
        cls = {v} | {w for w in reach[v] if v in reach[w]}
        out[v] = min(cls)
    return out


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists)
def test_scc_oracle_matches_python(edges):
    con = _con_graph(edges)
    got = {
        int(n): int(s)
        for n, s in con.execute(
            scc_oracle_sql("SELECT src, dst FROM te")
        ).fetchall()
    }
    assert got == _py_scc(edges)
    con.close()


# --- Borůvka MST forest: per-component argmin + closure merge ---------------

wedge_lists = st.lists(
    st.tuples(
        st.integers(0, N - 1), st.integers(0, N - 1), st.integers(1, 9)
    ),
    min_size=0,
    max_size=20,
).map(
    lambda es: sorted(
        {(u, v): w for u, v, w in es if u != v}.items()
    )
)


def _py_boruvka(edges, rounds=8):
    """Replay of boruvka_oracle_sql: canonical MIN-weight undirected
    edges, per-round per-component strict (sw, u, v) argmin, exact
    closure merge to MIN label."""
    canon = {}
    for (s, d), w in edges:
        key = (min(s, d), max(s, d))
        canon[key] = min(canon.get(key, w), w)
    E = [(u, v, w) for (u, v), w in sorted(canon.items())]
    nodes = sorted({x for u, v, _ in E for x in (u, v)})
    label = {v: v for v in nodes}
    forest = set()
    for _ in range(rounds):
        live = [
            (u, v, w, label[u], label[v])
            for u, v, w in E
            if label[u] != label[v]
        ]
        if not live:
            break
        best = {}
        for u, v, w, lu, lv in live:
            for comp in (lu, lv):
                key = (w, u, v)  # sw == w for minimize
                if comp not in best or key < best[comp][0]:
                    best[comp] = (key, (u, v, w, lu, lv))
        picked = {t for _, t in best.values()}
        for u, v, w, lu, lv in picked:
            forest.add((u, v, w))
        # closure merge over the claimed label pairs
        adj = {}
        for _, _, _, lu, lv in picked:
            adj.setdefault(lu, set()).add(lv)
            adj.setdefault(lv, set()).add(lu)
        newlab = {}
        for a in adj:
            stack, seen = [a], {a}
            while stack:
                x = stack.pop()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            newlab[a] = min(seen)
        label = {v: newlab.get(l, l) for v, l in label.items()}
    return sorted(forest)


@settings(max_examples=40, deadline=None)
@given(edges=wedge_lists)
def test_boruvka_oracle_matches_python(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE we(src BIGINT, dst BIGINT, weight BIGINT)")
    rows = [(u, v, w) for (u, v), w in edges]
    if rows:
        con.executemany("INSERT INTO we VALUES (?,?,?)", rows)
    got = sorted(
        (int(u), int(v), int(w))
        for u, v, w in con.execute(
            boruvka_oracle_sql("SELECT src, dst, weight FROM we", rounds=8)
        ).fetchall()
    )
    assert got == _py_boruvka(edges, rounds=8)
    con.close()


# --- deterministic two-level Louvain: integer gains + parity schedule -------

LV_R1, LV_R2 = 4, 2


def _py_louvain(nodes, edges, rounds1=LV_R1, rounds2=LV_R2):
    und = sorted(
        {(u, v) for u, v in edges if u != v}
        | {(v, u) for u, v in edges if u != v}
    )
    m2 = len(und)
    deg = {}
    for u, _ in und:
        deg[u] = deg.get(u, 0) + 1

    def rounds(labels, E, W, strength, n_rounds):
        # E: list of (src, dst, w); labels: dict node->label (all nodes)
        for i in range(n_rounds):
            par = i % 2
            ca = {}
            for s, d, w in E:
                if s % 2 == par:
                    key = (s, labels[d])
                    ca[key] = ca.get(key, 0) + w
            for v in labels:
                if v % 2 == par:
                    ca.setdefault((v, labels[v]), 0)
            dc = {}
            for v, l in labels.items():
                dc[l] = dc.get(l, 0) + strength.get(v, 0)
            best = {}
            for (v, cand), w in ca.items():
                dv = strength.get(v, 0)
                own = dv if cand == labels[v] else 0
                score = m2 * w - dv * (dc[cand] - own)
                key = (-score, cand)
                if v not in best or key < best[v][0]:
                    best[v] = (key, cand)
            for v, (_, cand) in best.items():
                labels[v] = cand
        return labels

    l1 = rounds(dict((v, v) for v in nodes), [(s, d, 1) for s, d in und],
                1, deg, rounds1)
    # contraction
    e2 = {}
    for s, d in und:
        key = (l1[s], l1[d])
        e2[key] = e2.get(key, 0) + 1
    comms = sorted({l for l in l1.values()})
    s2 = {}
    for (s, d), w in e2.items():
        s2[s] = s2.get(s, 0) + w
    e2x = [(s, d, w) for (s, d), w in sorted(e2.items()) if s != d]
    l2 = rounds(dict((c, c) for c in comms), e2x, 1, s2, rounds2)
    return {v: l2[l1[v]] for v in nodes}


@settings(max_examples=30, deadline=None)
@given(edges=edge_lists)
def test_louvain_oracle_matches_python(edges):
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.louvain import (
        louvain_oracle_sql,
    )

    nodes = sorted({x for e in edges for x in e} | {0})
    con = _con_graph(edges, nodes=nodes)
    got = {
        int(n): int(l)
        for n, l in con.execute(
            louvain_oracle_sql(
                "SELECT src, dst FROM te",
                "SELECT id FROM n",
                rounds1=LV_R1,
                rounds2=LV_R2,
            )
        ).fetchall()
    }
    assert got == _py_louvain(nodes, edges)
    con.close()
