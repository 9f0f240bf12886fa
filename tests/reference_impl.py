"""Independent hashmap-based reference implementations for golden tests.

Deliberately written in the reference's style (dict per-query sparse state,
sequential queues) and NOT shared with the engine's numpy/DataFrame code, so
the two can disagree. Recurrences per Power_Method.java:43-101,
Forward_Push.java:63-142, Backward_Search.java:38-100.
"""

from __future__ import annotations

from collections import deque


def power_method_dict(
    out_adj: dict[int, list[int]], source: int, alpha: float, iterations: int
) -> dict[int, float]:
    residue = {source: 1.0}
    reserve: dict[int, float] = {}
    for _ in range(iterations):
        pairs = residue
        residue = {}
        for v, rv in pairs.items():
            if rv <= 0:
                continue
            reserve[v] = reserve.get(v, 0.0) + rv * alpha
            remain = rv * (1 - alpha)
            nbrs = out_adj.get(v, [])
            if not nbrs:
                residue[source] = residue.get(source, 0.0) + remain
            else:
                inc = remain / len(nbrs)
                for u in nbrs:
                    residue[u] = residue.get(u, 0.0) + inc
    return reserve


def forward_push_dict(
    out_adj: dict[int, list[int]], source: int, alpha: float, rmax: float
) -> tuple[dict[int, float], dict[int, float]]:
    reserve: dict[int, float] = {}
    residue: dict[int, float] = {}
    deg = {v: len(ns) for v, ns in out_adj.items()}
    if deg.get(source, 0) == 0:
        return {source: 1.0}, {}
    residue[source] = 1.0
    q = deque([source])
    in_q = {source}
    while q:
        v = q.popleft()
        in_q.discard(v)
        rv = residue.get(v, 0.0)
        residue[v] = 0.0
        reserve[v] = reserve.get(v, 0.0) + rv * alpha
        d = deg.get(v, 0)
        if d == 0:
            residue[source] = residue.get(source, 0.0) + rv * (1 - alpha)
            if (
                deg.get(source, 0) > 0
                and residue[source] / deg[source] >= rmax
                and source not in in_q
            ):
                q.append(source)
                in_q.add(source)
            continue
        inc = (1 - alpha) * rv / d
        for u in out_adj[v]:
            residue[u] = residue.get(u, 0.0) + inc
            du = deg.get(u, 0)
            qualifies = du == 0 or residue[u] / du >= rmax
            if qualifies and u not in in_q:
                q.append(u)
                in_q.add(u)
    return reserve, residue


def backward_search_dict(
    out_adj: dict[int, list[int]],
    in_adj: dict[int, list[int]],
    target: int,
    alpha: float,
    rmax: float,
) -> dict[int, float]:
    reserve: dict[int, float] = {}
    residue: dict[int, float] = {}
    if len(in_adj.get(target, [])) == 0:
        return {target: 1.0}
    residue[target] = 1.0
    q = deque([target])
    in_q = {target}
    while q:
        v = q.popleft()
        in_q.discard(v)
        rv = residue.get(v, 0.0)
        residue[v] = 0.0
        reserve[v] = reserve.get(v, 0.0) + rv * alpha
        base = (1 - alpha) * rv
        for u in in_adj.get(v, []):
            residue[u] = residue.get(u, 0.0) + base / len(out_adj[u])
            if residue[u] > rmax and u not in in_q:
                q.append(u)
                in_q.add(u)
    return reserve
