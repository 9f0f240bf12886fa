"""numpy sort/groupby helpers with a probe-once kind dispatch.

Round 12 pinned every kernel sort to ``kind='stable'`` on the premise that
numpy's default introsort is catastrophically slow on SIMD-poor CPUs.  The
premise is host-dependent: on AVX2/AVX-512 boxes the default SIMD sort is
~8x FASTER than stable (measured r13: ``np.sort`` 15.6 ms default vs
132.8 ms stable on 1.2M int64; ``np.unique`` 22 ms vs 138 ms for the
stable twin), while on the SIMD-poor box r12 measured the opposite
(default 1.72 s vs 0.20 s stable).  Neither kind is safe to hard-code, so
these helpers now measure ONCE per process — a ~10 ms two-rep probe on
100k int64 at first use — and dispatch every *order-insensitive* bulk
sort to the winner.

Dispatch rules:

* value-only sorts (``sort_values``/``unique_sorted``/``group_count``/
  ``group_sum_int``) return identical results under any sort kind —
  equal elements are indistinguishable — and always use the probed kind;
* permutation-producing helpers where callers rely on first-occurrence
  tie order (``argsort_stable``, ``group_by_key``) stay pinned to
  ``'stable'``: ``group_by_key`` feeds float ``reduceat`` sums whose
  rounding depends on within-group row order, and the CSR builders the
  walk kernels draw neighbors from must keep their oracle-pinned edge
  order;
* ``lexsort_stable`` keeps the stable chain for every pass EXCEPT the
  first (least-significant) key, which uses the probed kind: rows that
  tie on every key end up adjacent either way, and every call site's
  full-key ties are duplicate rows (verified r13: mis/mst/graphstats),
  so the first-row-per-group picks are unchanged.
"""

from __future__ import annotations

import numpy as np

_UNSET = "__unset__"
_PROBED_KIND: str | None = _UNSET  # None = numpy default, or "stable"


def probed_kind() -> str | None:
    """The faster of numpy's default sort and ``kind='stable'`` on this
    host, measured once per process (~10 ms).  Returns ``None`` (pass no
    ``kind``) or ``"stable"``."""
    global _PROBED_KIND
    if _PROBED_KIND is _UNSET:
        import time

        rng = np.random.default_rng(0xA5A5)
        a = rng.integers(0, 1 << 40, 100_000, dtype=np.int64)
        np.sort(a[:4096])  # touch pages / warm dispatch
        np.sort(a[:4096], kind="stable")
        t_def = t_stable = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.sort(a)
            t_def = min(t_def, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.sort(a, kind="stable")
            t_stable = min(t_stable, time.perf_counter() - t0)
        _PROBED_KIND = None if t_def <= t_stable else "stable"
    return _PROBED_KIND


def sort_values(a: np.ndarray) -> np.ndarray:
    """Ascending values — order-insensitive, probed kind."""
    k = probed_kind()
    return np.sort(a) if k is None else np.sort(a, kind=k)


# Kept under the r12 name so kernel call sites read unchanged; the result
# (sorted unique values) is identical under any sort kind.
def unique_stable(a: np.ndarray) -> np.ndarray:
    """Sorted unique values, probed kind."""
    if len(a) == 0:
        return a.copy()
    if probed_kind() is None:
        return np.unique(a)
    s = np.sort(a, kind="stable")
    keep = np.ones(len(s), dtype=bool)
    keep[1:] = s[1:] != s[:-1]
    return s[keep]


unique_sorted = unique_stable


def argsort_stable(a: np.ndarray) -> np.ndarray:
    """Stable argsort — callers rely on first-occurrence tie order."""
    return np.argsort(a, kind="stable")


def lexsort_stable(keys) -> np.ndarray:
    """np.lexsort semantics (last key primary) as chained argsorts.  The
    first (least-significant) pass uses the probed kind — only rows tying
    on EVERY key can permute, and every call site's full-key ties are
    duplicate rows — later passes must be stable to preserve the earlier
    keys' order."""
    order = None
    for k in keys:
        if order is None:
            pk = probed_kind()
            order = np.argsort(k) if pk is None else np.argsort(k, kind=pk)
        else:
            order = order[np.argsort(k[order], kind="stable")]
    return order if order is not None else np.zeros(0, dtype=np.int64)


def group_by_key(key: np.ndarray):
    """Group rows by integer ``key`` with ONE stable argsort.

    Returns ``(order, starts, uniq)``: ``order`` sorts the rows by key,
    ``starts`` are the group start offsets into the sorted rows, and
    ``uniq`` the ascending unique keys (``uniq[i]`` owns sorted rows
    ``starts[i]:starts[i+1]``).  Stays stable: callers feed the order
    into float ``reduceat`` sums whose rounding is order-dependent."""
    order = np.argsort(key, kind="stable")
    sk = key[order]
    first = np.ones(len(sk), dtype=bool)
    if len(sk):
        first[1:] = sk[1:] != sk[:-1]
    starts = np.nonzero(first)[0]
    return order, starts, sk[starts]


def group_sum_int(key: np.ndarray, weights: np.ndarray):
    """(uniq_keys_sorted, int64 sums).  Integer sums are exact under any
    addition order, so the grouping argsort uses the probed kind;
    ``reduceat`` keeps int64 exactness (bincount would coerce weights to
    float64)."""
    if len(key) == 0:
        return key.copy(), np.zeros(0, dtype=np.int64)
    pk = probed_kind()
    order = np.argsort(key) if pk is None else np.argsort(key, kind=pk)
    sk = key[order]
    first = np.ones(len(sk), dtype=bool)
    first[1:] = sk[1:] != sk[:-1]
    starts = np.nonzero(first)[0]
    sums = np.add.reduceat(weights[order].astype(np.int64), starts)
    return sk[starts], sums


def group_count(key: np.ndarray):
    """(uniq_keys_sorted, int64 counts) — order-insensitive, probed kind
    (``np.unique(return_counts=True)`` when the default sort wins)."""
    if len(key) == 0:
        return key.copy(), np.zeros(0, dtype=np.int64)
    if probed_kind() is None:
        uniq, counts = np.unique(key, return_counts=True)
        return uniq, counts.astype(np.int64, copy=False)
    order, starts, uniq = group_by_key(key)
    counts = np.diff(np.append(starts, len(key)))
    return uniq, counts


def pick_max_per_group(v: np.ndarray, tie: np.ndarray, score: np.ndarray):
    """Per-group argmax with deterministic tie-break, replacing the
    ``np.lexsort((tie, -score, v))`` + first-row idiom.

    ``v`` must be ascending group keys and ``tie`` ascending WITHIN each
    group (the natural output order of ``group_by_key`` on
    ``v * n + tie``).  Returns the row indices of, per group, the highest
    ``score``; ties resolved to the smallest ``tie`` (= first occurrence
    in the sorted rows).  All O(len) passes, no sort."""
    m = len(v)
    if m == 0:
        return np.zeros(0, dtype=np.int64)
    newv = np.ones(m, dtype=bool)
    newv[1:] = v[1:] != v[:-1]
    starts = np.nonzero(newv)[0]
    segid = np.cumsum(newv) - 1
    maxs = np.maximum.reduceat(score, starts)
    ismax = score == maxs[segid]
    im_idx = np.nonzero(ismax)[0]
    im_seg = segid[im_idx]
    firstm = np.ones(len(im_idx), dtype=bool)
    firstm[1:] = im_seg[1:] != im_seg[:-1]
    return im_idx[firstm]
