"""numpy sort/groupby helpers pinned to ``kind='stable'``.

numpy's default introsort (``kind='quicksort'``) dispatches to a SIMD
implementation that is catastrophically slow on CPUs without the vector
features it assumes — measured on this round's bench box (AVX-only
Xeon): ``np.sort`` 1.72 s vs 0.20 s stable, ``np.unique`` 5.5 s,
``np.lexsort`` 3.0 s on 1.2M int64 — a 9-30x penalty paid once per
superstep ROUND by the driver-local kernels.  The radix/merge-based
``'stable'`` kind is uniformly fast on every box and additionally keeps
tie order deterministic, which the kernels' (score desc, id asc) picks
rely on.  Every driver-local kernel must route its bulk sorts through
these helpers instead of the numpy defaults.
"""

from __future__ import annotations

import numpy as np


def sort_stable(a: np.ndarray) -> np.ndarray:
    return np.sort(a, kind="stable")


def argsort_stable(a: np.ndarray) -> np.ndarray:
    return np.argsort(a, kind="stable")


def unique_stable(a: np.ndarray) -> np.ndarray:
    """Sorted unique values via one stable sort (np.unique's contract,
    without its slow internal quicksort)."""
    if len(a) == 0:
        return a.copy()
    s = np.sort(a, kind="stable")
    keep = np.ones(len(s), dtype=bool)
    keep[1:] = s[1:] != s[:-1]
    return s[keep]


def lexsort_stable(keys) -> np.ndarray:
    """np.lexsort semantics (last key primary) as chained stable argsorts
    — identical permutation (both are stable), several times faster on
    boxes where np.lexsort's internal sort path is slow."""
    order = None
    for k in keys:
        if order is None:
            order = np.argsort(k, kind="stable")
        else:
            order = order[np.argsort(k[order], kind="stable")]
    return order if order is not None else np.zeros(0, dtype=np.int64)


def group_by_key(key: np.ndarray):
    """Group rows by integer ``key`` with ONE stable argsort.

    Returns ``(order, starts, uniq)``: ``order`` sorts the rows by key,
    ``starts`` are the group start offsets into the sorted rows, and
    ``uniq`` the ascending unique keys (``uniq[i]`` owns sorted rows
    ``starts[i]:starts[i+1]``)."""
    order = np.argsort(key, kind="stable")
    sk = key[order]
    first = np.ones(len(sk), dtype=bool)
    if len(sk):
        first[1:] = sk[1:] != sk[:-1]
    starts = np.nonzero(first)[0]
    return order, starts, sk[starts]


def group_sum_int(key: np.ndarray, weights: np.ndarray):
    """(uniq_keys_sorted, int64 sums) — the ``np.unique + np.add.at``
    idiom with the slow sort replaced; ``reduceat`` keeps int64 exactness
    (bincount would coerce weights to float64)."""
    if len(key) == 0:
        return key.copy(), np.zeros(0, dtype=np.int64)
    order, starts, uniq = group_by_key(key)
    sums = np.add.reduceat(weights[order].astype(np.int64), starts)
    return uniq, sums


def group_count(key: np.ndarray):
    """(uniq_keys_sorted, counts) — np.unique(..., return_counts=True)
    without the slow sort."""
    if len(key) == 0:
        return key.copy(), np.zeros(0, dtype=np.int64)
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
