"""One-time driver page pre-fault.

On virtualized hosts with lazily-populated guest memory, the FIRST touch
of freshly mapped pages can cost ~1 ms/page until a few hundred MB have
been faulted in (measured on this round's bench box: a 256 MB
first-touch cost 49.6 s in a cold process and 0.33 s in a warm one;
after the warmup an identical driver-kernel pass dropped from 18.3 s to
0.23 s with no code change).  The driver-local numpy kernels allocate
tens of MB of temporaries per call, so a cold process silently bills
that page debt to whichever QUERY happens to run first — the classic
"measure the computation, not the machine state" trap of guide §1.

``prefault`` absorbs the debt once, at session build (outside any timed
region): allocate an arena, touch one cell per 4 KB page, release it.
On healthy hosts this is a few hundredths of a second; where the
pathology exists it pays an unavoidable cost exactly once.  Opt out with
SPARK_GRAFT_NO_PREFAULT=1; size via SPARK_GRAFT_PREFAULT_MB.
"""

from __future__ import annotations

import os

_done = False


def prefault(mb: int | None = None) -> None:
    global _done
    if _done or os.environ.get("SPARK_GRAFT_NO_PREFAULT"):
        return
    _done = True
    if mb is None:
        mb = int(os.environ.get("SPARK_GRAFT_PREFAULT_MB", "256"))
    if mb <= 0:
        return
    import numpy as np

    arena = np.empty((mb * (1 << 20)) // 8, dtype=np.int64)
    arena[::512] = 1  # one touch per 4 KB page
    del arena
