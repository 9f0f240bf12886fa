"""The bounded-global-window convention, in one place.

Some windows in this engine are DELIBERATELY global: a rank over a k-row
top-k tie-set, numbering an n_cells centroid seed, a moving average over
calendar days, a z-score over hourly buckets.  Their input is bounded by
construction (k rows, |cells| rows, |days| rows — never the fact table),
so single-partition execution is the intended plan, not a hazard.

Every such site MUST use `bounded_global_window` instead of a bare
`Window.orderBy(...)`:

  * the constant partition key declares the intent at the call site;
  * `tests/test_plans.py::test_no_bare_global_windows` greps the package
    for bare `Window.orderBy(` and fails on any new one, so the
    convention is machine-checked, not comment-enforced;
  * the WindowExec "No Partition Defined" WARN is raised to ERROR in
    `session.build_spark` (the optimizer folds the constant partition
    away for frame aggregates, re-triggering the blanket WARN) — that
    override is safe ONLY while this helper + guard test keep genuinely
    unbounded global windows out of the codebase.

A window whose input can grow with the data does NOT belong here — give
it a real partition key.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F


def bounded_global_window(*order_cols) -> WindowSpec:
    """Single-partition window over a provably bounded input (see module
    doc).  Append `.rowsBetween(...)` / `.rangeBetween(...)` as needed."""
    return Window.partitionBy(F.lit(0)).orderBy(*order_cols)
