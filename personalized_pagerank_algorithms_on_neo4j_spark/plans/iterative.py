"""Superstep driver utilities for iterative DataFrame algorithms.

Spark has no native fixed-point operator; iterating `state = f(state)` naively
grows the logical plan linearly and Catalyst re-analyzes the whole lineage
every step (exponential analysis cost past ~50 joins). The fix is
``localCheckpoint`` cadence: materialize the state every ``checkpoint_every``
supersteps, truncating lineage. Old checkpoint blocks are released by Spark's
ContextCleaner once the previous DataFrame is dereferenced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SuperstepLoop:
    """Tracks iteration count and applies checkpoint cadence."""

    def __init__(self, checkpoint_every: int = 4):
        self.checkpoint_every = checkpoint_every
        self._step = 0
        self._prev: DataFrame | None = None

    def materialize(self, state: DataFrame, force: bool = False) -> DataFrame:
        self._step += 1
        if force or self._step % self.checkpoint_every == 0:
            new = state.localCheckpoint(eager=True)
            self._prev = new  # dereference the old one -> ContextCleaner frees it
            return new
        return state
