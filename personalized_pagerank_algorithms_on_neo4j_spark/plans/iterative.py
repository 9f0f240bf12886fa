"""Superstep driver utilities for iterative DataFrame algorithms.

Spark has no native fixed-point operator; iterating `state = f(state)` naively
grows the logical plan linearly and Catalyst re-analyzes the whole lineage
every step (exponential analysis cost past ~50 joins). The fix is
``localCheckpoint`` cadence: materialize the state every ``checkpoint_every``
supersteps, truncating lineage. Old checkpoint blocks are released by Spark's
ContextCleaner once the previous DataFrame is dereferenced.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def static_superstep_plan(spark: SparkSession, shuffle_partitions: int | None = None):
    """Disable AQE for the duration of an iterative superstep loop.

    AQE re-plans every job from its runtime shuffle statistics — the right
    call for one-shot analytic queries, but a superstep loop runs tens of
    near-identical TINY jobs whose shuffle shape is fixed and known
    (state keyed by node against a pre-partitioned cached edge table), so
    per-job re-planning is pure overhead: measured 15-35% of the
    distributed power method's wall clock at sf0.1/local[32]. The previous
    setting is always restored (the bench's AQE-on default stays right for
    everything else).

    ``shuffle_partitions``: optional per-loop override. A superstep state
    frame is bounded by the graph's node count, which the caller knows
    up front; with AQE off inside the loop nothing coalesces tiny
    shuffles, so a loop over a small state pays ``default parallelism``
    near-empty tasks per stage. Callers pass a node-count-scaled value
    (see ``loop_shuffle_partitions``) — at small graphs this collapses to
    a few real tasks, at 10^9 nodes it clamps back to the session default,
    so the 100x plan is unchanged."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(shuffle_partitions)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


# Broadcast bounds shared by every iterative operator, kept in ONE place
# so retuning for a cluster is a single edit:
# - node-bounded frames (push frontiers, BFS visited fronts, HITS score
#   vectors): <= ~32 bytes/row -> ~32 MB at the bound;
# - edge-bounded tables (walk adjacency, oriented triangle edges):
#   <= ~16 bytes/row -> ~128 MB at the bound.
# Above the bounds every operator falls back to its shuffle plan, which is
# the right call at 10^9-row scale.
BROADCAST_NODE_BOUND = 1_000_000
BROADCAST_EDGE_BOUND = 8_000_000

# state rows a single superstep shuffle task should handle comfortably:
# supersteps are latency-bound at small state (task scheduling dominates)
# and memory-bound at large state (rows are a few dozen bytes each, so
# 200k rows/task is well under executor memory at any sane heap).
_ROWS_PER_SUPERSTEP_TASK = 200_000


def loop_shuffle_partitions(spark: SparkSession, state_rows: int) -> int:
    """Shuffle-partition count for a superstep loop whose state is bounded
    by ``state_rows`` (usually the graph's node count): enough tasks to
    keep partitions under ``_ROWS_PER_SUPERSTEP_TASK`` rows, never more
    than the session default (the cluster-sized setting wins at scale)."""
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    need = max(1, -(-int(state_rows) // _ROWS_PER_SUPERSTEP_TASK))
    return min(default, need)


def stats_reset_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` that also RESETS the plan-size
    statistics the checkpoint would otherwise carry forward.

    Why this exists: Spark's size-only stats visitor estimates a join as
    the PRODUCT of its children's ``sizeInBytes``, and
    ``Dataset.localCheckpoint`` preserves the optimized plan's stats into
    the new ``LogicalRDD`` (``LogicalRDD.fromDataset`` ->
    ``rewriteStatsAndConstraints``).  An iterative loop whose step joins
    the state frame WITH ITSELF (pointer-jumping label shortcuts, and any
    nesting where a loop's result frame feeds another loop's join, as in
    Borůvka's per-round component merges) therefore SQUARES the estimate
    every round: the BigInt's bit-length doubles, and by ~20 rounds the
    driver spends whole seconds per job on million-bit BigInt arithmetic
    inside stats propagation — measured here as 0.15 s -> 0.4 -> 2 -> 5 ->
    14 -> 41 -> 102 s per otherwise-identical 10 ms job (constant plan
    text, constant executor time; jstack pinned the time to
    ``LogicalRDD$.rewriteStatsAndConstraints``).  Plain state⋈edges loops
    only ADD bits per round (product with a fixed-size table) and never
    notice.

    The reset: checkpoint first (same materialization + lineage-cut
    semantics as everywhere else), then re-wrap the checkpointed
    ``InternalRow`` RDD in a FRESH ``LogicalRDD`` via
    ``SparkSession.internalCreateDataFrame`` — zero-copy, JVM-side, no
    extra job; the new node has no origin stats, so the estimate resets
    to the conservative session default (state frames in these loops are
    never auto-broadcast anyway — broadcasts here are explicit, gated
    hints).  ``internalCreateDataFrame`` is ``private[sql]`` in Scala,
    which compiles to a public JVM method; if a future Spark renames it,
    fall back to the plain checkpoint (correct, just exposed to the
    pathology again) — tests/test_plans pins the fast path so a silent
    fallback fails loudly in CI."""
    import py4j.protocol

    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf.sparkSession().internalCreateDataFrame(
            ck._jdf.queryExecution().toRdd(), ck._jdf.schema(), False
        )
        return DataFrame(jdf, df.sparkSession)
    except py4j.protocol.Py4JJavaError:  # pragma: no cover
        raise  # a REAL JVM failure must surface, not mask as fallback
    except py4j.protocol.Py4JError:  # pragma: no cover - rename drift only
        # ONLY the missing/renamed-method case falls back (a transient
        # JVM failure should surface, not silently reintroduce the
        # pathology); warn so a stalled bench run has a breadcrumb
        import warnings

        warnings.warn(
            "stats_reset_checkpoint: internalCreateDataFrame unavailable; "
            "falling back to a plain checkpoint — iterated self-join loops "
            "are re-exposed to the BigInt-stats driver stall",
            RuntimeWarning,
            stacklevel=2,
        )
        return ck


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
