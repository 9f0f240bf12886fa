"""Streaming dynamic-PPR store #14 (foreachBatch + residual repair on
edge arrival).

`ppr_refresh.start_incremental_prep_refresh` maintains the
target-partitioned PPR view along the ACTIVITY axis (recompute the
dirty targets' columns).  This store maintains it along the GRAPH axis:
each microbatch of NEW EDGES updates the persisted reverse-push state
via `operators.dynamic_ppr.repair_on_insert` + an |r|-qualified resume
— never a from-scratch recompute (the repair touches only the batch's
source rows; see the 251x shuffle-volume study in PERF_NOTES).

Store layout (both halves epoch-partitioned, the repo's
replay-idempotent discipline):

    <store>/edges/epoch=N   the batch's genuinely-new edges (deduped)
    <store>/state/epoch=N   the FULL maintained state AFTER batch N
                            (target, node, residue, reserve)

Epoch N's handler reads the newest state with epoch < N and the union
of all edge partitions with epoch < N, so a REPLAYED epoch recomputes
the identical state from the same inputs and overwrites only its own
partitions; an edge RE-DELIVERED in a later epoch anti-joins against
the accumulated edge store and is applied exactly once (the repair
formula requires true insertions).  Persisting residues next to
reserves is what makes the store maintainable at all — the batch BASE
store drops them at write time and can only recompute.

Guarantee carried (pinned by tests): after every batch the state
satisfies the push validity identity EXACTLY on the accumulated graph
and |residue| <= rmax everywhere — the same estimate guarantee a
from-scratch preprocess provides, and at tight rmax the same values.

Scale shape: per batch two bounded repair joins + a few frontier-bounded
resume supersteps + one full-state partition write; `compact_store`
folds history (old states collapse to the newest folded one, old edge
partitions union) through the shared crash-safe `_store.compact_epochs`
protocol."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dynamic_ppr import repair_on_insert, reverse_push_state

_EDGE_SCHEMA = "src bigint, dst bigint, epoch bigint"
_STATE_SCHEMA = (
    "target bigint, node bigint, residue double, reserve double, "
    "epoch bigint"
)


def _edges_dir(store_path: str) -> str:
    return store_path.rstrip("/") + "/edges"


def _state_dir(store_path: str) -> str:
    return store_path.rstrip("/") + "/state"


def init_store(
    spark: SparkSession,
    store_path: str,
    edges: DataFrame,
    targets: DataFrame,
    rmax: float = 1e-4,
    alpha: float = 0.15,
    max_supersteps: int = 60,
) -> None:
    """Materialize epoch 0: the base edge set and the fresh reverse-push
    state over it."""
    st = reverse_push_state(
        spark, edges, targets, rmax, alpha, max_supersteps=max_supersteps
    )
    (
        edges.select("src", "dst")
        .distinct()
        .withColumn("epoch", F.lit(0).cast("long"))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(_edges_dir(store_path))
    )
    (
        st.withColumn("epoch", F.lit(0).cast("long"))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(_state_dir(store_path))
    )


def _load(spark: SparkSession, store_path: str):
    from ._store import recover_store

    recover_store(_edges_dir(store_path))
    recover_store(_state_dir(store_path))
    edges = spark.read.schema(_EDGE_SCHEMA).parquet(_edges_dir(store_path))
    state = spark.read.schema(_STATE_SCHEMA).parquet(_state_dir(store_path))
    return edges, state


def make_merge_batch(
    spark: SparkSession,
    store_path: str,
    rmax: float = 1e-4,
    alpha: float = 0.15,
    max_supersteps: int = 60,
):
    """The foreachBatch handler over an edge stream (src, dst), exposed
    so tests can drive an epoch (and replay it) directly."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        epoch_id = int(epoch_id) + 1  # epoch 0 is the init partition
        edges_all, state_all = _load(spark, store_path)
        prior_edges = (
            edges_all.where(F.col("epoch") < epoch_id)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        prev_epoch = (
            state_all.where(F.col("epoch") < epoch_id)
            .agg(F.max("epoch"))
            .collect()[0][0]
        )
        if prev_epoch is None:
            raise ValueError(
                f"dynamic-PPR store at {store_path} has no state before "
                f"epoch {epoch_id}: call init_store first"
            )
        prev_state = (
            state_all.where(F.col("epoch") == prev_epoch)
            .drop("epoch")
            .localCheckpoint(eager=True)
        )
        # genuinely-new edges only: the repair assumes true insertions,
        # so re-delivered edges must apply exactly once
        new = (
            batch_df.select(
                F.col("src").cast("long").alias("src"),
                F.col("dst").cast("long").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .join(prior_edges, ["src", "dst"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            st = prev_state
        else:
            rep = repair_on_insert(prev_state, prior_edges, new, alpha)
            st = reverse_push_state(
                spark,
                prior_edges.unionAll(new),
                None,
                rmax,
                alpha,
                max_supersteps=max_supersteps,
                state=rep,
                first_unconditional=False,
            )
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        (
            new.withColumn("epoch", F.lit(epoch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(_edges_dir(store_path))
        )
        (
            st.withColumn("epoch", F.lit(epoch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(_state_dir(store_path))
        )

    return merge_batch


def start_streaming_maintenance(
    spark: SparkSession,
    edge_stream: DataFrame,
    store_path: str,
    rmax: float = 1e-4,
    alpha: float = 0.15,
    query_name: str = "dynamic_ppr_store",
):
    """Start the maintenance stream over an (src, dst) edge stream;
    returns the StreamingQuery.  `init_store` must have run first."""
    merge_batch = make_merge_batch(spark, store_path, rmax=rmax, alpha=alpha)
    return (
        edge_stream.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .option("checkpointLocation", store_path.rstrip("/") + "_ckpt")
        .start()
    )


def read_state(spark: SparkSession, store_path: str) -> DataFrame:
    """(target, node, residue, reserve): the newest maintained state."""
    _, state_all = _load(spark, store_path)
    latest = state_all.agg(F.max("epoch")).collect()[0][0]
    if latest is None:
        raise ValueError(f"dynamic-PPR store at {store_path} is empty")
    return state_all.where(F.col("epoch") == latest).drop("epoch")


def read_ppr(
    spark: SparkSession, store_path: str, threshold: float = 0.0
) -> DataFrame:
    """(source, target, ppr): the BASE-view read over the newest state
    (reserves >= threshold, the Base_Whole_Graph.java:83 filter)."""
    st = read_state(spark, store_path)
    return st.where(F.col("reserve") >= threshold).select(
        F.col("node").alias("source"), "target", F.col("reserve").alias("ppr")
    )


def read_edges(spark: SparkSession, store_path: str) -> DataFrame:
    """(src, dst): the accumulated graph across every applied epoch."""
    edges_all, _ = _load(spark, store_path)
    return edges_all.select("src", "dst")


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold every epoch EXCEPT the newest in both halves via the shared
    crash-safe protocol: old edge partitions union into one, old states
    collapse to the NEWEST folded state (older states exist only for
    replay of epochs that can no longer replay once folded).  Run while
    the stream is stopped.  Returns partitions folded across both
    halves."""
    from ._store import compact_epochs

    def fold_edges(df: DataFrame) -> DataFrame:
        return df.select("src", "dst").distinct()

    def fold_states(df: DataFrame) -> DataFrame:
        latest = df.agg(F.max("epoch")).collect()[0][0]
        return df.where(F.col("epoch") == latest).drop("epoch")

    n = compact_epochs(spark, _edges_dir(store_path), _EDGE_SCHEMA, fold_edges)
    n += compact_epochs(
        spark, _state_dir(store_path), _STATE_SCHEMA, fold_states
    )
    return n
