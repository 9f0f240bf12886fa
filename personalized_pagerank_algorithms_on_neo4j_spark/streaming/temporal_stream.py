"""Streaming maintenance of the decayed user<->event-type affinity graph.

Batch `functions/funnel.decayed_bipartite_edges` ages every event against
the corpus max timestamp — a quantity that CHANGES as a stream advances, so
its per-event weights cannot be accumulated incrementally as-is.  This
module applies the standard fix, *forward decay* (Cormode, Shkapenyuk,
Srivastava, Xu — "Forward Decay: A Practical Time Decay Model for Streaming
Systems", ICDE 2009): store per-pair sums of the landmark-anchored
numerator

    g(ts) = 0.5^((t0 - ts) / half_life)          (t0 = fixed landmark)

and apply the single factor 0.5^((anchor - t0) / half_life) at READ time,
where `anchor` is the max event timestamp the store has seen.  Because

    0.5^((anchor - ts)/hl) = g(ts) * 0.5^((anchor - t0)/hl),

the read-side weights equal the batch operator's decayed weights — exactly
when t0 == anchor (identical per-event rounding), and to within one
micro-unit of the final scaling otherwise (numerators are rounded at t0,
the batch operator rounds at anchor; the integer SUM itself is exact and
order-independent either way).

Store layout follows the house replay-idempotent pattern
(anomaly_stream.py): each micro-batch writes ONLY its own
``epoch=<epoch_id>`` partition — (u, tname, fnum, max_ts_us) rows, fnum in
BIGINT micro-units — via dynamic partition overwrite, so an at-least-once
replay rewrites identical rows instead of double-counting; `compact_store`
folds all-but-newest epochs through the crash-safe directory swap.

int64 headroom: fnum <= n_events_per_pair * 1e6 * 2^((anchor-t0)/hl), so
keep the landmark within ~40 half-lives of the newest event (re-landmark
by rebuilding the store if a stream outlives that; a multiply-and-reround
rebase would add documented drift and is deliberately not offered).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.windows import bounded_global_window

_STORE_SCHEMA = "u bigint, tname string, fnum bigint, max_ts_us bigint, epoch bigint"


def _batch_numerators(
    batch_df: DataFrame, t0_us: int, half_life_days: float
) -> DataFrame:
    """(u, tname, fnum, max_ts_us): per-pair forward-decay numerator sums
    for one micro-batch — same per-event micro-unit rounding discipline as
    the batch operator, anchored at the landmark instead of the corpus
    max.  NULL event types are dropped (they never form an edge)."""
    hl_us = half_life_days * 86400.0e6
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = F.round(
        F.lit(1.0e6) * F.pow(F.lit(0.5), (F.lit(int(t0_us)) - ts_us) / F.lit(hl_us))
    ).cast("bigint")
    return (
        batch_df.where(F.col("event_type").isNotNull())
        .groupBy(
            F.col("user_id").cast("bigint").alias("u"),
            F.col("event_type").alias("tname"),
        )
        .agg(F.sum(g).alias("fnum"), F.max(ts_us).alias("max_ts_us"))
    )


def make_edge_merge_batch(
    spark: SparkSession, store_path: str, t0_us: int, half_life_days: float = 7.0
):
    """The foreachBatch handler, exposed so tests can drive and replay
    epochs directly without a running stream."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ._store import recover_store

        recover_store(store_path)
        part = _batch_numerators(batch_df, t0_us, half_life_days).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        )
        if part.isEmpty():
            return
        (
            part.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(store_path)
        )

    return merge_batch


def start_decayed_edge_refresh(
    events: DataFrame,
    store_path: str,
    t0_us: int,
    half_life_days: float = 7.0,
    query_name: str = "decayed_edge_refresh",
):
    """Maintain the forward-decay edge store from an event stream."""
    spark = events.sparkSession
    return (
        events.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(make_edge_merge_batch(spark, store_path, t0_us, half_life_days))
        .start()
    )


def read_decayed_edges(
    spark: SparkSession,
    store_path: str,
    t0_us: int,
    half_life_days: float = 7.0,
    type_base: int = 1_000_000_000,
) -> DataFrame:
    """(src, dst, weight): the decayed bipartite graph as of the newest
    event in the store — the streaming twin of
    `decayed_bipartite_edges` (bit-identical when t0 == store anchor).
    Type-node ids use the same name-ranked type_base + k scheme."""
    from ._store import recover_store

    recover_store(store_path)
    merged = (
        spark.read.schema(_STORE_SCHEMA)
        .parquet(store_path)
        .groupBy("u", "tname")
        .agg(F.sum("fnum").alias("fnum"), F.max("max_ts_us").alias("max_ts_us"))
        .localCheckpoint(eager=True)  # read for anchor + types + weights
    )
    anchor_us = merged.agg(F.max("max_ts_us").alias("_a"))
    hl_us = half_life_days * 86400.0e6
    scale = F.pow(F.lit(0.5), (F.col("_a") - F.lit(int(t0_us))) / F.lit(hl_us))
    types = (
        merged.select("tname")
        .distinct()
        .select(
            "tname",
            (F.lit(type_base) + F.row_number().over(bounded_global_window("tname")))
            .cast("bigint")
            .alias("_tid"),
        )
    )
    pair_w = (
        merged.crossJoin(F.broadcast(anchor_us))
        .join(F.broadcast(types), "tname")
        .select(
            "u",
            F.col("_tid").alias("t"),
            F.round(F.col("fnum") * scale).cast("bigint").alias("weight"),
        )
        .where(F.col("weight") > 0)
    )
    return pair_w.select(
        F.col("u").alias("src"), F.col("t").alias("dst"), "weight"
    ).unionAll(
        pair_w.select(F.col("t").alias("src"), F.col("u").alias("dst"), "weight")
    )


def temporal_ppr_from_store(
    spark: SparkSession,
    store_path: str,
    source: int,
    t0_us: int,
    half_life_days: float = 7.0,
    type_base: int = 1_000_000_000,
    iterations: int = 10,
    alpha: float = 0.15,
) -> DataFrame:
    """Temporal PPR served straight off the streaming edge store."""
    from ..operators.pagerank import pagerank_weighted

    edges = read_decayed_edges(
        spark, store_path, t0_us, half_life_days, type_base
    )
    df = pagerank_weighted(edges, iterations=iterations, alpha=alpha, source=source)
    return df.select("node", F.round("score", 9).alias("score")).where(
        F.col("score") > 0
    )


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Fold every epoch but the newest into one merged ``epoch=-1``
    partition (the -1 sentinel can never collide with a replayed epoch
    id; the newest epoch stays verbatim because only IT can replay after
    a restart).  Run while the stream is stopped.  Crash-safe via the
    _precompact/_compacting directory-swap protocol shared with
    anomaly_stream/topk_stream.  Returns the number of epoch partitions
    folded away (0 = nothing to do)."""
    from ._store import compact_epochs

    return compact_epochs(
        spark,
        store_path,
        _STORE_SCHEMA,
        lambda df: df.groupBy("u", "tname").agg(
            F.sum("fnum").alias("fnum"), F.max("max_ts_us").alias("max_ts_us")
        ),
    )
