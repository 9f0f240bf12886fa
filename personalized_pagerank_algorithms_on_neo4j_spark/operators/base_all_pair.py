"""All-Pair-Backward-Search ("BASE") preprocessing + lookup (I7).

Reference: Base_Whole_Graph.java:57-186. For every node t, run Backward
Search (I4) from t; invert the result into (source=v, target=t, pi) triples;
keep pi >= threshold (whole-graph mode) or the per-source sorted top-k
(top-k mode, Base_Whole_Graph.java:133-162); persist per source; queries
become per-source reads.

Spark-first design: the reference's sequential for-every-t loop
(Base_Whole_Graph.java:64) is one `backward_search_all` job over a targets
DataFrame — all reverse pushes advance in the same supersteps, keyed
(target, node). The store is source-partitioned Parquet, so the read path
(`readPreprocessedPPR`, Base_Whole_Graph.java:167-186) is a partition-pruned
scan. rmax for the search derives from the threshold: rmax = threshold
(the reference passes the configured rmax; Gen_Util.java:190 sweeps it as the
"threshold" parameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_ALPHA
from ..graph import PropertyGraph
from ..sources.prep_store import read_prep, write_prep
from .backward_search import backward_search_all
from .topk import retrieve_topk


def base_preprocess(
    graph: PropertyGraph,
    threshold: float,
    rmax: float | None = None,
    alpha: float = DEFAULT_ALPHA,
    k: int | None = None,
    targets: DataFrame | None = None,
    mode: str = "auto",
) -> DataFrame:
    """Materialize the all-pair PPR view. Returns (source, target, ppr [, rank]).

    k=None: whole-graph mode — threshold filter (Base_Whole_Graph.java:83).
    k>=0:   top-k mode — per-source tie-aware top-k, rank column kept
            (Base_Whole_Graph.java:133-162).

    mode='auto' picks the driver-local per-target vectorized kernel below the
    broadcast-like cutoff (identical batch-superstep schedule), else the
    single multi-target distributed job.
    """
    rmax = threshold if rmax is None else rmax
    if targets is None:
        targets = graph.nodes.select(F.col("id").alias("target"))
    if mode == "auto":
        mode = "local" if graph.fits_local() else "distributed"
    if mode == "local":
        all_pairs = _base_all_local(graph, targets, rmax, alpha)
    else:
        # pi(v -> t): invert to (source=v, target=t)
        all_pairs = backward_search_all(graph, targets, rmax, alpha).select(
            F.col("node").alias("source"), "target", "ppr"
        )
    if k is None:
        return all_pairs.where(F.col("ppr") >= F.lit(threshold))
    # per-source tie-aware top-k: rank() over a window PARTITIONED by source
    # scales (each partition sorts locally), unlike the global-window case
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("ppr"), F.asc("target"))
    return (
        all_pairs.withColumn("rank", F.rank().over(w))
        .where(F.col("rank") <= k)
    )


def _base_all_local(
    graph: PropertyGraph, targets: DataFrame, rmax: float, alpha: float
) -> DataFrame:
    """Per-target vectorized reverse-push kernels on the CSR snapshot."""
    import numpy as np
    import pandas as pd

    from . import _kernels

    lg = graph.local
    tids = [r["target"] for r in targets.select("target").collect()]
    srcs: list = []
    tgts: list = []
    pprs: list = []
    for t in tids:
        pi, _, _ = _kernels.backward_search_batch(lg, lg.dense(int(t)), alpha, rmax)
        nz = np.where(pi > 0)[0]
        srcs.append(lg.ids[nz])
        tgts.append(np.full(len(nz), int(t), dtype=np.int64))
        pprs.append(pi[nz])
    if not srcs:
        return graph.spark.createDataFrame(
            [], "source long, target long, ppr double"
        )
    pdf = pd.DataFrame(
        {
            "source": np.concatenate(srcs),
            "target": np.concatenate(tgts),
            "ppr": np.concatenate(pprs),
        }
    )
    return graph.spark.createDataFrame(pdf, "source long, target long, ppr double")


def base_preprocess_to_store(
    graph: PropertyGraph,
    path: str,
    threshold: float,
    alpha: float = DEFAULT_ALPHA,
    k: int | None = None,
) -> None:
    write_prep(base_preprocess(graph, threshold, alpha=alpha, k=k), path)


def base_lookup(graph: PropertyGraph, path: str, source: int) -> DataFrame:
    """Whole-graph query from the prep store (partition-pruned read)."""
    return read_prep(graph.spark, path, source=source).select(
        F.col("target").alias("node"), "ppr"
    )


def base_topk_lookup(
    graph: PropertyGraph, path: str, source: int, k: int
) -> DataFrame:
    """Top-k query from a (pre-sorted) prep store (Base_Whole_Graph.java:213-217)."""
    df = base_lookup(graph, path, source)
    return retrieve_topk(df, k)
