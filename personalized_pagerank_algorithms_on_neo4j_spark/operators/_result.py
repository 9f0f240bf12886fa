"""Shared result-shaping helpers for the PPR operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..graph import PropertyGraph

_RESULT_SCHEMA = "node long, ppr double"


def ppr_result_from_dense(graph: PropertyGraph, pi: np.ndarray) -> DataFrame:
    """Dense kernel output -> sparse DataFrame(node, ppr), ppr > 0 only
    (the reference's HashMap results never hold zero entries)."""
    lg = graph.local
    nz = np.where(pi > 0)[0]
    pdf = pd.DataFrame({"node": lg.ids[nz], "ppr": pi[nz]})
    return graph.spark.createDataFrame(pdf, schema=_RESULT_SCHEMA)


def ppr_result_from_state(state: DataFrame) -> DataFrame:
    """(node, residue, reserve) state -> (node, ppr) with ppr > 0."""
    from pyspark.sql import functions as F

    return state.where(F.col("reserve") > 0).select(
        "node", F.col("reserve").alias("ppr")
    )


def union_frames(frames, spark, empty_schema: str):
    """Fold a list of same-schema frames with unionByName; an empty list
    yields an empty frame of ``empty_schema``.  One home for the
    accumulate-winners tail the MIS / coloring / matching loops share,
    so the fallback schema and the union flavor cannot drift apart."""
    if not frames:
        return spark.createDataFrame([], empty_schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
