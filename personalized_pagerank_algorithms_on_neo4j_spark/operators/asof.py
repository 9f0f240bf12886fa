"""As-of join — a common OLAP operator Spark lacks natively.

Two physical strategies, selectable via ``strategy`` (mirroring the engine's
local/distributed auto-pick for PPR):

- ``ranked``: composition of built-in ops — equi join on the key + range
  filter + per-left-row rank. Right for *selective* keys: the inner join
  materializes every (left row x earlier right row) pair per key before the
  rank filter, so its cost is sum over keys of |L_k| * |R_k|.
- ``pandas``: `applyInPandas` over co-grouped keys using `pd.merge_asof` —
  the Arrow path for *dense* keys with long sorted runs, cost
  sum of (|L_k| log |L_k| + |R_k| log |R_k|). Crossover: once the average
  right rows per key exceeds a few hundred, the ranked join's per-key row
  multiplication dominates the Arrow transfer and in-pandas sort.
- ``auto``: one cheap aggregate estimates avg right rows per key
  (count / approx_count_distinct) and picks pandas past
  ``AUTO_DENSE_KEY_THRESHOLD``.

Both implement "backward" as-of semantics: for each left row, the latest
right row with right_ts <= left_ts (strict < optional), deterministic
tiebreak on `right_tiebreak`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

AUTO_DENSE_KEY_THRESHOLD = 256.0


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    right_cols: list[str] | None = None,
    strict: bool = False,
    how: str = "left",
    strategy: str = "ranked",
) -> DataFrame:
    """For each left row: latest right row (by right_ts, tiebreak desc) with
    right_ts <= left_ts (or < when strict)."""
    if strategy == "auto":
        stats = right.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(on).alias("k"),
        ).collect()[0]
        dense = stats["n"] / max(stats["k"], 1) > AUTO_DENSE_KEY_THRESHOLD
        strategy = "pandas" if (dense and how == "left") else "ranked"
    if strategy == "pandas":
        if how != "left":
            raise ValueError("pandas strategy implements how='left' only")
        return asof_join_pandas(
            left, right, on, left_ts, right_ts,
            right_cols=right_cols, right_tiebreak=right_tiebreak, strict=strict,
        )

    rcols = right_cols or [c for c in right.columns if c != on]
    # tag each left row with a unique id so duplicate left rows keep their
    # multiplicity (a window over the left *columns* would merge them);
    # materialize the ids before the plan forks — `lid` is referenced twice
    # (building `matched` and the final join-back), and a re-evaluated
    # monotonically_increasing_id over a shuffled lineage could assign
    # different ids to each branch
    lid = left.withColumn("_lid", F.monotonically_increasing_id()).localCheckpoint(
        eager=True
    )
    r = right.select(F.col(on).alias("_k"), *[F.col(c).alias(f"r_{c}") for c in rcols])
    cond = (F.col(on) == F.col("_k")) & (
        (F.col(f"r_{right_ts}") < F.col(left_ts))
        if strict
        else (F.col(f"r_{right_ts}") <= F.col(left_ts))
    )
    j = lid.join(r, cond, "inner")
    w = Window.partitionBy("_lid").orderBy(
        F.desc(f"r_{right_ts}"), F.desc(f"r_{right_tiebreak}")
    )
    matched = (
        j.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn", "_k")
    )
    if how == "inner":
        return matched.drop("_lid")
    out = lid.join(
        matched.select("_lid", *[f"r_{c}" for c in rcols]), "_lid", "left"
    )
    return out.drop("_lid")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """merge_asof per co-grouped key (Arrow-batched; sorts inside pandas).

    Left-join semantics. Ties on right_ts resolve to the max
    ``right_tiebreak`` (sort ascending + merge_asof-takes-last), matching the
    ranked strategy's desc-tiebreak."""
    import pandas as pd

    if right_tiebreak is not None and right_tiebreak not in right.columns:
        # fail fast like the ranked strategy (F.desc on a missing column
        # raises); silently dropping the tiebreak would make tie resolution
        # depend on arbitrary pandas sort order, run to run
        raise ValueError(
            f"right_tiebreak column {right_tiebreak!r} not in right columns "
            f"{right.columns}"
        )
    rcols = right_cols or [c for c in right.columns if c != on]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"r_{f.name} {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name in rcols
        ]
    )
    lts, rts, tie = left_ts, right_ts, right_tiebreak

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(lts)
        sort_keys = [rts] + ([tie] if tie else [])
        r_sorted = r_pdf.sort_values(sort_keys)[
            [rts] + [c for c in rcols if c != rts]
        ]
        r_sorted = r_sorted.rename(columns={c: f"r_{c}" for c in r_sorted.columns})
        out = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=lts,
            right_on=f"r_{rts}",
            direction="backward",
            allow_exact_matches=not strict,
        )
        return out

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(
        lambda l, r: merge(l, r), schema=out_schema
    )
