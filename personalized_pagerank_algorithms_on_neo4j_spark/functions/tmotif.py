"""Temporal motif counting — time-respecting 2-paths and triangles with
a gap bound (Paranjape, Benson & Leskovec, WSDM'17 delta-temporal
motifs, restricted to the chain/cycle shapes).

The streaming-graph analytics ask: over a temporal edge stream
(src, dst, t), count instances of

* 2-path  u -t1-> v -t2-> w   with t1 < t2 <= t1 + delta, w != u
* triangle: the 2-path closed by w -t3-> u with t2 < t3 <= t1 + delta

attributed to the MID node v (one output row per mid: the per-node
temporal-brokerage profile, a far sharper correctness gate than two
global counts).  Counts are over EDGE INSTANCES — repeated (u, v) edges
at different times each count, the motif-literature convention.

Scale shape: two equi-joins.  The wedge join keys on the mid node (the
time band is a post-filter on the hash join, never a nested loop —
Spark keeps the equi keys); the closing join keys on the FULL (src, dst)
node pair plus the band, so it is selective by construction.  Like
`link_prediction_scores`, the wedge join's skew exposure is the mid's
degree: ``hub_cap`` drops the WEDGE ROWS of mids whose in- OR
out-instance count exceeds the cap — the hot mid loses its own output
rows, every other mid's counts are untouched, including wedges riding
edges incident to a hub (default None = exact; the registered query
leaves it off).  Everything is integer seconds (Spark ts.cast('long')
== DuckDB FLOOR(epoch(ts)), the engine-wide floor-second idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temporal_edges_from_events(
    events: DataFrame, n_pages: int = 97
) -> DataFrame:
    """(src, dst, t): the page-handoff temporal edge stream — consecutive
    events on the same page (the event_id % n_pages fixture shared with
    the URL queries) connect their users, stamped with the LATER event's
    floor-second time; self-handoffs drop.  One lag window per page, no
    join."""
    ev = events.select(
        (F.col("event_id") % n_pages).alias("page"),
        F.col("user_id").alias("u"),
        F.col("ts"),
        F.col("event_id"),
    )
    w = Window.partitionBy("page").orderBy("ts", "event_id")
    hand = ev.select(
        F.col("u").alias("src"),
        F.lead("u").over(w).alias("dst"),
        # NTZ-safe floor-second epoch: the session is pinned to UTC by the
        # table loader, so this equals DuckDB's FLOOR(epoch(ts))
        F.lead(F.col("ts").cast("timestamp").cast("long")).over(w).alias("t"),
    )
    return hand.where(
        F.col("dst").isNotNull() & (F.col("src") != F.col("dst"))
    )


def temporal_motif_counts(
    edges: DataFrame, delta_s: int, hub_cap: int | None = None
) -> DataFrame:
    """(mid, n_paths, n_triangles): per-mid-node counts of delta-bounded
    temporal 2-paths and their closing triangles (module doc)."""
    e = edges.select("src", "dst", "t").where(F.col("src") != F.col("dst"))
    e = e.localCheckpoint(eager=True)  # feeds both join sides + the close
    a = e.select(
        F.col("src").alias("u"), F.col("dst").alias("mid"), F.col("t").alias("t1")
    )
    b = e.select(
        F.col("src").alias("mid"), F.col("dst").alias("w"), F.col("t").alias("t2")
    )
    if hub_cap is not None:
        # drop only WEDGES through hot mids (in- OR out-instance count
        # above the cap): the hot mid's own rows vanish, every other
        # mid's counts are untouched — edges incident to a hub still
        # close triangles for surviving mids (r9 review finding #3: the
        # previous edge-level filter silently changed neighbours' counts)
        hot = (
            e.groupBy(F.col("dst").alias("mid"))
            .agg(F.count(F.lit(1)).alias("d_in"))
            .where(F.col("d_in") > hub_cap)
            .select("mid")
            .unionAll(
                e.groupBy(F.col("src").alias("mid"))
                .agg(F.count(F.lit(1)).alias("d_out"))
                .where(F.col("d_out") > hub_cap)
                .select("mid")
            )
            .distinct()
        )
        a = a.join(F.broadcast(hot), "mid", "left_anti")
        b = b.join(F.broadcast(hot), "mid", "left_anti")
    paths = a.join(b, "mid").where(
        (F.col("t2") > F.col("t1"))
        & (F.col("t2") <= F.col("t1") + F.lit(delta_s))
        & (F.col("w") != F.col("u"))
    )
    n_paths = paths.groupBy("mid").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    c = e.select(
        F.col("src").alias("w"), F.col("dst").alias("u"), F.col("t").alias("t3")
    )
    n_tris = (
        paths.join(c, ["w", "u"])
        .where(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + F.lit(delta_s))
        )
        .groupBy("mid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        n_paths.join(n_tris, "mid", "left")
        .select(
            "mid",
            "n_paths",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def temporal_motifs_oracle_sql(
    delta_s: int, n_pages: int = 97, events_table: str = "events"
) -> str:
    """DuckDB twin: identical handoff derivation, wedge and closing
    joins, and per-mid aggregation."""
    return f"""
WITH tm_ev AS (
  SELECT event_id % {n_pages} AS page, user_id AS u, ts, event_id
  FROM {events_table}
),
tm_hand AS (
  SELECT u AS src,
         LEAD(u) OVER (PARTITION BY page ORDER BY ts, event_id) AS dst,
         LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY page ORDER BY ts, event_id) AS t
  FROM tm_ev
),
tm_e AS MATERIALIZED (
  SELECT src, dst, t FROM tm_hand WHERE dst IS NOT NULL AND src <> dst
),
tm_paths AS MATERIALIZED (
  SELECT a.src AS u, a.dst AS mid, b.dst AS w, a.t AS t1, b.t AS t2
  FROM tm_e a JOIN tm_e b ON a.dst = b.src
  WHERE b.t > a.t AND b.t <= a.t + {delta_s} AND b.dst <> a.src
),
tm_np AS (
  SELECT mid, CAST(COUNT(*) AS BIGINT) AS n_paths FROM tm_paths GROUP BY 1
),
tm_nt AS (
  SELECT p.mid, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM tm_paths p JOIN tm_e c ON c.src = p.w AND c.dst = p.u
  WHERE c.t > p.t2 AND c.t <= p.t1 + {delta_s}
  GROUP BY 1
)
SELECT np.mid, np.n_paths, COALESCE(nt.n_triangles, 0) AS n_triangles
FROM tm_np np LEFT JOIN tm_nt nt ON np.mid = nt.mid
"""
