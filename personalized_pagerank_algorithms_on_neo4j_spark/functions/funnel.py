"""Event-funnel conversion analysis over the `events` table shape.

A funnel ("view -> click -> purchase") asks, per user, whether the FIRST
occurrence of each step happened in order; the report is users-reaching-step
counts plus conversion rate from the top of the funnel.

Scale shape: ONE shuffle. The per-user first-occurrence timestamps for every
step are conditional `min` aggregates in a single `groupBy(user)` (map-side
combine collapses each partition to one row per user before the exchange).
The ordered-reach flags and the per-step counts are then narrow expressions
plus a k-row global aggregate — no self-joins, no window over the raw event
log (the classic funnel-as-k-way-self-join is quadratic in skewed users; the
conditional-aggregate form is linear and portable to any SQL engine, which
is also what makes the DuckDB oracle a direct transliteration).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, reached): deepest step index (1-based) reached *in order* by
    each user; 0 if the user never did step 1. Ordered means
    first(step_1) <= first(step_2) <= ... <= first(step_i)."""
    firsts = (
        events.where(F.col(type_col).isin(steps))
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            *[
                F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
                for i, s in enumerate(steps)
            ]
        )
    )
    # reached = largest i such that every _t0.._ti is non-null and ordered
    reach = F.lit(0)
    cond = F.lit(True)
    for i in range(len(steps)):
        c = F.col(f"_t{i}").isNotNull()
        if i > 0:
            c = c & (F.col(f"_t{i}") >= F.col(f"_t{i-1}"))
        cond = cond & c
        reach = F.when(cond, F.lit(i + 1)).otherwise(reach)
    return firsts.select("user", reach.alias("reached"))


def funnel_report(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, n_users, conversion): users reaching each step in
    order, and the share of step-1 users still present (ROUND 6)."""
    reach = funnel_reach(events, steps, ts_col, user_col, type_col)
    counts = reach.groupBy().agg(
        *[
            F.sum((F.col("reached") >= i + 1).cast("long")).alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    spark = events.sparkSession
    idx = spark.range(len(steps)).select(
        (F.col("id") + 1).cast("int").alias("step_idx"),
        F.element_at(
            F.array(*[F.lit(s) for s in steps]), (F.col("id") + 1).cast("int")
        ).alias("step"),
    )
    wide = idx.crossJoin(F.broadcast(counts))
    n_users = F.coalesce(
        F.element_at(
            F.array(*[F.col(f"_n{i}") for i in range(len(steps))]), F.col("step_idx")
        ),
        F.lit(0),
    ).cast("long")
    return wide.select(
        "step_idx",
        "step",
        n_users.alias("n_users"),
        F.when(F.col("_n0") > 0, F.round(n_users / F.col("_n0"), 6))
        .otherwise(F.lit(0.0))
        .alias("conversion"),
    )


def event_transitions(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(src, dst, n, prob): first-order Markov transition matrix over each
    user's time-ordered event stream.

    Scale shape: ONE wide shuffle — the lag window partitions by user (same
    key a sessionizer would use, so an upstream repartition(user) is reused);
    the (src, dst) aggregate is at most k x k rows for k event types, with
    map-side combine collapsing each partition first. Row-normalization is a
    window over those k^2 rows — driver-scale, never the fact table.
    Ordering ties on `ts` break by `tiebreak_col` so the matrix is
    deterministic under any partitioning."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.lag(F.col(type_col)).over(w).alias("src"),
        F.col(type_col).alias("dst"),
    ).where(F.col("src").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("prob"),
    )


def retention_cohorts(
    events: DataFrame,
    cohort_event: str = "signup",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(cohort, week_offset, n_users): classic weekly retention triangle.

    cohort = the Monday-truncated week of the user's first `cohort_event`;
    a user counts in offset k if they did ANY event during cohort+k weeks.
    Three aggregates and one user-keyed join — the cohort side is one row
    per user (broadcastable while users fit; shuffle-on-user beyond), the
    activity side is pre-shrunk to distinct (user, week) before the join.
    Week truncation is Monday-start in both Spark and DuckDB, so offsets are
    exact multiples of 7 days — integer arithmetic, no rounding."""
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731
    cohorts = (
        events.where(F.col(type_col) == cohort_event)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(wk(F.col(ts_col))).alias("cohort_wk"))
    )
    activity = events.select(
        F.col(user_col).alias("user"), wk(F.col(ts_col)).alias("wk")
    ).distinct()
    return (
        activity.join(cohorts, "user")
        .where(F.col("wk") >= F.col("cohort_wk"))
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort"),
            (F.datediff("wk", "cohort_wk") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user")).alias("n_users"))
    )


def _decay_age_days(events: DataFrame, ts_col: str) -> tuple[DataFrame, Column]:
    """(anchor frame, age-in-days column): the shared decay scaffolding —
    corpus-max-timestamp anchor (deterministic, no wall clock) and the
    exact-integer-microsecond age expression.  One definition keeps
    `decayed_user_scores` and `decayed_bipartite_edges` (and their DuckDB
    twins' `epoch_us(...)/86400.0e6` fragment) in lockstep."""
    anchor = events.agg(F.max(ts_col).alias("_anchor"))
    # exact integer MICROSECONDS on both engines (a plain seconds cast
    # truncates sub-second fractions that DuckDB's epoch() keeps); session
    # TZ is UTC, matching DuckDB's naive-timestamp epoch
    epoch_us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    age_days = (epoch_us(F.col("_anchor")) - epoch_us(F.col(ts_col))) / F.lit(
        86400.0e6
    )
    return anchor, age_days


def decayed_user_scores(
    events: DataFrame,
    half_life_days: float = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, n_events, score): exponentially recency-weighted engagement.

    Each event contributes value * 0.5^(age_days / half_life), aged against
    the corpus's max timestamp (a deterministic anchor — no wall clock, so
    reruns and engines agree). One scalar aggregate (the anchor, broadcast)
    + one groupBy(user) — the decay is a per-row expression, map-side.
    Cross-engine determinism: age in exact integer seconds, per-event
    weight ROUND(_, 9), per-user score ROUND(_, 6)."""
    anchor, age_days = _decay_age_days(events, ts_col)
    weight = F.round(
        F.coalesce(F.col(value_col), F.lit(0.0))
        * F.pow(F.lit(0.5), age_days / F.lit(half_life_days)),
        9,
    )
    return (
        events.crossJoin(F.broadcast(anchor))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(weight), 6).alias("score"),
        )
    )


def decayed_scores_oracle_sql(
    half_life_days: float = 7.0,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB twin of `decayed_user_scores` (epoch-second age, same
    rounding)."""
    return f"""
WITH anchor AS (SELECT MAX({ts_col}) AS a FROM {table})
SELECT {user_col} AS user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(ROUND(COALESCE({value_col}, 0.0)
             * POWER(0.5, (epoch_us(anchor.a) - epoch_us({ts_col})) / 86400.0e6
                          / {half_life_days}), 9)), 6) AS score
FROM {table} CROSS JOIN anchor
GROUP BY {user_col}
"""


def event_paths(
    events: DataFrame,
    length: int = 3,
    min_count: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(step_1..step_N, n): frequent length-N event paths over each user's
    time-ordered stream — the sequence-mining step up from the first-order
    `event_transitions` matrix (a path says "search -> click -> purchase",
    which no product of bigram probabilities can).

    Scale shape: the SAME single user-partitioned lag window the
    transition matrix uses (N-1 lead() expressions ride ONE window, one
    shuffle); the path aggregate is at most k^N rows for k event types —
    still vocabulary-bounded, never fact-table-bounded — and ``min_count``
    keeps the report to paths with support.  Ties on `ts` break by
    `tiebreak_col` so paths are deterministic under any partitioning.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    steps = [F.col(type_col).alias("step_1")] + [
        F.lead(F.col(type_col), i).over(w).alias(f"step_{i + 1}")
        for i in range(1, length)
    ]
    names = [f"step_{i + 1}" for i in range(length)]
    return (
        events.select(*steps)
        .where(F.col(names[-1]).isNotNull())
        .groupBy(*names)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= min_count)
    )


def event_paths_oracle_sql(
    length: int = 3,
    min_count: int = 5,
    table: str = "events",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of `event_paths`."""
    leads = ", ".join(
        f"LEAD({type_col}, {i}) OVER w AS step_{i + 1}"
        for i in range(1, length)
    )
    names = ", ".join(f"step_{i + 1}" for i in range(length))
    return f"""
WITH seq AS (
  SELECT {type_col} AS step_1, {leads}
  FROM {table}
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {tiebreak_col})
)
SELECT {names}, CAST(COUNT(*) AS BIGINT) AS n
FROM seq
WHERE step_{length} IS NOT NULL
GROUP BY {names}
HAVING COUNT(*) >= {min_count}
"""


def decayed_bipartite_edges(
    events: DataFrame,
    half_life_days: float = 7.0,
    type_base: int = 1_000_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(src, dst, weight): recency-decayed user <-> event-type affinity
    edges — the graph input for temporal personalized PageRank.

    Each event contributes 0.5^(age_days / half_life) to its (user, type)
    pair, aged against the corpus max timestamp (deterministic anchor, no
    wall clock); per-pair contributions are summed and the edge is emitted
    in BOTH directions (user -> type node and type -> user), so PPR from a
    user ranks event types by that user's recent behaviour AND other users
    by shared recent behaviour.  Event-type nodes get ids
    type_base + dense-rank(type name) so they never collide with user ids.

    Cross-engine determinism: the per-event decay is one scalar IEEE
    expression on exact integer microsecond ages, rounded to BIGINT
    MICRO-UNITS (same float-free-contract discipline as betweenness /
    source_divergence) — the per-pair SUM is integer arithmetic, exact in
    any order, and weight / W(u) inside `pagerank_weighted` is then a
    bit-exact division of identical integers in both engines.  Events
    older than ~20 half-lives round to 0 micro-units and are dropped
    (they contribute nothing; `pagerank_weighted` rejects w <= 0).

    Scale shape: one scalar anchor aggregate (broadcast), one tiny
    distinct-types rank (|types| rows, broadcast back), ONE
    groupBy(user, type) with map-side combine, and a 2x narrow union for
    the reverse direction — no window over the event log."""
    from ..plans.windows import bounded_global_window

    anchor, age_days = _decay_age_days(events, ts_col)
    micro = F.round(
        F.lit(1.0e6) * F.pow(F.lit(0.5), age_days / F.lit(half_life_days))
    ).cast("bigint")
    # |types|-row rank: deterministic name order, ids offset by type_base.
    # NULL types are dropped BEFORE the rank: Spark orders NULLS FIRST and
    # DuckDB's ROW_NUMBER defaults to NULLS LAST, so a stray NULL would
    # shift every real type's id by one on exactly one engine.
    types = (
        events.select(F.col(type_col).alias("_type"))
        .where(F.col(type_col).isNotNull())
        .distinct()
        .select(
            "_type",
            (
                F.lit(type_base)
                + F.row_number().over(bounded_global_window("_type"))
            ).cast("bigint").alias("_tid"),
        )
    )
    pair_w = (
        events.crossJoin(F.broadcast(anchor))
        .join(F.broadcast(types), F.col(type_col) == F.col("_type"))
        .groupBy(
            F.col(user_col).cast("bigint").alias("u"), F.col("_tid").alias("t")
        )
        .agg(F.sum(micro).alias("weight"))
        .where(F.col("weight") > 0)
    )
    return pair_w.select(
        F.col("u").alias("src"), F.col("t").alias("dst"), "weight"
    ).unionAll(
        pair_w.select(F.col("t").alias("src"), F.col("u").alias("dst"), "weight")
    )


def decayed_bipartite_edges_sql(
    half_life_days: float = 7.0,
    type_base: int = 1_000_000_000,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of `decayed_bipartite_edges` (same anchor, same
    micro-unit rounding, same type-id ranking)."""
    return f"""
SELECT src, dst, weight FROM (
  WITH anchor AS (SELECT MAX({ts_col}) AS a FROM {table}),
  types AS (
    SELECT {type_col} AS tname,
           CAST({type_base} + ROW_NUMBER() OVER (ORDER BY {type_col}) AS BIGINT)
             AS tid
    FROM (SELECT DISTINCT {type_col} FROM {table}
          WHERE {type_col} IS NOT NULL)
  ),
  pair_w AS (
    SELECT CAST(e.{user_col} AS BIGINT) AS u, t.tid AS t,
           CAST(SUM(CAST(ROUND(1.0e6 * POWER(0.5,
               (epoch_us(anchor.a) - epoch_us(e.{ts_col})) / 86400.0e6
               / {half_life_days})) AS BIGINT)) AS BIGINT) AS weight
    FROM {table} e CROSS JOIN anchor
    JOIN types t ON e.{type_col} = t.tname
    GROUP BY u, t.tid
    HAVING weight > 0
  )
  SELECT u AS src, t AS dst, weight FROM pair_w
  UNION ALL
  SELECT t AS src, u AS dst, weight FROM pair_w
)
"""


# ---------------------------------------------------------------------------
# Per-user transition graph -> Markov communicating classes (feeds gds.scc)
# ---------------------------------------------------------------------------

TRANSITION_NODE_STRIDE = 8  # > |event types|; node id = user * stride + rank


def type_ranks(events: DataFrame, type_col: str = "event_type") -> DataFrame:
    """(tname, rank): 0-based alphabetical dense rank of the DISTINCT event
    types — the ONE rank table both the composite-id encode
    (`user_transition_edges`) and decode (`markov_communicating_classes`)
    read, so the round trip is structurally bit-identical.  NULL types are
    dropped BEFORE ranking (Spark orders NULLS FIRST, DuckDB's ROW_NUMBER
    defaults NULLS LAST — the `decayed_bipartite_edges` lesson; a stray
    NULL would shift every real rank on exactly one engine)."""
    from ..plans.windows import bounded_global_window

    return (
        events.select(F.col(type_col).alias("tname"))
        .where(F.col(type_col).isNotNull())
        .distinct()
        .select(
            "tname",
            (F.row_number().over(bounded_global_window("tname")) - 1)
            .cast("long")
            .alias("rank"),
        )
    )


def type_ranks_sql(table: str = "events", type_col: str = "event_type") -> str:
    """DuckDB twin of `type_ranks` (same NULL drop, same 0-based order) —
    a parenthesized subquery fragment."""
    return (
        f"(SELECT tname, ROW_NUMBER() OVER (ORDER BY tname) - 1 AS rank"
        f" FROM (SELECT DISTINCT {type_col} AS tname FROM {table}"
        f" WHERE {type_col} IS NOT NULL) s)"
    )


def user_transition_edges(
    events: DataFrame,
    max_gap_seconds: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(src, dst) directed edges of the per-user event-type transition
    graph, in one composite id space: node = user * STRIDE + type_rank
    (type ranks 0..k-1 by alphabetical order — identical in any engine).

    The SCCs of this graph are the communicating classes of each user's
    first-order Markov chain (`event_transitions` is the same chain's
    probability matrix) — recurrent behavior sets per user, e.g. a user
    whose tail is an error loop forms a class the earlier funnel states
    can't re-enter.

    Scale shape: the SAME single user-partitioned lag window every
    sequence op here uses (one shuffle over the fact table), a broadcast
    join against the k-row type-rank table (`type_ranks` — NULL-safe,
    shared with the decode side), then DISTINCT on at most k^2 x users
    rows.  Ties on `ts` break by `tiebreak_col`.  Raises if the distinct
    type count reaches TRANSITION_NODE_STRIDE: composite ids would
    silently collide across users and the oracle, modeling the identical
    formula, could NOT catch it (both engines would agree on corrupt
    ids)."""
    ranks = type_ranks(events, type_col).localCheckpoint(eager=True)
    n_types = ranks.count()
    if n_types >= TRANSITION_NODE_STRIDE:
        raise ValueError(
            f"{n_types} distinct {type_col} values >= TRANSITION_NODE_STRIDE="
            f"{TRANSITION_NODE_STRIDE}: composite node ids would collide "
            "across users — raise the stride"
        )
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.col(user_col).cast("long").alias("u"),
        F.lag(F.col(type_col)).over(w).alias("a"),
        F.col(type_col).alias("b"),
        (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(F.lag(F.col(ts_col)).over(w).cast("timestamp"))
        ).alias("gap_us"),
    ).where(F.col("a").isNotNull())
    if max_gap_seconds is not None:
        # exact integer microseconds (the _decay_age_days discipline) —
        # no float boundary, bit-identical filter in both engines
        pairs = pairs.where(
            F.col("gap_us") <= F.lit(int(max_gap_seconds) * 1_000_000)
        )
    stride = F.lit(TRANSITION_NODE_STRIDE)
    ranks_a = ranks.select(F.col("tname").alias("a"), F.col("rank").alias("ra"))
    ranks_b = ranks.select(F.col("tname").alias("b"), F.col("rank").alias("rb"))
    return (
        pairs.join(F.broadcast(ranks_a), "a")
        .join(F.broadcast(ranks_b), "b")
        .select(
            (F.col("u") * stride + F.col("ra")).alias("src"),
            (F.col("u") * stride + F.col("rb")).alias("dst"),
        )
        .distinct()
    )


def user_transition_edges_sql(
    table: str = "events",
    max_gap_seconds: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of `user_transition_edges` (same ranks, same stride,
    same gap filter — epoch-second difference in both engines)."""
    s = TRANSITION_NODE_STRIDE
    gap = (
        f"AND epoch_us(t.ts_b) - epoch_us(t.ts_a) <= "
        f"{int(max_gap_seconds) * 1_000_000}"
        if max_gap_seconds is not None
        else ""
    )
    return f"""
SELECT DISTINCT CAST(t.u * {s} + ra.rank AS BIGINT) AS src,
       CAST(t.u * {s} + rb.rank AS BIGINT) AS dst
FROM (
  SELECT CAST({user_col} AS BIGINT) AS u,
         LAG({type_col}) OVER (PARTITION BY {user_col}
                               ORDER BY {ts_col}, {tiebreak_col}) AS a,
         {type_col} AS b,
         LAG({ts_col}) OVER (PARTITION BY {user_col}
                             ORDER BY {ts_col}, {tiebreak_col}) AS ts_a,
         {ts_col} AS ts_b
  FROM {table}
) t
JOIN {type_ranks_sql(table, type_col)} ra
  ON t.a = ra.tname
JOIN {type_ranks_sql(table, type_col)} rb
  ON t.b = rb.tname
WHERE t.a IS NOT NULL {gap}
"""


def funnel_report_oracle_sql(steps: list[str]) -> str:
    """DuckDB twin of ``funnel_report`` (first-touch ordered funnel over
    the events table): per-user first timestamp per step, reached =
    deepest prefix whose first-touches are non-decreasing, then step
    counts and conversion vs step 1."""
    if len(steps) < 2:
        # With one step the n_users picker would emit a zero-branch
        # `CASE s.step_idx ELSE n0 END`, which DuckDB rejects; a funnel
        # needs at least two steps to be a funnel.
        raise ValueError("funnel_report_oracle_sql needs >= 2 steps")
    in_list = ", ".join(f"'{s}'" for s in steps)
    firsts = ",\n         ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN ts END) AS t{i}"
        for i, s in enumerate(steps)
    )
    reach_cases = []
    for depth in range(len(steps), 1, -1):
        conds = [f"t0 IS NOT NULL"]
        for i in range(1, depth):
            conds.append(f"t{i} IS NOT NULL AND t{i} >= t{i - 1}")
        reach_cases.append(f"WHEN {' AND '.join(conds)} THEN {depth}")
    reach = "\n    ".join(reach_cases)
    counts = ",\n         ".join(
        f"CAST(SUM(CASE WHEN reached >= {i + 1} THEN 1 ELSE 0 END) AS BIGINT) AS n{i}"
        for i in range(len(steps))
    )
    values = ", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(steps))
    pick = " ".join(
        f"WHEN {i + 1} THEN n{i}" for i in range(len(steps) - 1)
    ) + f" ELSE n{len(steps) - 1}"
    return f"""
WITH firsts AS (
  SELECT user_id AS u,
         {firsts}
  FROM events WHERE event_type IN ({in_list})
  GROUP BY 1
),
reach AS (
  SELECT CASE
    {reach}
    WHEN t0 IS NOT NULL THEN 1
    ELSE 0 END AS reached
  FROM firsts
),
counts AS (
  SELECT {counts}
  FROM reach
)
SELECT s.step_idx, s.step,
       CASE s.step_idx {pick} END AS n_users,
       CASE WHEN n0 > 0
            THEN ROUND(CAST(CASE s.step_idx {pick} END AS DOUBLE) / n0, 6)
            ELSE 0.0 END AS conversion
FROM (VALUES {values}) AS s(step_idx, step)
CROSS JOIN counts
"""


USER_SESSIONS_ORACLE_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id
"""


EVENT_TRANSITIONS_ORACLE_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
counts AS (
  SELECT src, dst, COUNT(*) AS n FROM pairs WHERE src IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 6) AS prob
FROM counts
"""

RETENTION_COHORTS_ORACLE_SQL = """
WITH cohorts AS (
  SELECT user_id AS u, MIN(date_trunc('week', ts)) AS cohort_wk
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
activity AS (
  SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS wk FROM events
)
SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort,
       CAST(date_diff('day', c.cohort_wk, a.wk) // 7 AS INT) AS week_offset,
       COUNT(DISTINCT a.u) AS n_users
FROM activity a JOIN cohorts c ON a.u = c.u
WHERE a.wk >= c.cohort_wk
GROUP BY 1, 2
"""
