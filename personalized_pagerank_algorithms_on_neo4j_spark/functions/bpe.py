"""BPE merge-rule induction — tokenizer-vocabulary training as a Spark
iterative operator.

Byte-pair-encoding training (Sennrich et al., ACL'16) is the canonical
tokenizer-vocab step of an LLM data pipeline: repeatedly count adjacent
symbol pairs over the corpus, take the most frequent pair, fuse every
occurrence, repeat.  Each round here is pure DataFrame work — one
split+explode pair count with map-side combine, a 1-ROW argmax collect
(the only driver traffic: one (lhs, rhs, n) triple per round), and one
literal `replace` projection over the corpus — so the loop scales like
any other superstep verb: the corpus never leaves the cluster, rounds
are O(corpus) narrow work plus one k²-bounded aggregate.

Exact cross-engine contract (what makes the DuckDB twin byte-identical):

* the symbol stream is a DOUBLE-SPACE-delimited string
  ("␣␣tok␣␣tok␣␣") and a merge of (l, r) is the literal replacement
  "␣l␣␣r␣" -> "␣lr␣".  Both engines' `replace` scan left-to-right
  without re-examining replaced text, and the double-space delimiter
  means consecutive occurrences share NO characters — so every
  occurrence fuses in one pass except chain-overlaps ("a a a" fuses
  greedily left, exactly BPE's behaviour).  A single-space scheme is
  WRONG: " a b a b " shares the middle delimiter between occurrences
  and both engines then fuse only the first (verified; hence the
  double-space design).
* pair selection = max count, ties broken by (lhs, rhs) ascending —
  binary string order, identical for the ASCII token corpus in both
  engines; counts are overlapping-pair counts (standard BPE).
* the round count is FIXED (no early exit), so the oracle unrolls the
  identical recurrence.

Output: (step, lhs, rhs, n) — the ordered merge table, which IS the
trained tokenizer artifact (apply-side tokenizers replay it in order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

BPE_ROUNDS = 8


def _stream(col):
    """Double-space-delimited symbol stream (see module doc)."""
    return F.concat(
        F.lit("  "), F.array_join(tokens(F.lower(col)), "  "), F.lit("  ")
    )


def bpe_merges(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
) -> DataFrame:
    """(step, lhs, rhs, n): the first ``rounds`` BPE merge rules learned
    from the corpus, in training order.  Whitespace-token symbols (the
    engine's `tokens` convention) rather than bytes — symbol granularity
    is a knob, the recurrence is the operator."""
    spark = docs.sparkSession
    texts = docs.select(_stream(F.col(text_col)).alias("s")).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(rounds):
        toks = F.split(F.trim(F.col("s")), "  ")
        pairs = (
            texts.select(toks.alias("t"))
            .select(
                F.posexplode_outer(
                    F.zip_with(
                        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                        F.slice(
                            F.col("t"),
                            2,
                            F.greatest(F.size("t") - 1, F.lit(0)),
                        ),
                        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                    )
                ).alias("_p", "pr")
            )
            .where(F.col("pr").isNotNull())
            .select("pr.lhs", "pr.rhs")
        )
        best = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:  # corpus of <2-token docs: nothing left to learn
            break
        l, r, n = best[0]["lhs"], best[0]["rhs"], best[0]["n"]
        merges.append((step, l, r, n))
        texts = texts.select(
            F.replace(
                F.col("s"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
            ).alias("s")
        ).localCheckpoint(eager=True)  # next round re-reads it twice
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, n bigint"
    )


def bpe_merges_oracle_sql(
    docs_sql: str = "SELECT text FROM documents",
    rounds: int = BPE_ROUNDS,
) -> str:
    """DuckDB twin: the identical fixed-round recurrence unrolled as
    chained CTEs (stream build, per-round pair argmax, literal replace
    through a 1-row cross join)."""
    parts = [
        f"""bpe_t0 AS MATERIALIZED (
  SELECT '  ' || array_to_string(string_split_regex(trim(lower(text)), ' +'), '  ')
         || '  ' AS s
  FROM ({docs_sql}) d
)"""
    ]
    for i in range(rounds):
        parts.append(
            f"""bpe_b{i} AS MATERIALIZED (
  SELECT t.toks[i] AS lhs, t.toks[i+1] AS rhs, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT toks, unnest(range(1, len(toks))) AS i
    FROM (SELECT string_split(trim(s), '  ') AS toks FROM bpe_t{i}) x
  ) t
  GROUP BY 1, 2
  ORDER BY n DESC, lhs ASC, rhs ASC
  LIMIT 1
)"""
        )
        if i < rounds - 1:
            parts.append(
                f"""bpe_t{i + 1} AS MATERIALIZED (
  SELECT replace(t.s, ' ' || b.lhs || '  ' || b.rhs || ' ',
                 ' ' || b.lhs || b.rhs || ' ') AS s
  FROM bpe_t{i} t CROSS JOIN bpe_b{i} b
)"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, lhs, rhs, n FROM bpe_b{i}" for i in range(rounds)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


def bpe_compression(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_before, n_after): per-document symbol counts before and
    after applying the ``rounds`` learned merge rules in training order —
    the apply side of `bpe_merges` (train -> tokenize is the pipeline; the
    before/after delta is the vocab's corpus-compression value, the metric
    a tokenizer ablation actually reports).

    The merge table is a ``rounds``-row driver-side artifact (the same
    1-row-per-round collects training already did), so application is a
    chain of ``rounds`` literal `replace` projections — one corpus scan,
    no joins, no shuffle; counting symbols is one split+size expression
    on each side of the chain."""
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges(docs, rounds, text_col).orderBy("step").collect()
    ]
    out = docs.select(
        F.col("doc_id"), _stream(F.col(text_col)).alias("s")
    ).withColumn("n_before", F.size(F.split(F.trim("s"), "  ")).cast("long"))
    for l, r in merges:
        out = out.withColumn(
            "s", F.replace(F.col("s"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
        )
    return out.select(
        "doc_id",
        "n_before",
        F.size(F.split(F.trim("s"), "  ")).cast("long").alias("n_after"),
    )


def bpe_compression_oracle_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    rounds: int = BPE_ROUNDS,
) -> str:
    """DuckDB twin of `bpe_compression`: re-derives the merge table with
    the `bpe_merges_oracle_sql` recurrence, then applies the same chained
    replaces (the merge chain is unrolled per round through 1-row cross
    joins, exactly as training produced it)."""
    parts = [
        f"""bpa_t0 AS MATERIALIZED (
  SELECT doc_id,
         '  ' || array_to_string(string_split_regex(trim(lower(text)), ' +'), '  ')
         || '  ' AS s
  FROM ({docs_sql}) d
)"""
    ]
    for i in range(rounds):
        parts.append(
            f"""bpa_b{i} AS MATERIALIZED (
  SELECT t.toks[i] AS lhs, t.toks[i+1] AS rhs
  FROM (
    SELECT toks, unnest(range(1, len(toks))) AS i
    FROM (SELECT string_split(trim(s), '  ') AS toks FROM bpa_t{i}) x
  ) t
  GROUP BY 1, 2
  ORDER BY COUNT(*) DESC, lhs ASC, rhs ASC
  LIMIT 1
)"""
        )
        # LEFT JOIN ON TRUE, not CROSS JOIN: when a round's argmax CTE is
        # empty (merge-exhausted corpus), the stream must pass through
        # unchanged — a cross join would empty every later CTE and emit
        # zero rows while the Spark twin still returns one row per doc
        parts.append(
            f"""bpa_t{i + 1} AS MATERIALIZED (
  SELECT t.doc_id,
         COALESCE(replace(t.s, ' ' || b.lhs || '  ' || b.rhs || ' ',
                          ' ' || b.lhs || b.rhs || ' '), t.s) AS s
  FROM bpa_t{i} t LEFT JOIN bpa_b{i} b ON TRUE
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT a.doc_id,
       CAST(len(string_split(trim(a.s), '  ')) AS BIGINT) AS n_before,
       CAST(len(string_split(trim(z.s), '  ')) AS BIGINT) AS n_after
FROM bpa_t0 a JOIN bpa_t{rounds} z ON a.doc_id = z.doc_id
"""
    )
