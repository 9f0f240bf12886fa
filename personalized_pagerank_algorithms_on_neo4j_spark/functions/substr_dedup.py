"""Exact substring deduplication with REMOVAL SPANS (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

The reference engine (joezie/Personalized-PageRank-Algorithms-on-Neo4j)
deduplicates at whole-document granularity only; LLM training pipelines
additionally strip *cross-document repeated substrings* — the paper's
ExactSubstr variant removes every >= 50-token run that appears verbatim
in more than one document.  The paper builds a suffix array; a suffix
array is a sequential construction that does not distribute, so this
module computes the SAME span set with postings algebra, which does:

1. rolling-hash every n-token gram of every document (one md5 per
   TOKEN, then an O(1) Horner combine per gram — the winnowing
   construction of `functions.text`, minus the 40-bit pack: gram
   hashes keep the full < 2**53 modulus, so collisions are ~m^2/2^53),
2. keep the grams whose hash occurs in >= ``min_docs`` DISTINCT
   documents (one groupBy + semi join — a span shared by d documents
   costs d posting rows, never a d^2 pair expansion),
3. coalesce each document's surviving gram positions into maximal
   covered intervals with an islands-and-gaps window (a gram at
   position p covers tokens [p, p+n); a new island starts where p
   exceeds the running max of previous ends), and
4. emit intervals of at least ``min_span`` tokens as removal spans.

Equivalence to the suffix-array formulation: a token run of length
L >= n shared by two documents contributes exactly its L-n+1 grams to
step 2, and those positions are contiguous, so step 3 reconstructs the
maximal duplicated run (extended by any overlapping duplicated run —
the union-of-intervals the paper's remover also takes).  Runs shorter
than ``n`` tokens are invisible by construction: ``n`` IS the
granularity knob (the paper uses 50 BPE tokens; the gate fixture's
injected duplicates are shorter, so the driver query uses n=8).

Scale shape: one narrow posexplode (~|tokens| rows), one
groupBy(gram-hash) with map-side combine, one semi join back on the
hash, then doc-partitioned windows only — no self-join, no Python UDF,
no global window.  The doc-keyed repartition sits between the token-
hash and gram-hash projections for the same two reasons as
`text.winnow_fingerprints` (CollapseProject would re-md5 the document
once per gram; the window needs the doc-keyed exchange anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import PRIME53, portable_hash, tokens

# Horner multiplier shared with the winnowing rolling hash; the overflow
# argument is identical (acc < P < 2**53, A < 2**10, token hash < 2**28
# -> every intermediate < 2**63 in both engines).
_A = 521


def _gram_hashes(th, n: int):
    """array<long> rolling gram hashes over a BOUND token-hash array:
    Horner combine of n consecutive 28-bit token hashes mod PRIME53.
    Documents shorter than n tokens yield NULL (no gram — unlike the
    winnowing padding, a short document carries no substring-dedup
    signal and must not spuriously match another short document)."""

    def horner(i):
        acc = F.element_at(th, i + 1)
        for j in range(1, n):
            acc = (acc * F.lit(_A) + F.element_at(th, i + 1 + j)) % F.lit(
                PRIME53
            )
        return acc

    return F.when(
        F.size(th) >= n,
        F.transform(F.sequence(F.lit(0), F.size(th) - n), horner),
    )


def gram_postings(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, gh): one row per n-token gram occurrence, gram
    identity as the 53-bit rolling hash.  Positional and NOT distinct —
    repeated grams within a document cover each of their positions."""
    spark = df.sparkSession
    num = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    toks = tokens(F.lower(F.col(text_col)))
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.transform(toks, lambda t: portable_hash(t, hex_chars=7)).alias(
                "th"
            ),
        )
        # collapse barrier + the doc-keyed exchange the span window needs
        # anyway (see module docstring / winnow_fingerprints)
        .repartition(num, F.col("doc_id"))
        .select("doc_id", _gram_hashes(F.col("th"), n).alias("gs"))
    )
    # posexplode_outer, not posexplode: InferFiltersFromGenerate would
    # push a size(gs)>0 filter below the exchange with the whole gram
    # expression inlined over raw text (the O(tokens x grams) trap
    # measured in winnow_fingerprints)
    return base.select(
        "doc_id", F.posexplode_outer("gs").alias("pos", "gh")
    ).where(F.col("gh").isNotNull())


def substring_dedup_spans(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    min_span: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens, n_grams): maximal
    token intervals [span_start, span_end) covered by n-token grams that
    appear in >= ``min_docs`` distinct documents, at least ``min_span``
    tokens long — the removal spans of Lee et al.'s ExactSubstr dedup.
    ALL occurrences are flagged (every duplicated copy gets a span);
    keeping one canonical copy is the caller's survivorship policy, cf.
    `dedup.survivors_from_clusters`."""
    posts = gram_postings(df, n=n, text_col=text_col, id_col=id_col)
    dup = (
        posts.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
        .select("gh")
    )
    cov = posts.join(dup, "gh", "left_semi")
    return _covered_spans(cov, n, min_span)


def substring_contamination_spans(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    min_span: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens, n_grams): maximal
    intervals of TRAINING documents covered by n-token grams that appear
    anywhere in the BENCHMARK corpus — substring-granularity
    decontamination (the removal-span counterpart of
    `dedup.cross_corpus_contamination`'s whole-doc overlap fraction:
    Lee et al. 2022 recommend stripping the leaked run, not the doc).
    The bench gram set is DISTINCT hashes only (one narrow column) —
    candidate-generation + verify shape, never a doc-pair expansion."""
    tp = gram_postings(train, n=n, text_col=text_col, id_col=id_col)
    bp = (
        gram_postings(bench, n=n, text_col=text_col, id_col=id_col)
        .select("gh")
        .distinct()
    )
    cov = tp.join(bp, "gh", "left_semi")
    return _covered_spans(cov, n, min_span)


def _covered_spans(cov: DataFrame, n: int, min_span: int) -> DataFrame:
    """Islands-and-gaps merge of covered gram positions (doc_id, pos)
    into maximal >= min_span-token intervals — shared by the self-dedup
    and contamination flavors."""
    prev_end = F.max(F.col("pos") + n).over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
        .alias("brk")
    )
    isl = cov.select("doc_id", "pos", brk).select(
        "doc_id",
        "pos",
        F.sum("brk")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("island"),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("int")
            .alias("span_tokens"),
            F.col("n_grams").cast("long").alias("n_grams"),
        )
        .where(F.col("span_tokens") >= min_span)
    )


def _gram_ctes(prefix: str, docs_sql: str, n: int) -> str:
    """Shared oracle CTEs: ``{prefix}_g`` = (doc_id, pos, gh) gram
    postings of ``docs_sql`` — identical per-token md5 and Horner
    rolling combine mod PRIME53, identical no-pad-short-docs rule."""

    def horner(i: str) -> str:
        acc = f"th[{i}+1]"
        for j in range(1, n):
            acc = f"(({acc}) * {_A} + th[{i}+1+{j}]) % {PRIME53}"
        return acc

    return f"""{prefix}_src AS ({docs_sql}),
{prefix}_tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS t
          FROM {prefix}_src),
{prefix}_th AS (
  SELECT doc_id,
         list_transform(t, x ->
           CAST(('0x' || substring(md5(x || '#' || '0'), 1, 7)) AS BIGINT)
         ) AS th
  FROM {prefix}_tk WHERE len(t) >= {n}),
{prefix}_g AS (
  SELECT doc_id, CAST(i AS INT) AS pos, {horner('i')} AS gh
  FROM (SELECT doc_id, th, unnest(range(0, len(th) - {n} + 1)) AS i
        FROM {prefix}_th))"""


def substring_contamination_oracle_sql(
    train_sql: str,
    bench_sql: str,
    n: int = 8,
    min_span: int = 8,
) -> str:
    """DuckDB twin of `substring_contamination_spans`."""
    return f"""
WITH {_gram_ctes("sc_t", train_sql, n)},
{_gram_ctes("sc_b", bench_sql, n)},
sd_cov AS (
  SELECT g.doc_id, g.pos FROM sc_t_g g
  WHERE g.gh IN (SELECT DISTINCT gh FROM sc_b_g)),
{_span_tail_sql(n, min_span)}
"""


def substring_dedup_oracle_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    n: int = 8,
    min_docs: int = 2,
    min_span: int = 16,
) -> str:
    """DuckDB twin of `substring_dedup_spans` — identical per-token md5,
    identical Horner rolling combine mod PRIME53, identical
    no-pad-short-docs rule, identical islands-and-gaps span merge."""
    return f"""
WITH {_gram_ctes("sd", docs_sql, n)},
sd_dup AS (
  SELECT gh FROM sd_g GROUP BY gh
  HAVING COUNT(DISTINCT doc_id) >= {min_docs}),
sd_cov AS (SELECT g.doc_id, g.pos FROM sd_g g JOIN sd_dup USING (gh)),
{_span_tail_sql(n, min_span)}
"""


def _span_tail_sql(n: int, min_span: int) -> str:
    """Shared islands-and-gaps span merge over ``sd_cov`` (doc_id, pos)."""
    return f"""sd_isl AS (
  SELECT doc_id, pos,
    CASE WHEN MAX(pos + {n}) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR pos > MAX(pos + {n}) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    THEN 1 ELSE 0 END AS brk
  FROM sd_cov),
sd_isl2 AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM sd_isl),
sd_sp AS (
  SELECT doc_id,
         CAST(MIN(pos) AS INT) AS span_start,
         CAST(MAX(pos) + {n} AS INT) AS span_end,
         CAST(MAX(pos) + {n} - MIN(pos) AS INT) AS span_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM sd_isl2 GROUP BY doc_id, island)
SELECT doc_id, span_start, span_end, span_tokens, n_grams
FROM sd_sp WHERE span_tokens >= {min_span}
"""
