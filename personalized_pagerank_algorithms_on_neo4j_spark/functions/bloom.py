"""Portable Bloom-filter membership sketch (array-of-words, md5 hashes).

The fixed-size alternative to `dedup.cross_corpus_contamination`'s exact
shingle anti-join: at 100 TB the benchmark-shingle set may itself be huge,
but a Bloom filter over it is a constant-size bit array that BROADCASTS to
every executor — probing is then a narrow map over the corpus with zero
shuffle on the benchmark side (false positives only, never false negatives,
so it is a safe pre-filter: anything bloom-negative is guaranteed clean, the
small bloom-positive remainder can be exact-checked).

Portability discipline (see `text.portable_hash`): every hash is md5-based,
bit indices are pure integer arithmetic, and words are 48-bit so all
`2^bit` terms stay far below 2^53 — Spark longs wrap silently on overflow
while DuckDB BIGINTs raise, so portable pipelines must never overflow. The
whole build/probe pipeline therefore replays exactly in ANSI SQL (DuckDB
`bit_or` aggregate + floor/pow bit tests) for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import portable_hash

WORD_BITS = 48  # bits packed per word: 2^47 < 2^53 keeps pow() exact


def _bit_index(value: Column, seed: int, m_bits: int) -> Column:
    return portable_hash(value, seed) % F.lit(m_bits)


def bloom_build(
    values: DataFrame,
    value_col: str,
    m_bits: int,
    k_hashes: int = 3,
) -> DataFrame:
    """(word_idx, word): the filter as <= m_bits/48 packed words.

    One explode (x k_hashes) + one `bit_or` groupBy — map-side combine
    collapses each partition to at most m_bits/48 rows before the exchange,
    so the shuffle is filter-sized, not data-sized."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    bits = values.select(
        F.explode(
            F.array(
                *[
                    _bit_index(F.col(value_col), s, m_bits).alias("b")
                    for s in range(k_hashes)
                ]
            )
        ).alias("bit")
    )
    return (
        bits.select(
            (F.col("bit") / F.lit(WORD_BITS)).cast("long").alias("word_idx"),
            F.pow(F.lit(2.0), (F.col("bit") % F.lit(WORD_BITS)).cast("double"))
            .cast("long")
            .alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("word"))
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int,
    k_hashes: int = 3,
    result_col: str = "maybe_member",
) -> DataFrame:
    """Adds `maybe_member` (boolean): true iff ALL k bits are set.

    The filter side is broadcast (constant-size by construction); each of
    the k bit-tests is its own broadcast equi join on word_idx plus a
    floor/pow bit extraction — the candidate side flows through with ZERO
    exchanges (an explode + re-group would shuffle candidate-sized data
    back together for no reason)."""
    out = candidates
    hit_cols = []
    for s in range(k_hashes):
        bit = _bit_index(F.col(value_col), s, m_bits)
        out = (
            out.withColumn(f"_i{s}", (bit / F.lit(WORD_BITS)).cast("long"))
            .withColumn(f"_b{s}", (bit % F.lit(WORD_BITS)).cast("double"))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word_idx").alias(f"_i{s}"),
                        F.col("word").alias(f"_w{s}"),
                    )
                ),
                f"_i{s}",
                "left",
            )
        )
        hit_cols.append(
            (
                F.floor(
                    F.coalesce(F.col(f"_w{s}"), F.lit(0))
                    / F.pow(F.lit(2.0), F.col(f"_b{s}"))
                )
                % 2
            )
            == 1
        )
    all_set = hit_cols[0]
    for h in hit_cols[1:]:
        all_set = all_set & h
    return out.select(*candidates.columns, all_set.alias(result_col))


def bloom_oracle_build_sql(
    values_sql: str, value_expr: str, m_bits: int, k_hashes: int = 3
) -> str:
    """DuckDB CTE body replaying `bloom_build` over `values_sql`."""
    hash48 = (
        lambda s: f"CAST(('0x' || substring(md5({value_expr} || '#' || '{s}'), 1, 12)) AS BIGINT)"
    )
    bit_exprs = " UNION ALL ".join(
        f"SELECT {hash48(s)} % {m_bits} AS bit FROM vals" for s in range(k_hashes)
    )
    return f"""vals AS MATERIALIZED ({values_sql}),
bloom AS MATERIALIZED (
  SELECT bit // {WORD_BITS} AS word_idx,
         bit_or(CAST(POW(2.0, bit % {WORD_BITS}) AS BIGINT)) AS word
  FROM ({bit_exprs}) GROUP BY 1)"""


def bloom_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    m_bits: int = WORD_BITS * 4096,
    k_hashes: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_sh, n_maybe, maybe_rate): per corpus document, the share
    of its shingles that are bloom-POSSIBLE members of the benchmark shingle
    set — the sketch-based twin of `dedup.cross_corpus_contamination`. Upper
    bounds the exact contamination (FPs only); bloom-negative docs are
    guaranteed clean, so this is the cheap first pass before an exact check
    of the (small) positive remainder."""
    from .dedup import _doc_shingles

    cs = _doc_shingles(corpus.dropDuplicates([id_col]), text_col, id_col, n)
    bs = _doc_shingles(bench, text_col, id_col, n).select("sh").distinct()
    bloom = bloom_build(bs, "sh", m_bits, k_hashes)
    probed = bloom_probe(cs, bloom, "sh", m_bits, k_hashes)
    return probed.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sum(F.col("maybe_member").cast("long")).alias("n_maybe"),
        F.round(
            F.sum(F.col("maybe_member").cast("long"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("maybe_rate"),
    )
