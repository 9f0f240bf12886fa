"""Sequence packing and document chunking for LLM training-data pipelines.

Two ends of the "fit documents into fixed token windows" problem:

- `chunk_documents` — split long documents into overlapping fixed-size token
  windows (the retrieval / long-doc-training shape). Pure per-row explode:
  no shuffle, no state, trivially scale-out.
- `pack_sequences` — assign documents to fixed-token-budget packs (the
  "concat then chunk" pretraining shape). Greedy sequential packing is
  inherently serial, so the scale design hash-buckets documents first and
  packs by CUMULATIVE-INTERVAL within each bucket: a document's pack is
  `floor(cum_tokens_before / budget)`. One window function over each
  bucket — no driver state, deterministic under repartitioning, and each
  bucket packs independently on its executor. A document may straddle a
  pack boundary (it belongs to the pack its interval starts in), exactly
  like the standard concat-and-chunk pretraining loader; packs are
  therefore full to within one document's tail.
- `mixture_rebalance` — downsample sources to a target mixture. The
  largest output satisfying target proportions keeps
  `T = min_s(count_s / target_s)` total rows; each source keeps
  `T * target_s` of its rows via the portable ppm hash filter — the same
  per-row, shuffle-free selection discipline as `sampling.hash_sample`
  (selection is stable under reruns and engine changes). The per-source
  thresholds come from one tiny aggregate broadcast back over the corpus:
  one shuffle of k rows, one scan.

- `token_budget_mix` — greedy quality-ordered per-source prefix under a
  token budget, decomposed through quality bands so the doc-level window
  never spans a whole source (see the function docstring).

All four are cross-engine exact: integer token counts, integer ppm
thresholds, and the md5-based `portable_hash` shared with the DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .sampling import BUCKETS, _bucket
from .text import tokens

__all__ = [
    "chunk_documents",
    "pack_sequences",
    "mixture_rebalance",
    "token_budget_mix",
    "span_corruption_targets",
    "span_corruption_oracle_sql",
]


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens): overlapping token windows.

    Window i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last window is short iff the
    document doesn't fill it. Documents shorter than one chunk yield
    exactly one chunk. Tokenized with `text.tokens` (trim + ' +' split),
    so n_tokens sums agree with `text.token_count` / bm25 / corpus_report
    for the same document; chunk_text joins tokens with a single space,
    i.e. runs of whitespace are normalized."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # ceil((n - chunk) / stride) + 1 extra windows beyond the first
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + F.lit(1)
    )
    out = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    ).select(
        id_col,
        "chunk_id",
        F.array_join(
            F.slice(
                "_toks", F.col("chunk_id") * stride + 1, F.lit(chunk_tokens)
            ),
            " ",
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens),
            F.size("_toks") - F.col("chunk_id") * stride,
        ).cast("long").alias("n_tokens"),
    )
    return out


def chunk_oracle_sql(
    chunk_tokens: int = 64,
    overlap: int = 16,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `chunk_documents` (list slicing is 1-based inclusive
    on both engines)."""
    stride = chunk_tokens - overlap
    return f"""
WITH toks AS (
  SELECT {id_col}, string_split_regex(trim({text_col}), ' +') AS t FROM {table}
),
counted AS (
  SELECT {id_col}, t,
         CASE WHEN len(t) <= {chunk_tokens} THEN 1
              ELSE CAST(CEIL((len(t) - {chunk_tokens}) / {stride}.0) AS INT) + 1
         END AS n_chunks
  FROM toks
)
SELECT {id_col},
       CAST(g.i AS INT) AS chunk_id,
       array_to_string(t[g.i * {stride} + 1 : g.i * {stride} + {chunk_tokens}], ' ') AS chunk_text,
       CAST(LEAST({chunk_tokens}, len(t) - g.i * {stride}) AS BIGINT) AS n_tokens
FROM counted, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) g
"""


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 512,
    n_buckets: int = 32,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """(id, bucket, pack, pack_offset, n_tokens): interval packing.

    Documents are hash-bucketed (pack parallelism = n_buckets; at cluster
    scale set this >= total cores), ordered by id within the bucket, and a
    document starting at cumulative offset c lands in pack floor(c /
    budget) at offset c % budget. The (bucket, pack) pair is the pack key.
    One window aggregation per bucket — the whole operator is a single
    shuffle by bucket. Token counts use `text.tokens` (trim + ' +'), the
    same tokenizer as `text.token_count`; pass ``n_tokens_col`` when an
    upstream stage already counted tokens (e.g. `token_budget_mix`'s
    `n_tok`) so the text is not re-tokenized."""
    toks = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col
        else F.size(tokens(F.col(text_col))).cast("long")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            (_bucket(F.col(id_col), seed) % F.lit(n_buckets)).alias("bucket"),
            toks.alias("n_tokens"),
        )
        .withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            id_col,
            "bucket",
            F.floor(F.col("cum_before") / F.lit(budget_tokens)).alias("pack"),
            (F.col("cum_before") % F.lit(budget_tokens)).alias("pack_offset"),
            "n_tokens",
        )
    )


def pack_oracle_sql(
    budget_tokens: int = 512,
    n_buckets: int = 32,
    seed: int = 0,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `pack_sequences`."""
    from .sampling import sampling_oracle_fragments

    bucket = f"({sampling_oracle_fragments(seed, id_col)}) % {n_buckets}"
    return f"""
WITH b AS (
  SELECT {id_col}, {bucket} AS bucket,
         CAST(len(string_split_regex(trim({text_col}), ' +')) AS BIGINT) AS n_tokens
  FROM {table}
),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM b
)
SELECT {id_col}, bucket,
       CAST(FLOOR(cum_before / {budget_tokens}) AS BIGINT) AS pack,
       CAST(cum_before % {budget_tokens} AS BIGINT) AS pack_offset,
       n_tokens
FROM c
"""


def mixture_rebalance(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Downsample to the largest subset matching the target source mixture.

    The binding source s* = argmin(count_s / target_s) is kept whole; every
    other source keeps `round(min_ratio * target_s / count_s * 1e6)` ppm of
    its rows by portable hash. Sources absent from `targets` drop. The
    thresholds derive from one k-row aggregate (k = #sources) joined back
    broadcast — no driver round-trip, no RNG."""
    if not targets:
        raise ValueError("targets must be non-empty")
    tgt = df.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())],
        f"{source_col} string, _target double",
    )
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
        .join(F.broadcast(tgt), source_col)
        .withColumn("_ratio", F.col("_cnt") / F.col("_target"))
    )
    min_ratio = counts.agg(F.min("_ratio").alias("_min_ratio"))
    thresholds = counts.crossJoin(F.broadcast(min_ratio)).select(
        source_col,
        F.round(
            F.col("_min_ratio") * F.col("_target") / F.col("_cnt") * F.lit(BUCKETS)
        ).cast("long").alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .where(_bucket(F.col(id_col), seed) < F.col("_thr"))
        .drop("_thr")
    )


def mixture_oracle_sql(
    targets: dict[str, float],
    table: str = "documents",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB twin of `mixture_rebalance` (identical double arithmetic —
    both engines compute min_ratio * target / count * 1e6 in IEEE doubles
    then ROUND, so thresholds agree bit-for-bit)."""
    from .sampling import sampling_oracle_fragments

    vals = ", ".join(f"('{k}', {float(v)!r})" for k, v in sorted(targets.items()))
    bucket = sampling_oracle_fragments(seed, id_col)
    return f"""
WITH tgt({source_col}, _target) AS (VALUES {vals}),
counts AS (
  SELECT d.{source_col}, CAST(COUNT(*) AS DOUBLE) AS _cnt, t._target
  FROM {table} d JOIN tgt t USING ({source_col})
  GROUP BY d.{source_col}, t._target
),
thr AS (
  SELECT {source_col},
         CAST(ROUND((SELECT MIN(_cnt / _target) FROM counts)
                    * _target / _cnt * {BUCKETS}) AS BIGINT) AS _thr
  FROM counts
)
SELECT d.* FROM {table} d
JOIN thr USING ({source_col})
WHERE ({bucket}) < _thr
"""


def token_budget_mix(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budgeted mixture selection: per source, keep the best documents
    (quality desc, id asc) while the running token total fits ``budget`` —
    the greedy-prefix rule every token-budgeted pretraining mixture uses.

    Scale shape: the naive plan is ONE window per source (10 sources at
    100 TB = 10 serial tasks).  Instead the prefix is decomposed through
    quality BANDS (quality is already rounded to 6 decimals, so the band
    IS the exact sort key):

    1. per-(source, quality) token totals — a partial-aggregated shuffle
       bounded by |sources| x |distinct qualities| (tiny);
    2. band-level running offsets via a window over that TINY frame;
    3. broadcast the offsets back; each document's cumulative total is
       `band_offset + within-band prefix`, where the within-band window
       partitions by (source, quality) — thousands of narrow partitions
       instead of one partition per source.

    The result is row-identical to the naive per-source window (the sort
    key (quality DESC, id ASC) is the band order followed by the in-band
    order), which is exactly what the DuckDB oracle runs.

    Ordering and band keys use the RAW (un-rounded) quality double — the
    scalar IEEE expression is bit-exact across engines, while ROUND(q, 6)
    is not (Spark HALF_UPs the decimal string, DuckDB rounds the binary
    double): one flipped .5-boundary band would reorder the prefix and
    shift every later cum_tokens in that source.  The rounded value is
    emitted only as the display column.

    EAGER: the narrow 4-column doc frame is localCheckpoint'd at call time
    — it feeds both the band aggregate and the join side, and quality's
    regex/array work over every token is the dominant cost; without the
    checkpoint the documents scan and scoring run twice.

    Output: (id_col, source_col, quality double, n_tok long,
    cum_tokens long) for kept documents.
    """
    from .text import quality_score_raw

    c = F.col(text_col)
    d = df.select(
        F.col(id_col),
        F.col(source_col),
        quality_score_raw(c).alias("_q"),
        F.size(tokens(c)).cast("long").alias("n_tok"),
    ).localCheckpoint(eager=True)
    bands = d.groupBy(source_col, "_q").agg(
        F.sum("n_tok").alias("_band_toks")
    )
    wb = (
        Window.partitionBy(source_col)
        .orderBy(F.desc("_q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = bands.select(
        F.col(source_col),
        F.col("_q"),
        (F.sum("_band_toks").over(wb) - F.col("_band_toks")).alias("_before"),
    )
    wd = (
        Window.partitionBy(source_col, "_q")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(offsets), [source_col, "_q"])
        .select(
            F.col(id_col),
            F.col(source_col),
            F.round(F.col("_q"), 6).alias("quality"),
            F.col("n_tok"),
            (F.col("_before") + F.sum("n_tok").over(wd)).alias("cum_tokens"),
        )
        .where(F.col("cum_tokens") <= budget)
    )


def token_budget_oracle_sql(
    docs_sql: str,
    budget: int,
    quality_raw_sql: str,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `token_budget_mix` — the NAIVE per-source prefix
    window (the band decomposition is a plan optimization, not a semantics
    change).  `quality_raw_sql` must be the UN-ROUNDED engine-shared
    quality expression over a `text` column (ordering on the raw double is
    bit-exact cross-engine; ROUND is applied only to the display column).
    Integer window SUM is CAST to BIGINT (DuckDB HUGEINT vs Spark long)."""
    return f"""
WITH d AS (
  SELECT {id_col}, {source_col}, {quality_raw_sql} AS q_raw,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok
  FROM ({docs_sql})
),
c AS (
  SELECT {id_col}, {source_col}, ROUND(q_raw, 6) AS quality, n_tok,
         CAST(SUM(n_tok) OVER (PARTITION BY {source_col}
                               ORDER BY q_raw DESC, {id_col} ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM d
)
SELECT * FROM c WHERE cum_tokens <= {budget}
"""


def span_corruption_targets(
    docs: DataFrame,
    block: int = 8,
    mask_pct: int = 40,
    seed: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_masked, n_spans, input_text, target_text): T5-style span
    corruption — the denoising-pretraining target generator.  Masked spans
    are replaced in the input by incremental sentinels and emitted in the
    target as ``<extra_id_k> span tokens ...``:

        tokens:  the quick brown fox jumps over the lazy dog
        input:   the quick <extra_id_0> jumps over <extra_id_1> dog
        target:  <extra_id_0> brown fox <extra_id_1> the lazy

    Deterministic fixed-block variant (columnar-friendly): positions
    partition into blocks of ``block`` tokens; per (doc, block) one md5
    hash decides — via three independent hex slices — whether the block
    masks a span (``mask_pct`` percent do), the span length L in {2,3,4},
    and its offset within the block.  Blocks are independent, so masking
    needs no sequential scan (the classic T5 sampler draws spans
    sequentially to avoid overlap; fixed blocks make non-overlap
    structural).  Expected mask rate = mask_pct% * E[L]/block = 15% at the
    defaults.  Docs whose blocks all miss get input = normalized text and
    an empty target; token-less docs get no row.

    Cross-engine exactness: every decision is integer arithmetic on md5
    hex slices, and both engines rebuild the strings with the same
    order-keyed joins — byte-identical output.

    Scale shape: one token explode (linear), per-(doc, block) aggregates,
    and per-DOC windows/sorted-collects only — every shuffle key is the
    doc id, state per doc is its own token count, nothing global."""
    toks = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.trim(F.col(text_col)))).alias("pos", "token"),
    )
    key = F.concat(
        F.col("doc_id").cast("string"),
        F.lit("|"),
        (F.col("pos") / block).cast("long").cast("string"),
        F.lit("#"),
        F.lit(str(seed)),
    )
    m5 = F.md5(key)
    h_mask = F.conv(F.substring(m5, 1, 4), 16, 10).cast("long")
    h_len = F.conv(F.substring(m5, 5, 4), 16, 10).cast("long")
    h_off = F.conv(F.substring(m5, 9, 4), 16, 10).cast("long")
    span_len = F.lit(2) + (h_len % 3)
    span_off = h_off % (F.lit(block) - span_len + 1)
    offset = F.col("pos") % block
    masked = (
        (h_mask % 100 < mask_pct)
        & (offset >= span_off)
        & (offset < span_off + span_len)
    )
    rows = toks.select(
        "doc_id",
        "pos",
        "token",
        (F.col("pos") / block).cast("long").alias("block"),
        masked.alias("masked"),
    ).localCheckpoint(eager=True)  # feeds the span aggregate AND the keeps
    spans = (
        rows.where("masked")
        .groupBy("doc_id", "block")
        .agg(
            F.min("pos").alias("start_pos"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda x: x["token"],
                ),
            ).alias("span_text"),
        )
    )
    k = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("block")
    ) - F.lit(1)
    spans = spans.withColumn(
        "sentinel", F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))
    ).localCheckpoint(eager=True)  # feeds the input union AND the target
    parts = (
        rows.where(~F.col("masked"))
        .select("doc_id", "pos", "token")
        .unionByName(
            spans.select(
                "doc_id",
                F.col("start_pos").alias("pos"),
                F.col("sentinel").alias("token"),
            )
        )
    )
    inp = parts.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda x: x["token"],
            ),
        ).alias("input_text")
    )
    tgt = spans.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_masked"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "block",
                            F.concat_ws(
                                " ", F.col("sentinel"), F.col("span_text")
                            ).alias("part"),
                        )
                    )
                ),
                lambda x: x["part"],
            ),
        ).alias("target_text"),
    )
    return inp.join(tgt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_masked"), F.lit(0)).cast("long").alias("n_masked"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        "input_text",
        F.coalesce(F.col("target_text"), F.lit("")).alias("target_text"),
    )


def span_corruption_oracle_sql(
    docs_sql: str,
    block: int = 8,
    mask_pct: int = 40,
    seed: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `span_corruption_targets` (byte-identical strings)."""
    key = (
        f"CAST(doc_id AS VARCHAR) || '|' || CAST(pos // {block} AS VARCHAR)"
        f" || '#' || '{seed}'"
    )
    return f"""
WITH sc_docs AS ({docs_sql}),
sc_tok AS (
  SELECT doc_id, ord - 1 AS pos, term FROM (
    SELECT {id_col} AS doc_id,
           unnest(string_split_regex(trim({text_col}), ' +')) AS term,
           generate_subscripts(string_split_regex(trim({text_col}), ' +'), 1) AS ord
    FROM sc_docs
    WHERE length(trim({text_col})) > 0
  )),
sc_rows AS MATERIALIZED (
  SELECT doc_id, pos, term, pos // {block} AS block,
         (hm % 100 < {mask_pct}
          AND (pos % {block}) >= (ho % ({block} - (2 + hl % 3) + 1))
          AND (pos % {block}) < (ho % ({block} - (2 + hl % 3) + 1)) + 2 + hl % 3
         ) AS masked
  FROM (
    SELECT doc_id, pos, term,
           CAST(('0x' || substring(md5({key}), 1, 4)) AS BIGINT) AS hm,
           CAST(('0x' || substring(md5({key}), 5, 4)) AS BIGINT) AS hl,
           CAST(('0x' || substring(md5({key}), 9, 4)) AS BIGINT) AS ho
    FROM sc_tok
  )),
sc_spans AS MATERIALIZED (
  SELECT doc_id, block, MIN(pos) AS start_pos,
         CAST(COUNT(*) AS BIGINT) AS n,
         string_agg(term, ' ' ORDER BY pos) AS span_text,
         '<extra_id_' || CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY block) - 1 AS VARCHAR) || '>' AS sentinel
  FROM sc_rows WHERE masked
  GROUP BY doc_id, block),
sc_inp AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS input_text FROM (
    SELECT doc_id, pos, term AS token FROM sc_rows WHERE NOT masked
    UNION ALL
    SELECT doc_id, start_pos AS pos, sentinel AS token FROM sc_spans
  ) GROUP BY doc_id),
sc_tgt AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_masked,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         string_agg(sentinel || ' ' || span_text, ' ' ORDER BY block) AS target_text
  FROM sc_spans GROUP BY doc_id)
SELECT i.doc_id,
       COALESCE(t.n_masked, 0) AS n_masked,
       COALESCE(t.n_spans, 0) AS n_spans,
       i.input_text,
       COALESCE(t.target_text, '') AS target_text
FROM sc_inp i LEFT JOIN sc_tgt t ON i.doc_id = t.doc_id
"""
