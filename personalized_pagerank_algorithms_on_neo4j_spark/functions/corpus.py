"""End-to-end training-corpus build: the flagship stage composition.

A real pretraining data pipeline runs, in order: a quality gate, exact
dedup, near-dup dedup, eval-set decontamination, a token-budgeted source
mixture, and sequence packing.  Every stage exists in this repo as an
individually driver-gated operator; this module proves they COMPOSE —
one call, one corpus scan per stage boundary, a row per packed sequence
out the other end.

Stage inventory (all existing operators — this module adds no new
semantics, only the composition):

  1. quality gate        text.langid + text.quality_score      (quality_filter)
  2. exact dedup         dedup.exact_dedup (min-id per md5)    (dedup_exact)
  3. near-dup dedup      dedup.minhash_lsh_candidates
                         -> dedup_clusters -> survivors        (dedup_survivors)
  4. decontamination     dedup.cross_corpus_contamination      (decontamination)
  5. token-budget mix    packing.token_budget_mix              (token_budget_mix)
  6. sequence packing    packing.pack_sequences                (seq_packing)

Materialization discipline (the 100-TB shape): the corpus text is
checkpointed at exactly three points — after the quality gate (the regex
scoring reads the raw scan once), after exact dedup (four downstream
consumers: LSH shingles, survivor sizing, decon shingles, the anti-join),
and after decontamination (the mix and pack stages read it).  Between
checkpoints every stage is a narrow projection or a broadcast (anti-)join:
the near-dup drop set is cluster-membership-bounded and the contaminated
set is per-doc-aggregate-bounded, so both ride broadcast left-anti joins.
No stage re-reads the source table; no stage re-materializes the corpus
more than once.  (On a cluster the checkpoints become persist(DISK) or a
staging parquet write; localCheckpoint is the single-JVM stand-in.)

Reference parity note: the composition discipline (prep once, reuse the
prepared store across query stages) mirrors the reference's
preprocess-then-lookup lifecycle (Base_Whole_Graph.java:57-186); the
stages themselves are the standard LLM-corpus curation chain (Lee et al.
2022 "Deduplicating Training Data Makes Language Models Better" for
stages 2-4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as _dedup
from .packing import pack_sequences, token_budget_mix
from .text import langid, quality_score


def corpus_stages(
    docs: DataFrame,
    bench: DataFrame,
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    cluster_steps: int = 6,
    decon_max: float = 0.6,
) -> dict[str, DataFrame]:
    """The gate-stage frames, shared by `corpus_pipeline` (which appends
    the mixture+packing tail) and `corpus_funnel` (which counts them):
    {'quality', 'exact', 'near', 'kept'} — each (doc_id, source, text),
    checkpointed per the module-doc materialization discipline."""
    c = F.col("text")
    gated = (
        docs.select("doc_id", "source", "text")
        .where((langid(c) == lang) & (quality_score(c) >= min_quality))
        .localCheckpoint(eager=True)
    )
    exact = _dedup.exact_dedup(gated).localCheckpoint(eager=True)

    pairs = _dedup.minhash_lsh_candidates(exact, num_hashes, bands, n)
    clusters = _dedup.dedup_clusters(
        pairs, max_iters=cluster_steps, strict=False
    )
    surv = _dedup.survivors_from_clusters(clusters, exact)
    near_drop = surv.where(~F.col("keep")).select("doc_id")
    near = exact.join(F.broadcast(near_drop), "doc_id", "left_anti")

    cont = _dedup.cross_corpus_contamination(near, bench, n=n)
    contaminated = cont.where(F.col("contamination") > decon_max).select(
        "doc_id"
    )
    kept = near.join(F.broadcast(contaminated), "doc_id", "left_anti")
    kept = kept.localCheckpoint(eager=True)
    return {"quality": gated, "exact": exact, "near": near, "kept": kept}


def corpus_pipeline(
    docs: DataFrame,
    bench: DataFrame,
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    cluster_steps: int = 6,
    decon_max: float = 0.6,
    mix_budget: int = 700,
    pack_budget: int = 512,
    pack_buckets: int = 4,
    pack_seed: int = 7,
) -> DataFrame:
    """(bucket, pack, n_docs, pack_tokens, first_doc, last_doc): one row
    per packed training sequence surviving the full curation chain.

    ``docs`` is the training corpus (doc_id, source, text); ``bench`` is
    the held-out benchmark corpus decontaminated against.  All stage
    parameters default to the values the individual driver keys use.
    ``cluster_steps`` bounds the near-dup label propagation exactly like
    `dedup_clusters(strict=False)` — the DuckDB twin unrolls the same
    depth."""
    stages = corpus_stages(
        docs,
        bench,
        lang=lang,
        min_quality=min_quality,
        num_hashes=num_hashes,
        bands=bands,
        n=n,
        cluster_steps=cluster_steps,
        decon_max=decon_max,
    )
    mix = token_budget_mix(stages["kept"], budget=mix_budget)
    packed = pack_sequences(
        mix,
        budget_tokens=pack_budget,
        n_buckets=pack_buckets,
        seed=pack_seed,
        n_tokens_col="n_tok",
    )
    return packed.groupBy("bucket", "pack").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def corpus_funnel(
    docs: DataFrame,
    bench: DataFrame,
    *,
    mix_budget: int = 700,
    **stage_kwargs,
) -> DataFrame:
    """(stage_no, stage, n_docs, n_tokens): the curation funnel — the
    data-card row a pipeline owner reads first.  Stages: base (the raw
    corpus), quality, exact, near_dup, decontaminated, mixture.  Token
    counts use the engine tokenizer (trim + ' +') at every stage so the
    funnel prices the gates in the same unit the budget is set in.

    Cost shape: one count+sum aggregate per stage frame; the gate frames
    are the checkpointed `corpus_stages` outputs, so nothing re-derives
    the chain, and the base row is the only extra corpus scan."""
    from .text import tokens

    stages = corpus_stages(docs, bench, **stage_kwargs)
    mix = token_budget_mix(stages["kept"], budget=mix_budget)
    named = [
        ("base", docs.select("doc_id", "text")),
        ("quality", stages["quality"]),
        ("exact", stages["exact"]),
        ("near_dup", stages["near"]),
        ("decontaminated", stages["kept"]),
    ]
    out = None
    for i, (name, frame) in enumerate(named):
        row = frame.agg(
            F.lit(i).cast("long").alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.size(tokens(F.col("text"))).cast("long")), F.lit(0)
            ).alias("n_tokens"),
        )
        out = row if out is None else out.unionByName(row)
    mix_row = mix.agg(
        F.lit(len(named)).cast("long").alias("stage_no"),
        F.lit("mixture").alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).alias("n_tokens"),
    )
    return out.unionByName(mix_row)


def _corpus_stage_ctes(
    corpus_sql: str,
    bench_sql: str,
    *,
    shingles_expr: str,
    sql_hash,
    quality_raw_expr: str,
    lang_scores: dict[str, str],
    lang: str,
    cluster_chain,
    min_quality: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    cluster_steps: int = 6,
    decon_max: float = 0.6,
    mix_budget: int = 700,
) -> str:
    """The shared CTE body (cp_base .. cp_mix) behind BOTH tails — the
    pack summary (`corpus_pipeline_oracle_sql`) and the funnel counts
    (`corpus_funnel_oracle_sql`).

    Every CTE body is the corresponding single-stage oracle's algebra with
    its `documents` scan swapped for the previous stage's CTE —
    `corpus_sql`/`bench_sql` supply (doc_id, source, text).  Fragment
    arguments come from the entry module so the stage algebra cannot drift
    from the individually gated keys: `shingles_expr`/`sql_hash` are the
    minhash-family fragments, `quality_raw_expr`/`lang_scores` the
    quality_filter fragments, `cluster_chain` the dedup_clusters unroll
    (expects a CTE literally named `cand`)."""
    mx = "greatest(" + ", ".join(f"s_{lg}" for lg in sorted(lang_scores)) + ")"
    lang_case = (
        "CASE "
        + " ".join(
            f"WHEN s_{lg} > 0.0 AND s_{lg} = {mx} THEN '{lg}'"
            for lg in sorted(lang_scores)
        )
        + " ELSE 'unknown' END"
    )
    score_cols = ", ".join(
        f"{e} AS s_{lg}" for lg, e in sorted(lang_scores.items())
    )
    rows = num_hashes // bands
    toks = "string_split_regex(trim(text), ' +')"
    return f"""
cp_base AS MATERIALIZED ({corpus_sql}),
cp_q AS MATERIALIZED (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           ROUND({quality_raw_expr}, 6) AS quality,
           {lang_case} AS lang_pred
    FROM (SELECT doc_id, source, text, {score_cols} FROM cp_base))
  WHERE lang_pred = '{lang}' AND quality >= {min_quality}
),
cp_exact AS MATERIALIZED (
  SELECT doc_id, source, text FROM (
    SELECT *, MIN(doc_id) OVER (
      PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS _keep
    FROM cp_q) WHERE doc_id = _keep
),
cp_ds AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest({shingles_expr}) AS sh FROM cp_exact),
cp_based AS MATERIALIZED (
  SELECT doc_id, {sql_hash('sh', '0')} AS h1, {sql_hash('sh', '1')} AS h2
  FROM cp_ds),
cp_sig AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         MIN(((1000 * i + 12289) * h1 + i * h2) % 9007199254740881) AS minhash
  FROM (SELECT doc_id, h1, h2, unnest(range(0, {num_hashes})) AS i
        FROM cp_based)
  GROUP BY doc_id, i),
cp_banded AS MATERIALIZED (
  SELECT doc_id, i // {rows} AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY i)) AS bucket
  FROM cp_sig GROUP BY doc_id, i // {rows}),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cp_banded a JOIN cp_banded b
    ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id),
{cluster_chain("cp", cluster_steps)},
cp_nonsurv AS (
  SELECT doc_id FROM (
    SELECT c.node AS doc_id,
           FIRST_VALUE(c.node) OVER (PARTITION BY c.label
             ORDER BY LENGTH(d.text) DESC, c.node ASC) AS survivor
    FROM cp{cluster_steps} c JOIN cp_exact d ON d.doc_id = c.node)
  WHERE doc_id <> survivor),
cp_near AS MATERIALIZED (
  SELECT * FROM cp_exact
  WHERE doc_id NOT IN (SELECT doc_id FROM cp_nonsurv)),
cp_bs AS MATERIALIZED (
  SELECT DISTINCT sh FROM (
    SELECT unnest({shingles_expr}) AS sh FROM ({bench_sql}))),
cp_contam AS (
  SELECT doc_id FROM (
    SELECT d.doc_id, COUNT(*) AS n_sh, COUNT(b.sh) AS n_common
    FROM (SELECT DISTINCT doc_id, unnest({shingles_expr}) AS sh
          FROM cp_near) d
    LEFT JOIN cp_bs b ON d.sh = b.sh GROUP BY d.doc_id)
  WHERE ROUND(CAST(n_common AS DOUBLE) / CAST(n_sh AS DOUBLE), 6)
        > {decon_max}),
cp_kept AS MATERIALIZED (
  SELECT * FROM cp_near
  WHERE doc_id NOT IN (SELECT doc_id FROM cp_contam)),
cp_mix AS MATERIALIZED (
  SELECT doc_id, n_tok FROM (
    SELECT doc_id, n_tok,
           CAST(SUM(n_tok) OVER (PARTITION BY source
                 ORDER BY q_raw DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
    FROM (SELECT doc_id, source, {quality_raw_expr} AS q_raw,
                 CAST(len({toks}) AS BIGINT) AS n_tok FROM cp_kept))
  WHERE cum_tokens <= {mix_budget})"""


def corpus_pipeline_oracle_sql(
    corpus_sql: str,
    bench_sql: str,
    *,
    bucket_expr: str,
    pack_budget: int = 512,
    **stage_kwargs,
) -> str:
    """DuckDB twin of `corpus_pipeline`: the shared stage CTEs + the
    interval-packing tail.  ``bucket_expr`` is the seq_packing
    portable-hash bucket; remaining kwargs go to `_corpus_stage_ctes`."""
    body = _corpus_stage_ctes(corpus_sql, bench_sql, **stage_kwargs)
    return f"""
WITH {body},
cp_pack AS (
  SELECT doc_id, bucket,
         CAST(FLOOR(cum_before / {pack_budget}) AS BIGINT) AS pack, n_tok
  FROM (
    SELECT doc_id, bucket, n_tok,
           COALESCE(SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_before
    FROM (SELECT doc_id, n_tok, {bucket_expr} AS bucket FROM cp_mix)))
SELECT bucket, pack, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM cp_pack GROUP BY bucket, pack
"""


def corpus_funnel_oracle_sql(
    corpus_sql: str,
    bench_sql: str,
    **stage_kwargs,
) -> str:
    """DuckDB twin of `corpus_funnel`: the shared stage CTEs + one
    count/token-sum row per stage (base, quality, exact, near_dup,
    decontaminated, mixture)."""
    body = _corpus_stage_ctes(corpus_sql, bench_sql, **stage_kwargs)
    toks = "string_split_regex(trim(text), ' +')"

    def row(no: int, name: str, cte: str, tok_sum: str) -> str:
        return (
            f"SELECT CAST({no} AS BIGINT) AS stage_no, '{name}' AS stage, "
            f"CAST(COUNT(*) AS BIGINT) AS n_docs, "
            f"CAST(COALESCE({tok_sum}, 0) AS BIGINT) AS n_tokens FROM {cte}"
        )

    doc_sum = f"SUM(len({toks}))"
    parts = [
        row(0, "base", "cp_base", doc_sum),
        row(1, "quality", "cp_q", doc_sum),
        row(2, "exact", "cp_exact", doc_sum),
        row(3, "near_dup", "cp_near", doc_sum),
        row(4, "decontaminated", "cp_kept", doc_sum),
        row(5, "mixture", "cp_mix", "SUM(n_tok)"),
    ]
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH {body}
{union}
"""
