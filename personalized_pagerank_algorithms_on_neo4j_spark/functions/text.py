"""Text-analysis operators for training-data pipelines.

All expressions are built-in `pyspark.sql.functions` (JVM-side, codegen'd) —
no Python UDFs. Every function is deterministic and has an exact ANSI-SQL
equivalent so results can be oracle-checked against DuckDB.

Portable hash: `md5(...)` hex is identical across engines; the first 15 hex
chars cast from base-16 give a 60-bit non-negative integer usable as a
deterministic hash in both Spark (`conv(...,16,10)`) and DuckDB
(`CAST(('0x'||...) AS BIGINT)`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately small so the scoring stays SQL-expressible.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
}


def portable_hash(col: Column, seed: Column | int = 0, hex_chars: int = 12) -> Column:
    """Deterministic 48-bit hash identical in Spark and DuckDB (md5-based).

    48 bits so that small multiplier/accumulator arithmetic stays far below
    2^63: Spark longs wrap silently but DuckDB BIGINTs raise on overflow, so
    portable pipelines must never overflow.  `hex_chars` narrows the hash
    (4 bits per hex char) when the caller packs extra payload bits next to
    it in one BIGINT (winnowing packs 40-bit hash + 20-bit position)."""
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit("#"), seed_col)), 1, hex_chars
        ),
        16,
        10,
    ).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (word tokens)."""
    return F.split(F.trim(col), " +")


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, single symbols."""
    return F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(col))
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(col), F.lit(1)).cast("double")


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score_raw(col: Column) -> Column:
    """Un-rounded quality double.  The scalar IEEE expression tree is
    identical in Spark and DuckDB, so this value is BIT-EXACT across
    engines — use it (not the rounded `quality_score`) wherever quality
    ORDERS or JOINS rows: Spark's `F.round` HALF_UPs the decimal string
    while DuckDB rounds the binary double, so ROUND(q, 6) can flip the
    last digit at a .5 boundary and cascade through any ordering built on
    it (the adamic_adar lesson)."""
    len_score = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.least(sw * 4.0, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(col) * 2.0, F.lit(1.0))
    return len_score * 0.4 + sw_score * 0.4 + (1.0 - punct_penalty) * 0.2


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: length band + stopword presence - punct
    excess. Deterministic arithmetic over the ratios above."""
    return F.round(quality_score_raw(col), 6)


def langid(col: Column) -> Column:
    """Stopword-profile language ID; deterministic lexicographic tiebreak."""
    toks = tokens(F.lower(col))
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scores = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        sw = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast(
            "double"
        ) / n
        scores.append((lang, score))
    # argmax; 'unknown' when every score is 0; ties go to the first lang in
    # sorted order (the outermost WHEN is built last -> checked first)
    mx = F.greatest(*[s for _, s in scores])
    result = F.lit("unknown")
    for lang, score in reversed(scores):
        result = F.when((score > 0.0) & (score == mx), F.lit(lang)).otherwise(result)
    return result


PRIME53 = 9007199254740881  # < 2^53; sum of 48-bit hashes stays < 2^63 for
# documents up to ~32k distinct tokens (documented limit) in both engines


def fingerprint(col: Column) -> Column:
    """Document fingerprint: sum of distinct-token hashes mod a 53-bit prime
    (order-independent bag-of-words identity, identical in DuckDB SQL)."""
    toks = F.array_distinct(tokens(F.lower(col)))
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + portable_hash(t)
    )
    return total % F.lit(PRIME53)


# ---------------------------------------------------------------------------
# PII redaction — training corpora are scrubbed before tokenization. The
# patterns stay inside the portable regex subset (no lookaround, no \b, no
# engine-specific classes) so the DuckDB oracle runs the identical regexes.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^ ]+",
    "phone": r"\+?[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}",
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of `kind` PII matches in the text (codegen'd, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), F.lit(0))).cast(
        "long"
    )


def redact_pii(col: Column) -> Column:
    """Replace each PII match with a typed placeholder token. Order matters:
    emails first (an email never contains a URL, but a URL query-string can
    contain an @), then URLs, then phones."""
    out = col
    for kind in ("email", "url", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Within-document n-gram repetition: 1 - distinct/total n-grams, the
    standard boilerplate/spam quality signal (0 = no repeats). Rounded to 6
    decimals for cross-engine comparison."""
    toks = tokens(F.lower(col))
    grams = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
        lambda s: F.length(s) > 0,
    )
    total = F.greatest(F.size(grams), F.lit(1)).cast("double")
    return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total, 6
        )
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop per-document profile used by the pipeline queries."""
    c = F.col(text_col)
    return df.select(
        *[f for f in df.columns if f != text_col],
        token_count(c).alias("n_tokens"),
        F.size(bpe_ish_tokens(c)).cast("long").alias("n_bpe_tokens"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(mean_token_len(c), 6).alias("mean_token_len"),
        quality_score(c).alias("quality"),
        langid(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, score, pos): the k highest-TF-IDF terms per document.

    Fully relational — the canonical corpus-statistics shape at scale:
    tokenize-explode (narrow), per-(doc, term) count with map-side combine,
    a term-keyed document-frequency aggregate, one join back on term
    (AQE broadcasts it while the vocabulary is small; a 100 TB vocabulary
    shuffles on term, which is exactly right), and a per-document window for
    the top-k (partitioned by doc — parallel, never a global sort).

    Cross-engine determinism: idf = ROUND(ln((N+1)/(df+1)) + 1, 6) and
    score = ROUND(tf * idf, 6); ROW_NUMBER ties broken on term ASC."""
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.length("term") > 0)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(
        F.round(
            F.log((F.lit(float(n_docs + 1))) / (F.count(F.lit(1)) + F.lit(1.0)))
            + F.lit(1.0),
            6,
        ).alias("idf")
    )
    scored = tf.join(idf, "term").select(
        id_col, "term", F.round(F.col("tf") * F.col("idf"), 6).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score, pos): Okapi BM25 top-k documents for a query string.

    The retrieval-scoring twin of `tfidf_top_terms`, same relational scale
    shape: tokenize-explode (narrow), ONE doc-length aggregate over the
    corpus, a per-(doc, query-term) tf aggregate over the pre-filtered
    (tiny) postings, term df + corpus stats as broadcast scalars, sum per
    doc, then top-k via `orderBy(score DESC, id ASC).limit(k)` — planned
    as TakeOrderedAndProject (per-partition top-k, then a k-row merge on
    the driver), so the O(corpus) scored side never funnels through one
    partition the way a global row_number window would. The tie-break is
    total (score DESC, id ASC), so the k rows are identical to the
    window formulation; `pos` is attached with a window over the k-row
    result, which is k rows by construction. The corpus is scanned once;
    everything joined back to it is small or keyed on the doc id.

    Cross-engine determinism: idf = ROUND(ln((N - df + 0.5)/(df + 0.5)
    + 1), 6); per-doc length norm ROUND(_, 6); final score ROUND(_, 6).
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("query has no tokens")
    if len(terms) > _BM25_FUSED_TERMS_MAX:
        # a pasted-paragraph query would build a conditional aggregate one
        # column per term — O(tokens x terms) CPU and codegen-width risk;
        # route through the batch operator's two-pass postings plan (same
        # scoring math, rounding, and tie-break per its contract)
        return bm25_topk_batch(
            docs, [(0, query)], k=k, k1=k1, b=b,
            text_col=text_col, id_col=id_col,
        ).drop("query_id")
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.length("term") > 0)
    # ONE pass over the exploded tokens: doc length and every query
    # term's tf ride the same conditional aggregate (query terms are few
    # by definition), where the previous dl/postings branches each
    # re-tokenized the whole corpus. The eager checkpoint materializes
    # ONE narrow row per doc so the three downstream references (corpus
    # stats, term dfs, scoring) never re-tokenize — at local bench scale
    # the materialization job costs ~0.4 s of fixed overhead, at corpus
    # scale it replaces two full tokenize passes with an n_docs-bounded
    # write, which is the only sane trade at 100 TB.
    per_doc = (
        toks.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        .localCheckpoint(eager=True)
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    # reshape via term INDEX, never term text: embedding user-provided
    # terms as SQL string literals would make escaping (backslashes,
    # quotes) the caller's problem; the index join is literal-free and
    # handles any token byte-for-byte
    stack_expr = "stack({}, {}) AS (term_idx, tf)".format(
        len(terms), ", ".join(f"{i}, _tf{i}" for i in range(len(terms)))
    )
    term_names = docs.sparkSession.createDataFrame(
        list(enumerate(terms)), "term_idx int, term string"
    )
    qtf = (
        per_doc.selectExpr(id_col, "dl", stack_expr)
        .where(F.col("tf") > 0)
        .join(F.broadcast(term_names), "term_idx")
        .drop("term_idx")
    )
    df_t = qtf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        qtf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ).alias("idf"),
            F.col("tf").cast("double").alias("tf"),
            F.round(
                F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")),
                6,
            ).alias("norm"),
        )
        .select(
            id_col,
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (F.col("tf") + F.col("norm")),
                6,
            ).alias("tscore"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("tscore"), 6).alias("score"))
    )
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    # pos without a window (an empty-partition-spec window would drag the
    # whole scored side to one partition pre-limit in the naive form, and
    # even over the k-row result it logs the WindowExec warning): the k-row
    # result fits one partition by construction, so sort within it and
    # number rows with monotonically_increasing_id, which is 0..k-1 in row
    # order on a single partition.
    return (
        topk.coalesce(1)
        .sortWithinPartitions(F.desc("score"), F.asc(id_col))
        .withColumn("pos", (F.monotonically_increasing_id() + 1).cast("long"))
    )


def bm25_oracle_sql(
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `bm25_topk` (identical rounding and tie-break)."""
    terms = sorted({t for t in query.lower().split() if t})
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split_regex(lower(trim({text_col})), ' +')) AS term
  FROM {table}
),
toks_nz AS (SELECT * FROM toks WHERE length(term) > 0),
dl AS (SELECT {id_col}, COUNT(*) AS dl FROM toks_nz GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl),
qtf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM toks_nz
  WHERE term IN ({term_list}) GROUP BY 1, 2),
df_t AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM qtf GROUP BY 1),
scored AS (
  SELECT q.{id_col},
         ROUND(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 6) AS idf,
         CAST(q.tf AS DOUBLE) AS tf,
         ROUND({k1} * ({1.0 - b} + {b} * l.dl / s.avgdl), 6) AS norm
  FROM qtf q JOIN df_t d USING (term) JOIN dl l USING ({id_col})
  CROSS JOIN stats s),
per_doc AS (
  SELECT {id_col},
         ROUND(SUM(ROUND(idf * (tf * {k1 + 1.0}) / (tf + norm), 6)), 6) AS score
  FROM scored GROUP BY 1)
SELECT {id_col}, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, {id_col} ASC) AS BIGINT) AS pos
FROM per_doc
QUALIFY pos <= {k}
"""


def unigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, logprob): mean unigram log-probability per doc —
    the lightweight perplexity proxy used for corpus quality filtering
    (low mean logprob = tokens rare in this corpus = likely noise).

    Model: Laplace-smoothed unigram trained on the SAME corpus,
    p(t) = (count(t) + 1) / (T + V). Scale shape: one term-keyed vocab
    aggregate (shuffles on term — correct at any vocabulary size), joined
    back to the exploded postings, one per-doc mean. Cross-engine
    determinism: per-term log-probs ROUND(_, 9) before averaging, doc
    score ROUND(_, 6)."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.length("term") > 0)
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("double").alias("t_tokens"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    term_lp = vocab.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.log(
                (F.col("cnt") + F.lit(1.0))
                / (F.col("t_tokens") + F.col("v_size"))
            ),
            9,
        ).alias("lp"),
    )
    return (
        toks.join(term_lp, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("logprob"),
        )
    )


def unigram_logprob_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `unigram_logprob_scores`."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(string_split_regex(lower(trim({text_col})), ' +')) AS term
  FROM {table}
),
toks_nz AS (SELECT * FROM toks WHERE length(term) > 0),
vocab AS (SELECT term, COUNT(*) AS cnt FROM toks_nz GROUP BY 1),
totals AS (
  SELECT CAST(SUM(cnt) AS DOUBLE) AS t_tokens,
         CAST(COUNT(*) AS DOUBLE) AS v_size
  FROM vocab),
term_lp AS (
  SELECT term, ROUND(ln((cnt + 1.0) / (t_tokens + v_size)), 9) AS lp
  FROM vocab CROSS JOIN totals)
SELECT {id_col}, COUNT(*) AS n_tokens, ROUND(AVG(lp), 6) AS logprob
FROM toks_nz JOIN term_lp USING (term)
GROUP BY {id_col}
"""


def bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_bigrams, logprob): mean bigram log-probability per doc —
    the sequence-aware step up from `unigram_logprob_scores` (word-salad
    documents score low here even when every individual token is common).

    Model: Laplace-smoothed conditional p(w2|w1) = (c(w1,w2) + 1) /
    (c(w1,*) + V), trained on the SAME corpus, V = distinct unigram vocab.
    Docs with fewer than 2 tokens have no bigram and get NO row (same rule
    in the oracle).

    Scale shape: bigrams come off the token ARRAY (two aligned slices +
    arrays_zip + one explode — never a positional self-join of the token
    stream); counts shuffle on the bigram key, the w1 marginal derives
    from the counts frame (no second corpus pass), V broadcasts as one
    row. Determinism: per-bigram log-probs ROUND(_, 9), doc ROUND(_, 6)."""
    t = docs.select(
        F.col(id_col),
        F.filter(
            tokens(F.lower(F.col(text_col))), lambda x: F.length(x) > 0
        ).alias("_toks"),
    ).localCheckpoint(eager=True)
    # ^ the token arrays feed THREE consumers (vocab count, the bigram
    # counts aggregation, and the final scoring join); without the eager
    # materialization each one re-reads and re-tokenizes the whole corpus
    # (the bm25_topk trade, same file: one corpus-bounded write replaces
    # two extra corpus passes)
    vocab_n = (
        t.select(F.explode("_toks").alias("term"))
        .agg(F.count_distinct("term").cast("double").alias("v"))
    )
    t2 = t.where(F.size("_toks") >= 2).select(
        id_col,
        F.slice("_toks", F.lit(1), F.size("_toks") - 1).alias("w1s"),
        F.slice("_toks", F.lit(2), F.size("_toks") - 1).alias("w2s"),
    )
    big = t2.select(
        id_col, F.explode(F.arrays_zip("w1s", "w2s")).alias("bg")
    ).select(
        id_col,
        F.col("bg.w1s").alias("w1"),
        F.col("bg.w2s").alias("w2"),
    )
    counts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    w1tot = counts.groupBy("w1").agg(F.sum("c").alias("tot"))
    lp = (
        counts.join(w1tot, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c") + F.lit(1.0))
                    / (F.col("tot").cast("double") + F.col("v"))
                ),
                9,
            ).alias("lp"),
        )
    )
    return (
        big.join(lp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("logprob"),
        )
    )


def bigram_next_tokens(
    docs: DataFrame,
    prefix: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, n, prob): the k most likely next tokens after ``prefix``
    under the corpus bigram LM (same Laplace model as
    `bigram_logprob_scores`) — the LM-inspection query ("what follows
    'spark' in this corpus?").

    Scale shape: one bigram explode filtered to w1 = prefix BEFORE the
    aggregate (predicate on the exploded stream, tiny groupBy), the
    vocab size and prefix marginal broadcast as 1-row frames, top-k via
    TakeOrderedAndProject under (prob DESC, term ASC)."""
    prefix = prefix.lower()
    t = docs.select(
        F.filter(
            tokens(F.lower(F.col(text_col))), lambda x: F.length(x) > 0
        ).alias("_toks"),
    ).localCheckpoint(eager=True)  # vocab + bigram stream read it
    vocab_n = t.select(F.explode("_toks").alias("term")).agg(
        F.count_distinct("term").cast("double").alias("v")
    )
    t2 = t.where(F.size("_toks") >= 2).select(
        F.slice("_toks", F.lit(1), F.size("_toks") - 1).alias("w1s"),
        F.slice("_toks", F.lit(2), F.size("_toks") - 1).alias("w2s"),
    )
    big = t2.select(F.explode(F.arrays_zip("w1s", "w2s")).alias("bg")).select(
        F.col("bg.w1s").alias("w1"), F.col("bg.w2s").alias("w2")
    )
    after = big.where(F.col("w1") == prefix)
    tot = after.agg(F.count(F.lit(1)).cast("double").alias("tot"))
    counts = after.groupBy(F.col("w2").alias("term")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    scored = counts.crossJoin(F.broadcast(tot)).crossJoin(
        F.broadcast(vocab_n)
    ).select(
        "term",
        "n",
        F.round(
            (F.col("n") + F.lit(1.0)) / (F.col("tot") + F.col("v")), 9
        ).alias("prob"),
    )
    return scored.orderBy(F.desc("prob"), F.asc("term")).limit(k)


def bigram_next_tokens_oracle_sql(
    prefix: str,
    k: int = 10,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `bigram_next_tokens`."""
    esc = prefix.lower().replace("'", "''")
    return f"""
WITH t AS (
  SELECT list_filter(string_split_regex(lower(trim({text_col})), ' +'),
                     x -> length(x) > 0) AS toks
  FROM {table}
),
vocab AS (
  SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
  FROM (SELECT unnest(toks) AS term FROM t)
),
t2 AS (
  SELECT toks[1:len(toks)-1] AS w1s, toks[2:len(toks)] AS w2s
  FROM t WHERE len(toks) >= 2
),
big AS (SELECT unnest(w1s) AS w1, unnest(w2s) AS w2 FROM t2),
after AS (SELECT w2 FROM big WHERE w1 = '{esc}'),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tot FROM after),
counts AS (SELECT w2 AS term, CAST(COUNT(*) AS BIGINT) AS n FROM after GROUP BY 1)
SELECT term, n,
       ROUND((n + 1.0) / ((SELECT tot FROM tot) + (SELECT v FROM vocab)), 9)
         AS prob
FROM counts
ORDER BY prob DESC, term
LIMIT {k}
"""


def bigram_logprob_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `bigram_logprob_scores`."""
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower(trim({text_col})), ' +'),
                     x -> length(x) > 0) AS toks
  FROM {table}
),
t2 AS (
  SELECT {id_col}, toks[1:len(toks)-1] AS w1s, toks[2:len(toks)] AS w2s
  FROM t WHERE len(toks) >= 2
),
big AS (SELECT {id_col}, unnest(w1s) AS w1, unnest(w2s) AS w2 FROM t2),
counts AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY 1, 2),
w1tot AS (SELECT w1, SUM(c) AS tot FROM counts GROUP BY 1),
vocab AS (
  SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
  FROM (SELECT unnest(toks) AS term FROM t)
),
lp AS (
  SELECT w1, w2,
         ROUND(ln((c + 1.0) / (CAST(tot AS DOUBLE) + v)), 9) AS lp
  FROM counts JOIN w1tot USING (w1) CROSS JOIN vocab
)
SELECT {id_col}, COUNT(*) AS n_bigrams, ROUND(AVG(lp), 6) AS logprob
FROM big JOIN lp USING (w1, w2)
GROUP BY {id_col}
"""


# union-of-terms bound for the fused one-pass conditional aggregate in
# bm25_topk_batch; bigger batches use the two-pass postings plan
_BM25_FUSED_TERMS_MAX = 24


def bm25_topk_batch(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, score, pos): Okapi BM25 top-k per query for a
    BATCH of queries — the retrieval shape that matters at corpus scale:
    the corpus is tokenized and aggregated ONCE for the union of all
    query terms, and every query's scoring and ranking rides that single
    pass. Per-query ranking is a window PARTITIONED BY query — parallel
    across queries, never a global sort.

    ``queries`` is a list of (query_id, query_string); the batch is
    driver-sized by definition (a request batch), so its term table
    broadcasts. Scoring math, rounding, and tie-breaks are identical to
    `bm25_topk` per query."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("queries is empty")
    pairs: set[tuple[int, str]] = set()
    for qid, q in queries:
        terms = {t for t in q.lower().split() if t}
        if not terms:
            raise ValueError(f"query {qid} has no tokens")
        # a GLOBAL (query_id, term) set: duplicate query_id entries or a
        # repeated term must contribute its score exactly once
        pairs.update((int(qid), t) for t in terms)
    all_terms = sorted({t for _, t in pairs})
    idx = {t: i for i, t in enumerate(all_terms)}
    spark = docs.sparkSession

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.length("term") > 0)
    if len(all_terms) <= _BM25_FUSED_TERMS_MAX:
        # small union of terms: ONE corpus pass with a conditional column
        # per term (same plan as the single-query operator)
        per_doc = (
            toks.groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("dl"),
                *[
                    F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(
                        f"_tf{i}"
                    )
                    for i, t in enumerate(all_terms)
                ],
            )
            .localCheckpoint(eager=True)
        )
        stats = per_doc.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
        stack_expr = "stack({}, {}) AS (term_idx, tf)".format(
            len(all_terms), ", ".join(f"{i}, _tf{i}" for i in range(len(all_terms)))
        )
        qtf = per_doc.selectExpr(id_col, "dl", stack_expr).where(F.col("tf") > 0)
    else:
        # large batch: a thousand-wide conditional aggregate would blow
        # past codegen/aggregate-width limits and cost O(tokens x terms)
        # CPU — fall back to the classic two-pass postings plan, O(tokens)
        # regardless of batch size (the extra tokenize pass amortizes
        # across every query in the batch)
        term_ids = spark.createDataFrame(
            [(t, i) for t, i in idx.items()], "term string, term_idx int"
        )
        dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
        dl = dl.localCheckpoint(eager=True)
        stats = dl.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
        qtf = (
            toks.join(F.broadcast(term_ids), "term")
            .groupBy(id_col, "term_idx")
            .agg(F.count(F.lit(1)).alias("tf"))
            .join(dl, id_col)
        )
    df_t = qtf.groupBy("term_idx").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    qterms = spark.createDataFrame(
        sorted((qid, idx[t]) for qid, t in pairs), "query_id long, term_idx int"
    )
    scored = (
        qtf.join(F.broadcast(qterms), "term_idx")
        .join(F.broadcast(df_t), "term_idx")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            id_col,
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ).alias("idf"),
            F.col("tf").cast("double").alias("tf"),
            F.round(
                F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")),
                6,
            ).alias("norm"),
        )
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (F.col("tf") + F.col("norm")),
                6,
            ).alias("tscore"),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("tscore"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("query_id", id_col, "score", F.col("pos").cast("long").alias("pos"))
    )


def bm25_batch_oracle_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `bm25_topk_batch` (identical math per query)."""
    if not queries:
        raise ValueError("queries is empty")
    pairs = sorted(
        {
            (int(qid), t)
            for qid, q in queries
            for t in q.lower().split()
            if t
        }
    )
    all_terms = sorted({t for _, t in pairs})

    def _q(t: str) -> str:  # SQL string literal with '' doubling
        return "'" + t.replace("'", "''") + "'"

    term_list = ", ".join(_q(t) for t in all_terms)
    qterm_values = ", ".join(f"({qid}, {_q(t)})" for qid, t in pairs)
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split_regex(lower(trim({text_col})), ' +')) AS term
  FROM {table}
),
toks_nz AS (SELECT * FROM toks WHERE length(term) > 0),
dl AS (SELECT {id_col}, COUNT(*) AS dl FROM toks_nz GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl),
qtf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM toks_nz
  WHERE term IN ({term_list}) GROUP BY 1, 2),
df_t AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM qtf GROUP BY 1),
qterms(query_id, term) AS (VALUES {qterm_values}),
scored AS (
  SELECT qt.query_id, q.{id_col},
         ROUND(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 6) AS idf,
         CAST(q.tf AS DOUBLE) AS tf,
         ROUND({k1} * ({1.0 - b} + {b} * l.dl / s.avgdl), 6) AS norm
  FROM qtf q
  JOIN qterms qt USING (term)
  JOIN df_t d USING (term)
  JOIN dl l USING ({id_col})
  CROSS JOIN stats s),
per AS (
  SELECT query_id, {id_col},
         ROUND(SUM(ROUND(idf * (tf * {k1 + 1.0}) / (tf + norm), 6)), 6) AS score
  FROM scored GROUP BY 1, 2)
SELECT query_id, {id_col}, score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, {id_col} ASC) AS BIGINT) AS pos
FROM per
QUALIFY pos <= {k}
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash k-gram sampling)
# ---------------------------------------------------------------------------

WINNOW_POS_BITS = 20
_WINNOW_POS_LIMIT = 1 << WINNOW_POS_BITS  # 1,048,576 grams per document
_WINNOW_POS_MASK = _WINNOW_POS_LIMIT - 1

# Rolling (Horner) gram hash parameters.  Token hashes are 28-bit
# (md5, 7 hex chars); the Horner step (acc*A + th) % P stays under 2^63
# in both engines (acc < P < 2^53, A < 2^10, th < 2^28 -> product
# < 2^63); the final gram hash reduces to 40 bits so the (hash |
# flipped-pos) packing fits one BIGINT.
_WINNOW_A = 521
_WINNOW_P = PRIME53
_WINNOW_HASH_LIMIT = 1 << 40


def _winnow_gram_hashes(th, k: int):
    """array<long> of rolling gram hashes from a BOUND token-hash array
    column: Horner combine over k consecutive token hashes, one O(1)
    integer expression per gram — never a gram string, never a per-gram
    md5.  Documents shorter than k tokens hash their tokens padded to k
    with the empty-token hash (one gram at position 0)."""
    h_empty = portable_hash(F.lit(""), hex_chars=7)

    def horner(get):
        acc = get(0)
        for j in range(1, k):
            acc = (acc * F.lit(_WINNOW_A) + get(j)) % F.lit(_WINNOW_P)
        return acc % F.lit(_WINNOW_HASH_LIMIT)

    full = F.transform(
        F.sequence(F.lit(0), F.size(th) - k),
        lambda i: horner(lambda j: F.element_at(th, i + 1 + j)),
    )
    # try_element_at, not element_at: ANSI mode (Spark 4 default) makes an
    # out-of-bounds element_at THROW instead of returning NULL
    short = F.array(
        horner(
            lambda j: F.coalesce(F.try_element_at(th, F.lit(j + 1)), h_empty)
        )
    )
    return F.when(F.size(th) >= k, full).otherwise(short)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS scheme): rolling-hash every k-token shingle, slide a w-wide
    window over the hash sequence, keep each window's minimum hash (ties ->
    the RIGHTMOST minimum), then deduplicate the selections.

    Guarantee: any token run shared by two documents of length >= w+k-1
    tokens contributes at least one common fingerprint; expected density is
    2/(w+1) of the grams.  Documents shorter than k tokens hash their
    tokens padded to k (one gram); documents with fewer than w grams take
    the global minimum (one clipped window).

    The gram hash is a TRUE rolling construction (Rabin-Karp/Horner): one
    md5 per TOKEN, then an O(1) integer combine per gram position —
    never a materialized gram string, never a per-gram md5, so per-gram
    CPU is k small long ops instead of a k-token string build + digest
    (the cost that dominates at corpus scale).  All arithmetic stays
    under 2^63 in both engines (see _WINNOW_A/_WINNOW_P bounds note).

    Scale shape: one narrow posexplode + ONE per-document window MIN
    (frames are doc-bounded, partitioned by `id_col` — never a global
    window) + distinct.  No self-join, no Python UDF.  The rightmost-min
    tie-break rides a plain MIN in both engines by packing (40-bit hash |
    20-bit bit-flipped position) into one BIGINT; grams beyond 2^20 per
    document are dropped (explicit cap, guard-tested never to bind at gate
    scale — real corpora hit multi-million-token docs only via concat
    errors that upstream `doc_chunks` splitting removes).

    Output: (id_col, fp_pos int, fp_hash long), one row per selected
    fingerprint.
    """
    toks = tokens(F.lower(F.col(text_col)))
    # Materialize the token-hash array as a bound column BEFORE deriving
    # gram hashes: expressions referenced inside a transform lambda are
    # re-evaluated per element, so an unbound token-hash tree would re-md5
    # the whole document once per gram (the O(n^2) trap); and materialize
    # the gram-hash array before the explode for the same reason.
    #
    # Repartition by id BEFORE the hash projections: the window below
    # requires a doc-keyed exchange anyway, and placing it ahead of the
    # expansion (a) ships the smaller pre-explode rows and (b) spreads the
    # tokenize+hash work across the cluster even when the input collapses
    # to a few splits (small files); the window then needs NO second
    # exchange (any hashpartitioning(id) satisfies its
    # ClusteredDistribution).  The partition count is EXPLICIT — a
    # column-only repartition is advisory and AQE coalesces it to one
    # partition on small pre-explode bytes, which would serialize the
    # whole expansion.  max(cores, configured shuffle partitions): never
    # below core count on a small input, never below the session's tuned
    # width for the post-explode window sort.
    spark = df.sparkSession
    num = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    # The repartition sits BETWEEN the token-hash projection and the
    # gram-hash projection: two adjacent Projects would be merged by
    # CollapseProject, inlining the whole token-hash transform into every
    # element_at reference — O(n^2) md5s per document (measured 20x
    # slower).  An exchange is a collapse barrier, and it is the same
    # doc-keyed exchange the window needs anyway; it now also ships the
    # compact long-array th instead of raw text.
    base = (
        df.select(
            F.col(id_col),
            F.transform(
                toks, lambda t: portable_hash(t, hex_chars=7)
            ).alias("th"),
        )
        .repartition(num, F.col(id_col))
        .select(
            F.col(id_col), _winnow_gram_hashes(F.col("th"), k).alias("gs")
        )
    )
    # posexplode_OUTER, not posexplode: a plain generate triggers
    # InferFiltersFromGenerate, which pushes a size(gs) > 0 predicate down
    # BELOW the exchange with the whole gram-hash expression substituted
    # in terms of raw text — an interpreted O(tokens x grams) monster
    # evaluated per input row at the scan (measured 20x the query cost).
    # The outer variant infers nothing; the null rows it would keep for
    # empty arrays (which never occur — every doc yields >= 1 gram) are
    # dropped by a cheap bound-column filter after the explode.
    g = base.select(
        F.col(id_col),
        F.size("gs").alias("ng"),
        F.posexplode_outer("gs").alias("pos", "gh"),
    ).where(F.col("gh").isNotNull() & (F.col("pos") < _WINNOW_POS_LIMIT))
    packed = F.col("gh") * F.lit(_WINNOW_POS_LIMIT) + (
        F.lit(_WINNOW_POS_MASK) - F.col("pos")
    ).cast("long")

    from pyspark.sql import Window

    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        g.select(
            F.col(id_col),
            F.col("ng"),
            F.col("pos"),
            F.min(packed).over(win).alias("m"),
        )
        .where(F.col("pos") <= F.greatest(F.col("ng") - w, F.lit(0)))
        .select(
            F.col(id_col),
            (F.lit(_WINNOW_POS_MASK) - F.col("m") % F.lit(_WINNOW_POS_LIMIT))
            .cast("int")
            .alias("fp_pos"),
            F.expr(f"m DIV {_WINNOW_POS_LIMIT}").alias("fp_hash"),
        )
        .distinct()
    )


def winnow_oracle_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
) -> str:
    """DuckDB twin of `winnow_fingerprints` — identical per-token md5,
    identical Horner rolling combine and 40-bit reduction, identical
    packed-BIGINT rightmost-min tie-break, identical padded-gram
    semantics for short documents."""
    lim, mask = _WINNOW_POS_LIMIT, _WINNOW_POS_MASK
    a, p_mod, hl = _WINNOW_A, _WINNOW_P, _WINNOW_HASH_LIMIT
    he = "CAST(('0x' || substring(md5('#0'), 1, 7)) AS BIGINT)"

    def horner(get) -> str:
        acc = get(0)
        for j in range(1, k):
            acc = f"(({acc}) * {a} + {get(j)}) % {p_mod}"
        return f"(({acc}) % {hl})"

    full = horner(lambda j: f"th[i+1+{j}]")
    short = horner(lambda j: f"COALESCE(th[{j + 1}], {he})")
    return f"""
WITH src AS ({docs_sql}),
tk AS (SELECT {id_col}, string_split_regex(trim(lower(text)), ' +') AS t
       FROM src),
thc AS (
  SELECT {id_col},
         list_transform(t, x ->
           CAST(('0x' || substring(md5(x || '#' || '0'), 1, 7)) AS BIGINT)
         ) AS th
  FROM tk),
gr AS (
  SELECT {id_col},
    CASE WHEN len(th) >= {k}
      THEN list_transform(range(0, len(th) - {k} + 1), i -> {full})
      ELSE [{short}] END AS gs
  FROM thc),
g AS (
  SELECT {id_col}, len(gs) AS ng, CAST(i AS INT) AS pos, gs[i+1] AS gh
  FROM (SELECT {id_col}, gs, unnest(range(0, len(gs))) AS i FROM gr)),
pk AS (
  SELECT {id_col}, ng, pos, gh * {lim} + CAST({mask} - pos AS BIGINT) AS p
  FROM g WHERE pos < {lim}),
wm AS (
  SELECT {id_col}, ng, pos,
         MIN(p) OVER (PARTITION BY {id_col} ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m
  FROM pk)
SELECT DISTINCT {id_col},
       CAST({mask} - (m % {lim}) AS INT) AS fp_pos,
       CAST(m // {lim} AS BIGINT) AS fp_hash
FROM wm
WHERE pos <= greatest(ng - {w}, 0)
"""


def _drop_hot_fingerprints(
    fps: DataFrame, max_fp_df: int, label: str
) -> DataFrame:
    """Exclude fingerprints present in more than ``max_fp_df`` documents
    from a (id, fp_hash) frame, logging the drop (no-silent-caps; the ONE
    implementation shared by the self-join and cross-corpus matchers —
    the fp-family twin of dedup._drop_hot_buckets).  `fps` must already
    be materialized (checkpointed): it feeds the DF aggregate and the
    surviving join side."""
    hot = (
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_fp_df)
        .select("fp_hash", "_df")
        .localCheckpoint(eager=True)
    )
    dropped = hot.agg(F.count(F.lit(1)), F.sum("_df")).first()
    if dropped[0]:
        import logging

        logging.getLogger(__name__).warning(
            "%s: dropped %d hot fingerprints covering %d (doc, fp) rows "
            "(document frequency > %d); byte-identical boilerplate belongs "
            "to exact_dup_groups",
            label, dropped[0], dropped[1], max_fp_df,
        )
    return fps.join(F.broadcast(hot.select("fp_hash")), "fp_hash", "left_anti")


def winnow_dup_pairs(
    df: DataFrame,
    min_shared: int = 2,
    k: int = 4,
    w: int = 4,
    max_fp_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, shared): document pairs sharing at least
    ``min_shared`` winnowing fingerprints — the MOSS match step over
    `winnow_fingerprints`.  By the winnowing guarantee, any two documents
    sharing a token run of >= w+k-1 tokens per matched region surface here.

    Scale shape: the pair join runs on DISTINCT (doc, fp_hash) rows and is
    keyed by fp_hash, so only docs sharing a fingerprint ever meet.
    Fingerprints appearing in more than ``max_fp_df`` documents
    (boilerplate at corpus scale — the d^2 join bomb) are dropped from the
    join with a broadcast anti join, same discipline as the shingle-DF cap
    in `ngram_jaccard_pairs`; the fingerprint frame is localCheckpoint'd
    (EAGER) since it feeds the DF aggregate and both join sides.
    """
    fps = (
        winnow_fingerprints(df, id_col=id_col, text_col=text_col, k=k, w=w)
        .select(id_col, "fp_hash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    join_side = fps
    if max_fp_df is not None:
        join_side = _drop_hot_fingerprints(fps, max_fp_df, "winnow_dup_pairs")
    a = join_side.select(F.col(id_col).alias("doc_a"), "fp_hash")
    b = join_side.select(F.col(id_col).alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def winnow_dups_oracle_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    min_shared: int = 2,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `winnow_dup_pairs` — cap-free (the DF cap is
    guard-tested never to bind at the compare scale)."""
    inner = winnow_oracle_sql(docs_sql, id_col=id_col, k=k, w=w)
    return f"""
WITH fps AS MATERIALIZED (
  SELECT DISTINCT {id_col}, fp_hash FROM ({inner})
)
SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM fps a JOIN fps b ON a.fp_hash = b.fp_hash AND a.{id_col} < b.{id_col}
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, c12, pmi): pointwise mutual information over adjacent
    token pairs — collocation / multiword-phrase mining, the standard
    corpus-analysis signal for tokenizer-vocab and phrase decisions.

    PMI = ln(c12 * N / (c1 * c2)) with c1/c2 the left/right positional
    marginals of the bigram table and N its total mass — all INTEGER
    counts off one bigram aggregation (the `bigram_logprob_scores` array
    extraction, no positional self-join); the single ln() runs on
    identical integer-derived doubles in both engines, ROUND(_, 6).
    Pairs with c12 < ``min_count`` are dropped (noise floor — PMI of
    rare pairs is unstable and their count makes the output corpus-
    vocabulary-bounded, not corpus-bounded).
    """
    t = docs.select(
        F.filter(
            tokens(F.lower(F.col(text_col))), lambda x: F.length(x) > 0
        ).alias("_toks"),
    ).where(F.size("_toks") >= 2)
    big = (
        t.select(
            F.slice("_toks", F.lit(1), F.size("_toks") - 1).alias("w1s"),
            F.slice("_toks", F.lit(2), F.size("_toks") - 1).alias("w2s"),
        )
        .select(F.explode(F.arrays_zip("w1s", "w2s")).alias("bg"))
        .select(F.col("bg.w1s").alias("w1"), F.col("bg.w2s").alias("w2"))
    )
    counts = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    ).localCheckpoint(eager=True)
    # ^ feeds the two marginals, the total, and the output — one
    # aggregation pass over the corpus, three tiny derivations after
    left = counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    right = counts.groupBy("w2").agg(F.sum("c12").alias("c2"))
    total = counts.agg(F.sum("c12").cast("double").alias("n"))
    return (
        counts.where(F.col("c12") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("n")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def pmi_oracle_sql(
    table: str = "documents",
    min_count: int = 5,
    text_col: str = "text",
) -> str:
    """DuckDB twin of `pmi_collocations`."""
    return f"""
WITH t AS (
  SELECT list_filter(string_split_regex(lower(trim({text_col})), ' +'),
                     x -> length(x) > 0) AS toks
  FROM {table}
),
t2 AS (
  SELECT toks[1:len(toks)-1] AS w1s, toks[2:len(toks)] AS w2s
  FROM t WHERE len(toks) >= 2
),
big AS (SELECT unnest(w1s) AS w1, unnest(w2s) AS w2 FROM t2),
counts AS MATERIALIZED (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY 1, 2
),
lft AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM counts GROUP BY 1),
rgt AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM counts GROUP BY 1),
tot AS (SELECT CAST(SUM(c12) AS DOUBLE) AS n FROM counts)
SELECT w1, w2, c12,
       ROUND(ln(CAST(c12 AS DOUBLE) * n
                / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) AS pmi
FROM counts JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
WHERE c12 >= {min_count}
"""


def source_divergence(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_tokens, kl_nanos): KL(source token distribution ||
    corpus token distribution) per source, in integer NANO-units — the
    mixture-drift signal (a source whose vocabulary usage diverges from
    the corpus stands out long before manual inspection finds it).

    KL is finite by construction: every source token IS a corpus token,
    so q(w) > 0 wherever p(w) > 0.  One (source, token) count aggregation
    feeds everything — per-source totals, corpus marginals, and the final
    sum.  Each per-term contribution p*ln(p/q) is computed elementwise on
    identical integer-derived doubles in both engines, scaled by 1e9 and
    rounded to a BIGINT BEFORE the sum (the betweenness micro-unit
    discipline): integer sums are summation-order-independent, so the
    ROUND(float-SUM) .5-boundary cross-engine flip cannot occur.  The
    ±0.5 nano quantization per term is the operator contract.
    """
    st = (
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(
                F.filter(
                    tokens(F.lower(F.col(text_col))),
                    lambda x: F.length(x) > 0,
                )
            ).alias("term"),
        )
        .groupBy("src", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    stot = st.groupBy("src").agg(F.sum("c").alias("ns"))
    corpus = st.groupBy("term").agg(F.sum("c").alias("cw"))
    ntot = st.agg(F.sum("c").cast("double").alias("n"))
    term_nanos = F.round(
        F.lit(1e9)
        * F.col("c").cast("double")
        / F.col("ns").cast("double")
        * F.log(
            F.col("c").cast("double")
            * F.col("n")
            / (F.col("ns").cast("double") * F.col("cw").cast("double"))
        )
    ).cast("long")
    return (
        st.join(F.broadcast(stot), "src")
        .join(corpus, "term")
        .crossJoin(F.broadcast(ntot))
        .select("src", "ns", term_nanos.alias("_t"))
        .groupBy("src", "ns")
        .agg(F.sum("_t").alias("kl_nanos"))
        .select(
            F.col("src").alias("source"),
            F.col("ns").alias("n_tokens"),
            "kl_nanos",
        )
    )


def source_divergence_oracle_sql(
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `source_divergence`."""
    return f"""
WITH st AS MATERIALIZED (
  SELECT {source_col} AS src, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT {source_col},
           unnest(list_filter(
             string_split_regex(lower(trim({text_col})), ' +'),
             x -> length(x) > 0)) AS term
    FROM {table}
  ) GROUP BY 1, 2
),
stot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS ns FROM st GROUP BY 1),
corpus AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cw FROM st GROUP BY 1),
ntot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM st)
SELECT src AS source, ns AS n_tokens,
       CAST(SUM(CAST(ROUND(
         1e9 * CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)
         * ln(CAST(c AS DOUBLE) * n
              / (CAST(ns AS DOUBLE) * CAST(cw AS DOUBLE)))
       ) AS BIGINT)) AS BIGINT) AS kl_nanos
FROM st JOIN stot USING (src) JOIN corpus USING (term) CROSS JOIN ntot
GROUP BY 1, 2
"""


def doc_token_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, entropy_nanos): Shannon entropy of
    each document's OWN token distribution in integer NANO-units —
    H = -sum_t p_t ln p_t = sum_t (c_t/N) ln(N/c_t) — the within-document
    lexical-diversity quality signal (keyword-stuffed or template text
    scores near 0; varied prose scores near ln(N)).  Complements
    `repetition_ratio` (n-gram duplication) and the corpus-level LM scores
    (`unigram_logprob_scores`): this one needs no corpus model at all.

    Exactness: per-TERM contributions are computed elementwise on
    identical integer-derived doubles in both engines, scaled by 1e9 and
    rounded to BIGINT BEFORE the per-document sum (the source_divergence
    nano-unit discipline) — no float-SUM ordering exposure.  Every term
    has c_t >= 1 so ln(N/c_t) >= 0 and entropy_nanos >= 0.  Documents
    with no tokens get no row.

    Scale shape: one (doc, term) count aggregate, one per-doc total join
    keyed on the doc id, one final per-doc sum — embarrassingly
    partitionable by document, no corpus-wide state."""
    tc = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(
                    tokens(F.lower(F.col(text_col))),
                    lambda x: F.length(x) > 0,
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    term_nanos = F.round(
        F.lit(1e9)
        * F.col("c").cast("double")
        / F.col("n_tokens").cast("double")
        * F.log(F.col("n_tokens").cast("double") / F.col("c").cast("double"))
    ).cast("long")
    return (
        tc.join(tot, "doc_id")
        .select("doc_id", "n_tokens", "n_distinct", term_nanos.alias("_t"))
        .groupBy("doc_id", "n_tokens", "n_distinct")
        .agg(F.sum("_t").cast("long").alias("entropy_nanos"))
    )


def doc_entropy_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `doc_token_entropy`."""
    return f"""
WITH tc AS MATERIALIZED (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT {id_col} AS doc_id,
           unnest(list_filter(
             string_split_regex(lower(trim({text_col})), ' +'),
             x -> length(x) > 0)) AS term
    FROM {table}
  ) GROUP BY 1, 2),
tot AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM tc GROUP BY 1)
SELECT doc_id, n_tokens, n_distinct,
       CAST(SUM(CAST(ROUND(
         1e9 * CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         * ln(CAST(n_tokens AS DOUBLE) / CAST(c AS DOUBLE))
       ) AS BIGINT)) AS BIGINT) AS entropy_nanos
FROM tc JOIN tot USING (doc_id)
GROUP BY 1, 2, 3
"""


def dsir_importance_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, dsir_nanos): hashed-n-gram importance weights for
    Data Selection via Importance Resampling (DSIR, Xie et al. 2023) — the
    published LLM-pretraining recipe for picking raw-corpus documents that
    resemble a trusted target corpus.  ``target`` is a boolean row
    predicate naming the target corpus (NULL coalesces to false); every
    document is scored by

        w(x) = sum_{g in grams(x)} ln( p_target(b(g)) / p_raw(b(g)) ),

    where grams are lowercase unigrams + adjacent bigrams, b(g) hashes the
    gram into ``n_buckets`` buckets (portable 48-bit md5 hash, identical
    in both engines), and each bucket's probability is add-1 smoothed:
    p(b) = (cnt(b)+1) / (total+B).  High scores = looks like the target.

    Exactness: each per-BUCKET log-ratio is computed once, elementwise on
    identical integer-derived doubles in both engines, scaled by 1e9 and
    rounded to a BIGINT BEFORE the per-document sum (the source_divergence
    nano-unit discipline) — integer sums are summation-order-independent,
    so no float-SUM .5-boundary exposure.  The ±0.5 nano quantization per
    bucket term is the operator contract.  Documents with no tokens get no
    row (they have no grams to score).

    Scale shape: one (doc, gram-occurrence) expansion feeds ONE bucket
    aggregate (state = ``n_buckets`` rows, tiny by design) and one
    broadcast join back onto the occurrences — no self-join, no window,
    no per-row Python."""
    toks = F.filter(
        tokens(F.lower(F.col(text_col))), lambda x: F.length(x) > 0
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(target, F.lit(False)).alias("is_t"),
        toks.alias("_toks"),
    )
    n = F.size("_toks")
    pair_len = F.greatest(n - 1, F.lit(0))  # ANSI: slice throws on negatives
    bigrams = F.zip_with(
        F.slice("_toks", 1, pair_len),
        F.slice("_toks", 2, pair_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g = (
        base.select(
            "doc_id", "is_t", F.explode(F.concat("_toks", bigrams)).alias("gram")
        )
        .select(
            "doc_id",
            "is_t",
            (portable_hash(F.col("gram"), seed) % n_buckets).alias("bucket"),
        )
        # feeds the bucket-count aggregate AND the score join: one pass
        .localCheckpoint(eager=True)
    )
    cnt = g.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(~F.col("is_t"), 1).otherwise(0)).cast("long").alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("double").alias("t_tot"),
        F.sum("cr").cast("double").alias("r_tot"),
    )
    w_nano = F.round(
        F.lit(1e9)
        * F.log(
            ((F.col("ct") + 1).cast("double") / (F.col("t_tot") + n_buckets))
            / ((F.col("cr") + 1).cast("double") / (F.col("r_tot") + n_buckets))
        )
    ).cast("long")
    wb = cnt.crossJoin(F.broadcast(tot)).select("bucket", w_nano.alias("w_nano"))
    return (
        g.join(F.broadcast(wb), "bucket")  # wb is <= n_buckets rows
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("w_nano").cast("long").alias("dsir_nanos"),
        )
    )


def dsir_oracle_sql(
    table: str = "documents",
    target_expr: str = "source = 'src0'",
    n_buckets: int = 4096,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `dsir_importance_weights`; ``target_expr`` is any
    boolean SQL expression over the table's columns."""
    return f"""
WITH dt AS MATERIALIZED (
  SELECT {id_col} AS doc_id, COALESCE({target_expr}, FALSE) AS is_t,
         list_filter(string_split_regex(lower(trim({text_col})), ' +'),
                     x -> length(x) > 0) AS toks
  FROM {table}),
tok AS (SELECT doc_id, is_t, unnest(toks) AS term,
               generate_subscripts(toks, 1) AS ord FROM dt),
gram AS MATERIALIZED (
  SELECT doc_id, is_t,
         CAST(('0x' || substring(md5(gram || '#' || '{seed}'), 1, 12))
              AS BIGINT) % {n_buckets} AS bucket
  FROM (
    SELECT doc_id, is_t, term AS gram FROM tok
    UNION ALL
    SELECT doc_id, is_t, term || ' ' || nxt AS gram FROM (
      SELECT doc_id, is_t, term,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
      FROM tok)
    WHERE nxt IS NOT NULL)),
cnt AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS cr
  FROM gram GROUP BY 1),
tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS t_tot,
               CAST(SUM(cr) AS DOUBLE) AS r_tot FROM cnt),
wb AS (
  SELECT bucket, CAST(ROUND(1e9 * ln(
    (CAST(ct + 1 AS DOUBLE) / (t_tot + {n_buckets}))
    / (CAST(cr + 1 AS DOUBLE) / (r_tot + {n_buckets})))) AS BIGINT) AS w_nano
  FROM cnt CROSS JOIN tot)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(w.w_nano) AS BIGINT) AS dsir_nanos
FROM gram g JOIN wb w USING (bucket)
GROUP BY 1
"""


def cross_corpus_winnow_matches(
    new: DataFrame,
    old: DataFrame,
    min_shared: int = 1,
    k: int = 4,
    w: int = 4,
    max_fp_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(new_id, old_id, shared): incoming documents sharing at least
    ``min_shared`` winnowing fingerprints with the historical corpus —
    the incremental-ingestion twin of `winnow_dup_pairs` (one corpus per
    side, never a within-corpus self-join), completing the fingerprint
    family's stream-shaped story alongside the LSH signature index.

    The document-frequency cap applies to the HISTORICAL side only
    (that is where accumulated boilerplate lives; the microbatch side is
    small by construction) — same discipline as the cross-corpus LSH
    candidates; cap-free oracle, guard-tested never to bind at gate
    scale.  EAGER with the cap enabled: the historical fingerprint frame
    is localCheckpoint'd at call time (it feeds the DF aggregate and the
    join side) — pass ``max_fp_df=None`` to only inspect the plan.
    """
    fn = (
        winnow_fingerprints(new, id_col=id_col, text_col=text_col, k=k, w=w)
        .select(F.col(id_col).alias("new_id"), "fp_hash")
        .distinct()
    )
    fo = (
        winnow_fingerprints(old, id_col=id_col, text_col=text_col, k=k, w=w)
        .select(F.col(id_col).alias("old_id"), "fp_hash")
        .distinct()
    )
    if max_fp_df is not None:
        fo = _drop_hot_fingerprints(
            fo.localCheckpoint(eager=True),
            max_fp_df,
            "cross_corpus_winnow_matches",
        )
    return (
        fn.join(fo, "fp_hash")
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def cross_corpus_winnow_oracle_sql(
    new_sql: str,
    old_sql: str,
    min_shared: int = 1,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `cross_corpus_winnow_matches` (cap-free)."""
    nf = winnow_oracle_sql(new_sql, id_col=id_col, k=k, w=w)
    of = winnow_oracle_sql(old_sql, id_col=id_col, k=k, w=w)
    return f"""
WITH nf AS MATERIALIZED (
  SELECT DISTINCT {id_col} AS new_id, fp_hash FROM ({nf})
),
of AS MATERIALIZED (
  SELECT DISTINCT {id_col} AS old_id, fp_hash FROM ({of})
)
SELECT new_id, old_id, CAST(COUNT(*) AS BIGINT) AS shared
FROM nf JOIN of USING (fp_hash)
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""


# ---------------------------------------------------------------------------
# Paragraph-granularity winnow dedup (sub-document near-dup pairs)
# ---------------------------------------------------------------------------

PARA_TOKENS = 16  # tokens per pseudo-paragraph block
PARA_STRIDE = 256  # paragraphs-per-doc id stride (cap modeled in BOTH engines)


def paragraph_rows(
    docs: DataFrame,
    para_tokens: int = PARA_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(pid, text): documents re-keyed to fixed token blocks — the
    sub-document unit for paragraph-granularity dedup (Lee et al.'s point:
    near-dup TEXT lives inside documents whose doc-level signature
    differs).  The corpus has no paragraph markers, so blocks of
    ``para_tokens`` whitespace tokens stand in — the same fixed-block
    discipline `span_corruption` uses.  pid = doc * PARA_STRIDE + block
    (block count capped at the stride; the cap is part of the operator's
    definition and the SQL twin applies it identically — no guard test
    needed, unlike caps the oracle cannot see).

    Scale shape: one narrow projection builds the token array, a
    posexplode over the per-doc block range fans out (the Generate sits
    between the array-build and the slice projections, so CollapseProject
    cannot inline the tokenizer into every slice reference), and each
    block rejoins to a short string.  Rows out ~= tokens/para_tokens —
    linear, no shuffle at all (the consumer decides the partitioning)."""
    n_paras = F.least(
        F.expr(f"(size(_toks) + {para_tokens - 1}) div {para_tokens}"),
        F.lit(PARA_STRIDE).cast("long"),
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias("_doc"),
            tokens(F.lower(F.col(text_col))).alias("_toks"),
        )
        # NULL text => size(_toks) = -1 => n_paras = 0 and
        # sequence(0, -1) emits Spark's DESCENDING [0, -1]: two phantom
        # rows whose _pi = -1 pid collides with doc-1's paragraph 255.
        # The DuckDB twin's range(0, NULL) emits zero rows, so NULL docs
        # must be dropped here too.  ('' stays: both engines tokenize it
        # to [''], one empty paragraph.)
        .where(F.size("_toks") > 0)
        .select(
            "_doc",
            "_toks",
            F.posexplode_outer(F.sequence(F.lit(0).cast("long"), n_paras - 1)).alias(
                "_pp", "_pi"
            ),
        )
        .where(F.col("_pi").isNotNull())
        .select(
            (F.col("_doc") * F.lit(PARA_STRIDE) + F.col("_pi")).alias("pid"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_toks"),
                    (F.col("_pi") * para_tokens + 1).cast("int"),
                    para_tokens,
                ),
            ).alias("text"),
        )
    )


def paragraph_rows_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    para_tokens: int = PARA_TOKENS,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `paragraph_rows` (same tokenizer, same integer
    block-count formula, same stride cap, same single-space rejoin)."""
    p, s = para_tokens, PARA_STRIDE
    return f"""
SELECT CAST(t.{id_col} * {s} + pi AS BIGINT) AS pid,
       array_to_string(list_slice(t.toks, pi*{p}+1, pi*{p}+{p}), ' ') AS text
FROM (
  SELECT {id_col}, toks,
         unnest(range(0, LEAST((len(toks) + {p - 1}) // {p}, {s}))) AS pi
  FROM (SELECT {id_col}, string_split_regex(trim(lower(text)), ' +') AS toks
        FROM ({docs_sql}) d) x
  WHERE len(toks) > 0  -- NULL-doc guard, mirrors the Spark-side filter
) t
"""


def split_pid(pid) -> tuple:
    """(doc, para) columns from a composite paragraph id — the ONE decode
    matching `paragraph_rows`' encode (winnow_paragraph_dups and the
    streaming store both go through here, so encode/decode cannot
    drift)."""
    return (
        F.floor(pid / F.lit(PARA_STRIDE)).cast("long"),
        (pid % F.lit(PARA_STRIDE)).cast("int"),
    )


def winnow_paragraph_dups(
    docs: DataFrame,
    min_shared: int = 2,
    para_tokens: int = PARA_TOKENS,
    k: int = 4,
    w: int = 4,
    max_fp_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, para_a, doc_b, para_b, shared): CROSS-document paragraph
    pairs sharing >= ``min_shared`` winnowing fingerprints — sub-document
    near-dup detection (`winnow_dup_pairs` re-keyed on the composite
    paragraph id; within-document pairs are dropped, they are the
    repetition signal `doc_repetition` already measures)."""
    paras = paragraph_rows(docs, para_tokens, id_col=id_col, text_col=text_col)
    pairs = winnow_dup_pairs(
        paras,
        min_shared=min_shared,
        k=k,
        w=w,
        max_fp_df=max_fp_df,
        id_col="pid",
        text_col="text",
    )
    da, pa = split_pid(F.col("doc_a"))
    db, pb = split_pid(F.col("doc_b"))
    return (
        pairs.select(
            da.alias("da"),
            pa.alias("para_a"),
            db.alias("db"),
            pb.alias("para_b"),
            "shared",
        )
        .where(F.col("da") != F.col("db"))
        .select(
            F.col("da").alias("doc_a"),
            "para_a",
            F.col("db").alias("doc_b"),
            "para_b",
            "shared",
        )
    )


def winnow_paragraph_dups_oracle_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    min_shared: int = 2,
    para_tokens: int = PARA_TOKENS,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `winnow_paragraph_dups` (cap-free fingerprint join
    like `winnow_dups_oracle_sql`; the paragraph stride cap IS modeled)."""
    s = PARA_STRIDE
    inner = winnow_dups_oracle_sql(
        paragraph_rows_sql(docs_sql, para_tokens, id_col=id_col),
        min_shared=min_shared,
        k=k,
        w=w,
        id_col="pid",
    )
    return f"""
WITH wpd AS MATERIALIZED ({inner})
SELECT CAST(doc_a // {s} AS BIGINT) AS doc_a, CAST(doc_a % {s} AS INT) AS para_a,
       CAST(doc_b // {s} AS BIGINT) AS doc_b, CAST(doc_b % {s} AS INT) AS para_b,
       shared
FROM wpd WHERE doc_a // {s} <> doc_b // {s}
"""


def tfidf_top_terms_oracle_sql(k: int = 3) -> str:
    """DuckDB twin of ``tfidf_top_terms`` over the documents table:
    whitespace tokenization, smoothed idf ln((N+1)/(df+1)) + 1, per-doc
    ROW_NUMBER top-k on (score DESC, term ASC)."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), ' +'),
                            t -> length(t) > 0)) AS term
  FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS MATERIALIZED (
  SELECT term, ROUND(LN((n.n_docs + 1.0) / (COUNT(*) + 1.0)) + 1.0, 6) AS idf
  FROM tf CROSS JOIN n GROUP BY term, n.n_docs
),
scored AS (
  SELECT tf.doc_id, tf.term, ROUND(tf.tf * idf.idf, 6) AS score
  FROM tf JOIN idf USING (term)
)
SELECT doc_id, term, score, pos FROM (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS pos
  FROM scored
) t WHERE pos <= {int(k)}
"""
