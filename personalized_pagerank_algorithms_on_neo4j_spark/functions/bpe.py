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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LOCAL_DOC_COUNT, LOCAL_TEXT_BYTES
from .text import tokens

BPE_ROUNDS = 8


def _stream(col):
    """Double-space-delimited symbol stream (see module doc)."""
    return F.concat(
        F.lit("  "), F.array_join(tokens(F.lower(col)), "  "), F.lit("  ")
    )


# ---------------------------------------------------------------------------
# Driver-local corpus kernels (round-12 optimization)
# ---------------------------------------------------------------------------
# Every public operator below is a bounded recurrence over the corpus's
# token streams: the trainers scan the corpus once per round (8 rounds /
# 5 batch rounds), the apply sides replay the merge table as a rank-order
# fold of literal replaces, and the longest-match encoder walks per-doc
# positions.  When the corpus fits on the driver (count + byte gate,
# config.LOCAL_DOC_COUNT / LOCAL_TEXT_BYTES — env-parameterised like the
# edge cutoff), ONE collect replaces all of those Spark jobs and the
# recurrence replays in vectorized numpy over an int-coded flat token
# array.  Bit-exactness argument (pinned by parity tests):
#
# * tokenization replays tokens(lower(text)) = split(trim(s), ' +') —
#   Python re.split(' +') over str.strip(' ') of the lowered text; the
#   kernel REFUSES non-ASCII corpora (falls through to the distributed
#   path) so locale lowercasing differences cannot arise, and refuses
#   null texts for the same reason.
# * a merge's literal replace " l  r " -> " l(sep)r " over the
#   double-space stream is EXACTLY a single left-to-right non-overlapping
#   fuse pass over the token list (the delimiter design guarantees
#   occurrences share no characters; the scan resumes after each
#   replacement, so a freshly merged token can never re-match within the
#   same pass — l(sep)r is strictly longer than l and can equal neither
#   side).  Adjacent candidate positions conflict only when lhs == rhs,
#   where the left-to-right scan keeps alternate matches from each run
#   head — the `(idx - run_start) % 2 == 0` rule in `_fuse_pair`.
# * pair selection = (count desc, lhs asc, rhs asc): Spark's string
#   ordering is binary UTF-8, Python's is code-point — identical
#   orderings (UTF-8 is order-preserving), and the gate admits ASCII
#   only anyway.
# * merged token STRINGS are interned through one vocab dict, so two
#   merge paths producing the same surface string collapse to one symbol
#   exactly as they do in the character stream.

_TOKEN_SPLIT = re.compile(" +")


def _collect_corpus(docs: DataFrame, text_col: str, id_col: str | None = None):
    """(ids_or_None, token_lists) collected to the driver, or None when
    the corpus exceeds the gate / contains nulls or non-ASCII text (the
    distributed pipelines keep those cases)."""
    if LOCAL_DOC_COUNT <= 0 or LOCAL_TEXT_BYTES <= 0:
        return None
    if docs.count() > LOCAL_DOC_COUNT:
        return None
    probe = docs.agg(
        F.count(F.lit(1)).alias("c"),
        F.count(text_col).alias("nn"),
        F.sum(F.octet_length(F.col(text_col))).alias("b"),
    ).collect()[0]
    if probe["nn"] != probe["c"] or (probe["b"] or 0) > LOCAL_TEXT_BYTES:
        return None
    cols = [F.col(text_col).alias("_t")]
    if id_col is not None:
        cols.insert(0, F.col(id_col).alias("_i"))
    pdf = docs.select(*cols).toPandas()
    split = _TOKEN_SPLIT.split
    toks: list[list[str]] = []
    for t in pdf["_t"]:
        if not t.isascii():
            return None
        toks.append(split(t.lower().strip(" ")))
    ids = pdf["_i"] if id_col is not None else None
    return ids, toks


def _corpus_arrays(token_lists: list[list[str]]):
    """Int-coded flat token array + per-token doc index + vocab tables."""
    import numpy as np

    vocab: dict[str, int] = {}
    total = sum(len(t) for t in token_lists)
    flat = np.empty(total, dtype=np.int64)
    doc_of = np.empty(total, dtype=np.int64)
    k = 0
    for d, ts in enumerate(token_lists):
        for t in ts:
            flat[k] = vocab.setdefault(t, len(vocab))
            doc_of[k] = d
            k += 1
    return flat, doc_of, vocab, list(vocab)


def _fuse_pair(flat, doc_of, lid: int, rid: int, nid: int):
    """One literal-replace pass: fuse every left-to-right non-overlapping
    adjacent (lid, rid) within a doc into nid.  Returns the (possibly new)
    arrays and whether anything fired."""
    import numpy as np

    cand = (flat[:-1] == lid) & (flat[1:] == rid) & (doc_of[:-1] == doc_of[1:])
    idx = np.nonzero(cand)[0]
    if idx.size == 0:
        return flat, doc_of, False
    if lid == rid and idx.size > 1:
        # runs of consecutive candidates share tokens; the left-to-right
        # scan keeps every other match starting at each run head
        new_run = np.empty(idx.size, dtype=bool)
        new_run[0] = True
        np.not_equal(np.diff(idx), 1, out=new_run[1:])
        run_start = idx[new_run][np.cumsum(new_run) - 1]
        idx = idx[((idx - run_start) & 1) == 0]
    flat[idx] = nid
    keep = np.ones(flat.size, dtype=bool)
    keep[idx + 1] = False
    return flat[keep], doc_of[keep], True


def _top_pairs(flat, doc_of, vocab, rev, b: int):
    """Top-``b`` adjacent pairs by (count desc, lhs asc, rhs asc) over the
    current streams — the round-opening counting + selection of both
    trainers.  Returns [(lhs, rhs, n)] in rank order (may be < b)."""
    import heapq

    import numpy as np

    from .._nputil import group_count

    same_doc = doc_of[:-1] == doc_of[1:]
    v = len(rev)
    key = flat[:-1][same_doc] * v + flat[1:][same_doc]
    if key.size == 0:
        return []
    uniq, counts = group_count(key)
    order = np.argsort(-counts, kind="stable")
    out: list[tuple[str, str, int]] = []
    i = 0
    while i < order.size and len(out) < b:
        c = counts[order[i]]
        j = i
        while j < order.size and counts[order[j]] == c:
            j += 1
        grp = uniq[order[i:j]]
        pairs = [(rev[k // v], rev[k % v]) for k in grp.tolist()]
        need = b - len(out)
        if len(pairs) > need:
            pairs = heapq.nsmallest(need, pairs)
        else:
            pairs.sort()
        out.extend((l, r, int(c)) for l, r in pairs)
        i = j
    return out


def _intern(vocab: dict[str, int], rev: list[str], s: str) -> int:
    nid = vocab.setdefault(s, len(rev))
    if nid == len(rev):
        rev.append(s)
    return nid


def _local_train(token_lists, schedule: list[int], sep: str):
    """The batched-greedy trainer's exact recurrence on the driver: per
    round, count -> top-B by (n desc, lhs, rhs) -> apply sequentially in
    rank order.  schedule=[1]*rounds IS the one-merge-per-round trainer.
    Returns ([(round, rank, lhs, rhs, n)], final (flat, doc_of, vocab,
    rev) state)."""
    flat, doc_of, vocab, rev = _corpus_arrays(token_lists)
    merges: list[tuple[int, int, str, str, int]] = []
    for rnd, bsize in enumerate(schedule):
        batch = _top_pairs(flat, doc_of, vocab, rev, bsize)
        if not batch:
            break
        for rank, (l, r, n) in enumerate(batch):
            merges.append((rnd, rank, l, r, n))
            nid = _intern(vocab, rev, l + sep + r)
            flat, doc_of, _ = _fuse_pair(flat, doc_of, vocab[l], vocab[r], nid)
    return merges, (flat, doc_of, vocab, rev)


def _local_longest_match(
    docs: DataFrame,
    local,
    pieces: list[str],
    id_col: str,
    oracle_round_bound: int | None,
) -> DataFrame:
    """Per-doc greedy maximal munch on the driver — the pointer-doubling
    walk's exact fixed point (the walk computes next(pos) = pos +
    maxlen(pos) from 0; this just follows it sequentially).  Keeps the
    doubling-round-bound raise so a paired fixed-unroll oracle fails
    loudly on the same inputs as the distributed path."""
    import pandas as pd

    ids, toks = local
    lens = sorted({p.count("_") + 1 for p in pieces}, reverse=True)
    maxw = max((len(t) for t in toks), default=0) or 1
    rounds = max(1, (max(maxw, 2) - 1).bit_length())
    if oracle_round_bound is not None and rounds > oracle_round_bound:
        raise ValueError(
            f"max doc length {maxw} needs {rounds} doubling rounds; the "
            f"paired oracle unrolls only {oracle_round_bound}"
        )
    pset = set(pieces)
    n_words = []
    n_tokens = []
    for ts in toks:
        n = len(ts)
        pos = 0
        cnt = 0
        while pos < n:
            step = 1
            for length in lens:
                if length <= n - pos and "_".join(ts[pos : pos + length]) in pset:
                    step = length
                    break
            cnt += 1
            pos += step
        n_words.append(n)
        n_tokens.append(cnt)
    id_t = docs.schema[id_col].dataType.simpleString()
    return docs.sparkSession.createDataFrame(
        pd.DataFrame({id_col: ids, "n_words": n_words, "n_tokens": n_tokens}),
        schema=f"{id_col} {id_t}, n_words bigint, n_tokens bigint",
    )


def _local_fold_apply(state, merges: list[tuple[str, str]], sep: str):
    """Rank-order fold of literal replaces — `bpe_fold_apply_counts`'s
    (and therefore `bpe_exact_apply_counts`'s) exact semantics."""
    flat, doc_of, vocab, rev = state
    for l, r in merges:
        lid = vocab.get(l)
        rid = vocab.get(r)
        if lid is None or rid is None:
            continue  # replacing an absent pair is a no-op
        nid = _intern(vocab, rev, l + sep + r)
        flat, doc_of, _ = _fuse_pair(flat, doc_of, lid, rid, nid)
    return flat, doc_of, vocab, rev


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
    local = _collect_corpus(docs, text_col)
    if local is not None:
        merges_l, _ = _local_train(local[1], [1] * rounds, "")
        return spark.createDataFrame(
            [(rnd, l, r, n) for (rnd, _rk, l, r, n) in merges_l],
            "step int, lhs string, rhs string, n bigint",
        )
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
    local = _collect_corpus(docs, text_col, id_col="doc_id")
    if local is not None:
        import numpy as np
        import pandas as pd

        ids, toks = local
        n_before = np.array([len(t) for t in toks], dtype=np.int64)
        _, (_, doc_of, _, _) = _local_train(toks, [1] * rounds, "")
        n_after = np.bincount(doc_of, minlength=len(toks)).astype(np.int64)
        id_t = docs.schema["doc_id"].dataType.simpleString()
        return docs.sparkSession.createDataFrame(
            pd.DataFrame(
                {"doc_id": ids, "n_before": n_before, "n_after": n_after}
            ),
            schema=f"doc_id {id_t}, n_before bigint, n_after bigint",
        )
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


# ---------------------------------------------------------------------------
# Batched BPE training + longest-match apply (the realistic-vocab path)
# ---------------------------------------------------------------------------
# `bpe_merges`/`bpe_compression` above replay ONE merge per round — exact
# greedy BPE, but a 50k-merge production vocab would mean 50k driver
# round-trips and 50k corpus scans.  The scalable pair below fixes both
# ends of the pipeline:
#
# * TRAIN — `bpe_merges_batched`: each round takes the TOP-B pairs of the
#   round-opening counts at once and applies them sequentially in rank
#   order (a deterministic batched-greedy variant: counts are NOT
#   refreshed inside a batch, so a batch member may fuse fewer occurrences
#   than its opening count promised — the standard accuracy/speed trade
#   of batched BPE).  A [128,64,32,16,16] schedule learns 256 merges in
#   FIVE corpus passes instead of 256.  Merged symbols are joined with
#   "_" (tokens are lowercase alnum, so the joint is unambiguous and a
#   piece's word sequence is recoverable by splitting on "_").
# * APPLY — `bpe_longest_match_counts`: greedy maximal-munch tokenization
#   against the learned piece vocabulary (the WordPiece-style apply; it
#   is NOT merge-order replay, and the two can differ on adversarial
#   vocabularies — documented, standard; for EXACT merge-order semantics
#   at a cost independent of vocab size see `bpe_exact_apply_counts`
#   below, which closed the divergence watch item).  Greedy munch looks
#   sequential,
#   but next(pos) = pos + maxlen(pos) is a FUNCTIONAL GRAPH on word
#   positions, so the walk from position 0 is computed by pointer
#   doubling in ceil(log2(max_doc_words)) supersteps — no Python in the
#   loop, no per-document recursion, 100 TB-shaped.
#
# Cross-engine exactness: batch selection is a strict (n DESC, lhs, rhs)
# total order (binary string compare in both engines over the
# lowercase-alnum + "_" alphabet); batch application is a LEFT FOLD of
# literal replaces in rank order (Spark F.aggregate == DuckDB
# list_reduce(list_prepend(...))); the doubling recurrence is unrolled to
# a FIXED round count in the oracle (extra rounds are no-ops past
# convergence, the engine computes its round count from one max-words
# aggregate).

BATCH_SCHEDULE = [128, 64, 32, 16, 16]  # 256 merges in five rounds
ENCODE_DOUBLING_ROUNDS = 8  # oracle unroll: handles docs up to 2^8 tokens


def bpe_merges_batched(
    docs: DataFrame,
    schedule: list[int] | None = None,
    text_col: str = "text",
) -> list[tuple[int, int, str, str, int]]:
    """(round, rank, lhs, rhs, n) tuples: the batched-greedy merge table
    (see block comment).  Returned driver-side — the merge table is the
    bounded trained artifact (sum(schedule) rows), exactly the class of
    driver traffic the 1-row-per-round trainer already produces."""
    schedule = BATCH_SCHEDULE if schedule is None else schedule
    local = _collect_corpus(docs, text_col)
    if local is not None:
        merges_l, _ = _local_train(local[1], schedule, "_")
        return merges_l
    texts = docs.select(_stream(F.col(text_col)).alias("s")).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, int, str, str, int]] = []
    for rnd, batch_size in enumerate(schedule):
        toks = F.split(F.trim(F.col("s")), "  ")
        pairs = (
            texts.select(toks.alias("t"))
            .select(
                F.posexplode_outer(
                    F.zip_with(
                        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                    )
                ).alias("_p", "pr")
            )
            .where(F.col("pr").isNotNull())
            .select("pr.lhs", "pr.rhs")
        )
        batch = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(batch_size)
            .collect()
        )
        if not batch:
            break
        merges.extend(
            (rnd, rank, r["lhs"], r["rhs"], r["n"]) for rank, r in enumerate(batch)
        )
        fold = F.array(
            *[
                F.struct(
                    F.lit(f" {r['lhs']}  {r['rhs']} ").alias("f"),
                    F.lit(f" {r['lhs']}_{r['rhs']} ").alias("r"),
                )
                for r in batch
            ]
        )
        texts = texts.select(
            F.aggregate(
                fold, F.col("s"), lambda acc, m: F.replace(acc, m["f"], m["r"])
            ).alias("s")
        ).localCheckpoint(eager=True)  # next round re-reads it
    return merges


def bpe_longest_match_counts(
    docs: DataFrame,
    pieces: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    oracle_round_bound: int | None = None,
) -> DataFrame:
    """(doc_id, n_words, n_tokens): greedy longest-match tokenization of
    each document against ``pieces`` (multi-word vocabulary entries joined
    by "_"; single words are always implicit fallback tokens), by pointer
    doubling over the next(pos) = pos + maxlen(pos) functional graph —
    see the block comment for the scale argument."""
    local = _collect_corpus(docs, text_col, id_col=id_col)
    if local is not None:
        return _local_longest_match(
            docs, local, pieces, id_col, oracle_round_bound
        )
    from ..plans.iterative import (
        loop_shuffle_partitions,
        static_superstep_plan,
        stats_reset_checkpoint,
    )

    spark = docs.sparkSession
    lens = sorted({p.count("_") + 1 for p in pieces})
    max_len = lens[-1] if lens else 1
    base = docs.select(
        F.col(id_col).alias("doc"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    ).localCheckpoint(eager=True)  # feeds positions AND the final join

    words = base.select("doc", F.posexplode("toks").alias("pos", "word"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy("pos")
    lead_cols = [F.col("word")] + [
        F.lead("word", i).over(w) for i in range(1, max_len)
    ]
    if lens:
        grams = words.select(
            "doc",
            "pos",
            F.array(
                *[
                    F.struct(
                        F.lit(l).alias("l"),
                        # a null lead means the window runs off the doc end;
                        # guard on the LAST lead (nulls only occur at the end)
                        F.when(
                            lead_cols[l - 1].isNotNull(),
                            F.concat_ws("_", *lead_cols[:l]),
                        ).alias("gram"),
                    )
                    for l in lens
                ]
            ).alias("cands"),
        )
        piece_df = spark.createDataFrame([(p,) for p in pieces], "gram string")
        matched = (
            grams.select("doc", "pos", F.explode("cands").alias("c"))
            .where(F.col("c.gram").isNotNull())
            .select(
                "doc", "pos", F.col("c.l").alias("l"), F.col("c.gram").alias("gram")
            )
            .join(F.broadcast(piece_df), "gram")
            .groupBy("doc", "pos")
            .agg(F.max("l").alias("ml"))
        )
        state = (
            words.select("doc", "pos")
            .join(matched, ["doc", "pos"], "left")
            .select(
                "doc",
                "pos",
                (F.col("pos") + F.coalesce(F.col("ml"), F.lit(1))).alias("nxt"),
                F.lit(1).cast("long").alias("cnt"),
            )
        )
    else:
        # empty vocab: every word is its own token, no match phase
        state = words.select(
            "doc",
            "pos",
            (F.col("pos") + 1).alias("nxt"),
            F.lit(1).cast("long").alias("cnt"),
        )
    stats = base.agg(
        F.max(F.size("toks")).alias("maxw"),
        F.sum(F.size("toks")).alias("positions"),
    ).collect()[0]
    maxw = int(stats["maxw"] or 1)
    rounds = max(1, (max(maxw, 2) - 1).bit_length())  # 2^rounds >= maxw
    if oracle_round_bound is not None and rounds > oracle_round_bound:
        # a paired fixed-unroll oracle would silently UNDER-count tokens
        # for docs longer than 2^bound words — fail loudly instead of
        # letting the gate read as an engine divergence
        raise ValueError(
            f"max doc length {maxw} needs {rounds} doubling rounds; the "
            f"paired oracle unrolls only {oracle_round_bound}"
        )
    # the loop state is POSITION-keyed (one row per word), not doc-keyed
    n_state = int(stats["positions"] or 1)
    with static_superstep_plan(spark, loop_shuffle_partitions(spark, n_state)):
        state = stats_reset_checkpoint(state)
        for _ in range(rounds):
            b = state.select(
                F.col("doc").alias("bdoc"),
                F.col("pos").alias("bpos"),
                F.col("nxt").alias("bnxt"),
                F.col("cnt").alias("bcnt"),
            )
            state = stats_reset_checkpoint(
                state.join(
                    b,
                    (F.col("doc") == F.col("bdoc"))
                    & (F.col("nxt") == F.col("bpos")),
                    "left",
                ).select(
                    "doc",
                    "pos",
                    F.coalesce("bnxt", "nxt").alias("nxt"),
                    (F.col("cnt") + F.coalesce("bcnt", F.lit(0))).alias("cnt"),
                )
            )
    return (
        base.join(
            state.where(F.col("pos") == 0).select("doc", "cnt"), "doc", "left"
        )
        .select(
            F.col("doc").alias(id_col),
            F.size("toks").cast("long").alias("n_words"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def bpe_encode_oracle_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    schedule: list[int] | None = None,
    doubling_rounds: int = ENCODE_DOUBLING_ROUNDS,
) -> str:
    """DuckDB twin of train(batched) -> encode(longest-match): per round
    one top-B CTE (strict (n DESC, lhs, rhs) order) and one
    list_reduce(list_prepend(...)) left-fold apply — the identical fold
    F.aggregate performs — then the pointer-doubling recurrence unrolled
    ``doubling_rounds`` times (docs up to 2^rounds tokens; extra rounds
    are no-ops)."""
    schedule = BATCH_SCHEDULE if schedule is None else schedule
    parts = [
        f"""be_t0 AS MATERIALIZED (
  SELECT '  ' || array_to_string(string_split_regex(trim(lower(text)), ' +'), '  ')
         || '  ' AS s
  FROM ({docs_sql}) d
)"""
    ]
    for i, b in enumerate(schedule):
        parts.append(
            f"""be_b{i} AS MATERIALIZED (
  SELECT lhs, rhs, n, ROW_NUMBER() OVER (ORDER BY n DESC, lhs ASC, rhs ASC) AS rnk
  FROM (
    SELECT t.toks[i] AS lhs, t.toks[i+1] AS rhs, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT toks, unnest(range(1, len(toks))) AS i
      FROM (SELECT string_split(trim(s), '  ') AS toks FROM be_t{i}) x
    ) t
    GROUP BY 1, 2
    ORDER BY n DESC, lhs ASC, rhs ASC
    LIMIT {b}
  ) q
)"""
        )
        parts.append(
            f"""be_l{i} AS (
  SELECT COALESCE(list(lhs || '|' || rhs ORDER BY rnk), CAST([] AS VARCHAR[])) AS ms
  FROM be_b{i}
)"""
        )
        parts.append(
            f"""be_t{i + 1} AS MATERIALIZED (
  SELECT list_reduce(
           list_prepend(t.s, l.ms),
           (acc, x) -> replace(acc,
             ' ' || split_part(x, '|', 1) || '  ' || split_part(x, '|', 2) || ' ',
             ' ' || split_part(x, '|', 1) || '_' || split_part(x, '|', 2) || ' ')
         ) AS s
  FROM be_t{i} t CROSS JOIN be_l{i} l
)"""
        )
    pieces_union = "\nUNION\n".join(
        f"SELECT lhs || '_' || rhs AS piece FROM be_b{i}"
        for i in range(len(schedule))
    )
    parts.append(f"be_pieces AS ({pieces_union})")
    parts.append(
        f"""be_docs AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS toks
  FROM ({docs_sql}) d
)"""
    )
    parts.append(
        """be_pos AS MATERIALIZED (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM be_docs
)"""
    )
    parts.append(
        """be_ml AS MATERIALIZED (
  SELECT p.doc_id, p.pos, COALESCE(MAX(pc.len), 1) AS ml
  FROM be_pos p LEFT JOIN (
    SELECT piece, len(string_split(piece, '_')) AS len FROM be_pieces
  ) pc
    ON p.pos + pc.len - 1 <= len(p.toks)
   AND array_to_string(p.toks[p.pos : p.pos + pc.len - 1], '_') = pc.piece
  GROUP BY 1, 2
)"""
    )
    parts.append(
        """be_d0 AS MATERIALIZED (
  SELECT doc_id, pos, pos + ml AS nxt, CAST(1 AS BIGINT) AS cnt FROM be_ml
)"""
    )
    for k in range(doubling_rounds):
        parts.append(
            f"""be_d{k + 1} AS MATERIALIZED (
  SELECT a.doc_id, a.pos, COALESCE(b.nxt, a.nxt) AS nxt,
         a.cnt + COALESCE(b.cnt, 0) AS cnt
  FROM be_d{k} a LEFT JOIN be_d{k} b
    ON a.doc_id = b.doc_id AND a.nxt = b.pos
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_words,
       CAST(COALESCE(z.cnt, 0) AS BIGINT) AS n_tokens
FROM be_docs d LEFT JOIN be_d{doubling_rounds} z
  ON d.doc_id = z.doc_id AND z.pos = 1
"""
    )


# ---------------------------------------------------------------------------
# Exact merge-order apply at scale (the fold's semantics, not its cost)
# ---------------------------------------------------------------------------
# `bpe_compression` replays the merge table as a LEFT FOLD of literal
# replaces — exact BPE apply, but LINEAR IN VOCAB: a V-rule vocabulary
# costs V corpus scans (or one V-literal expression), which is why the
# scale path so far was `bpe_longest_match_counts` (maximal munch — a
# DIFFERENT tokenizer that diverges from merge-order BPE by ~11% tokens
# at 1k merges).  `bpe_exact_apply_counts` below keeps the fold's EXACT
# semantics at a cost independent of V:
#
#   per document, iterate  rk := min{ rank(p) : p adjacent pair present,
#                                     rank(p) > last }
#   and apply rule rk's literal replace (all occurrences, greedy-left —
#   the identical `replace` the fold performs), until no rule qualifies.
#
# EXACTNESS: the fold applies rules 1..V in order, each a no-op unless
# its pair is present at its turn — so the fold's sequence of EFFECTIVE
# applications is precisely "next rule in rank order whose pair is
# currently present", i.e. the strict-argmin iteration above.  (The
# `last` qualifier makes the equivalence unconditional for ANY rule
# table; for tables from BPE training it is provably redundant — a
# merge only CREATES pairs containing its just-fused symbol, and with
# "_"-joined pieces over alnum base tokens any rule matching such a
# pair must have been learned later, so the present-minimum is
# intrinsically nondecreasing.)
#
# COST: each fired rule shrinks the document by >= 1 symbol, so a doc
# of W words fires at most W-1 times — the iteration count is bounded
# by DOCUMENT LENGTH, never by vocab size.  The whole apply is ONE
# narrow projection (F.aggregate over sequence(1, W-1); finished docs
# short-circuit through the lazily-evaluated When), zero shuffles,
# zero supersteps, zero driver round trips — vs the fold's V scans.
# The rank lookup is a constant-folded literal map, O(1) per pair.


def bpe_exact_apply_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    with_stream: bool = False,
) -> DataFrame:
    """(doc_id, n_words, n_tokens): EXACT merge-order BPE tokenization of
    each document against the ordered rule list ``merges`` (lhs/rhs
    symbol strings, "_"-joined pieces — `bpe_merges_batched`'s table
    shape), by the iterated strict-argmin pass above.  Bit-identical to
    the left fold of literal replaces in rank order (pinned by test and
    by the DuckDB oracle, which replays the fold).  ``with_stream``
    additionally returns the final symbol stream ``s`` (test surface).

    Rule lookup is a HASH-BUCKETED array carried as a BROADCAST 1-ROW
    COLUMN, not an in-expression literal.  Two measured traps drove this
    design (vocab-scaling study, PERF_NOTES r11): (a) Spark map literals
    are array-backed and `element_at` on them is a LINEAR SCAN — O(V)
    per pair lookup; (b) even a bucketed ARRAY literal is re-evaluated
    per aggregate iteration when it sits inside a higher-order lambda
    (constant folding does not reach it there) — O(V) per iteration.
    Carrying the bucket table through the engine's audited broadcast-
    1-row crossJoin pattern makes the per-row access a pointer read and
    the lookup O(1) (one murmur hash + ~1 string compare), restoring
    the designed cost: per document O(fires x words), INDEPENDENT of
    vocab size.  Bucket placement is computed by one tiny Spark job over
    the V rule strings (the same F.hash the runtime expression uses), so
    build and lookup can never disagree."""
    local = _collect_corpus(docs, text_col, id_col=id_col)
    if local is not None:
        import numpy as np
        import pandas as pd

        ids, toks = local
        n_words = np.array([len(t) for t in toks], dtype=np.int64)
        flat, doc_of, _, rev = _local_fold_apply(
            _corpus_arrays(toks), merges, "_"
        )
        n_tokens = np.bincount(doc_of, minlength=len(toks)).astype(np.int64)
        data = {id_col: ids, "n_words": n_words, "n_tokens": n_tokens}
        schema = (
            f"{id_col} {docs.schema[id_col].dataType.simpleString()}, "
            "n_words bigint, n_tokens bigint"
        )
        if with_stream:
            bounds = np.cumsum(n_tokens)
            symbols = [rev[c] for c in flat.tolist()]
            data["s"] = [
                "  " + "  ".join(symbols[a:z]) + "  "
                for a, z in zip(np.concatenate(([0], bounds[:-1])), bounds)
            ]
            schema += ", s string"
        return docs.sparkSession.createDataFrame(
            pd.DataFrame(data), schema=schema
        )
    stream0 = _stream(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        stream0.alias("s0"),
        F.size(F.split(F.trim(stream0), "  ")).cast("long").alias("n_words"),
    )
    if not merges:
        out = base.select(
            id_col, "n_words", F.col("n_words").alias("n_tokens"),
            F.col("s0").alias("s"),
        )
        return out if with_stream else out.drop("s")

    # duplicate (lhs, rhs) rules are legal in an arbitrary table (a pair
    # can re-enter training after its occurrences were consumed): every
    # rank gets its own bucket entry, and the per-doc argmin runs over
    # ALL matching entries with rank > last
    finds = sorted({f" {l}  {r} " for l, r in merges})
    n_slots = 2 * len(finds) + 1
    spark = docs.sparkSession
    slot_of = {
        r["f"]: r["b"]
        for r in spark.createDataFrame([(f,) for f in finds], "f string")
        .select("f", F.pmod(F.hash("f"), F.lit(n_slots)).alias("b"))
        .collect()
    }
    buckets: list[list[tuple[int, str, str]]] = [[] for _ in range(n_slots)]
    for i, (l, r) in enumerate(merges):
        fstr = f" {l}  {r} "
        buckets[slot_of[fstr]].append((i + 1, fstr, f" {l}_{r} "))

    # rank-0 sentinel fills empty slots (uniform element type); it can
    # never match — "" is no pair string and rank 0 is never > last
    lut = spark.createDataFrame(
        [([bs or [(0, "", "")] for bs in buckets],)],
        "_bpe_lut array<array<struct<rank:int,find:string,repl:string>>>",
    )
    base = base.crossJoin(F.broadcast(lut))

    def _best_entry(acc):
        """array_min over the matching (rank, find, repl) entries of every
        adjacent pair — struct ordering is field-by-field, rank first, so
        the minimum IS the lowest-rank qualifying rule (ranks unique)."""
        toks = F.split(F.trim(acc["s"]), "  ")
        m = F.greatest(F.size(toks) - 1, F.lit(0))

        def _lookup(a, b):
            p = F.concat(F.lit(" "), a, F.lit("  "), b, F.lit(" "))
            bucket = F.element_at(
                F.col("_bpe_lut"), F.pmod(F.hash(p), F.lit(n_slots)) + 1
            )
            return F.filter(
                bucket,
                lambda e: (e["find"] == p) & (e["rank"] > acc["last"]),
            )

        cands = F.flatten(
            F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m), _lookup)
        )
        return F.array_min(cands)

    def _step(acc, _):
        # let-binding via a 1-element transform: higher-order lambdas are
        # interpreted without common-subexpression elimination, so naming
        # the argmin through a bound variable evaluates the pair scan
        # ONCE per iteration instead of once per use (measured 3x on the
        # apply pass); the outer When short-circuits finished docs past
        # the scan entirely (CaseWhen evaluates branches lazily)
        def _apply(best):
            return F.when(
                best.isNull(),
                F.struct(
                    acc["s"].alias("s"),
                    acc["last"].alias("last"),
                    F.lit(True).alias("done"),
                ),
            ).otherwise(
                F.struct(
                    F.replace(
                        acc["s"], best["find"], best["repl"]
                    ).alias("s"),
                    best["rank"].alias("last"),
                    F.lit(False).alias("done"),
                )
            )

        return F.when(
            acc["done"],
            F.struct(
                acc["s"].alias("s"),
                acc["last"].alias("last"),
                F.lit(True).alias("done"),
            ),
        ).otherwise(
            F.element_at(
                F.transform(F.array(_best_entry(acc)), _apply), 1
            )
        )

    fired = F.aggregate(
        # each fire shrinks the doc by >= 1 symbol: W-1 iterations is a
        # PROVEN bound, so the loop needs no convergence probe at all
        F.sequence(F.lit(1), F.greatest(F.col("n_words") - 1, F.lit(1))),
        F.struct(
            F.col("s0").alias("s"),
            F.lit(0).alias("last"),
            F.lit(False).alias("done"),
        ),
        _step,
    )
    out = base.select(
        id_col,
        "n_words",
        fired.getField("s").alias("s"),
    ).select(
        id_col,
        "n_words",
        F.size(F.split(F.trim("s"), "  ")).cast("long").alias("n_tokens"),
        "s",
    )
    return out if with_stream else out.drop("s")


def bpe_fold_apply_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    with_stream: bool = False,
) -> DataFrame:
    """The LINEAR-IN-VOCAB exact baseline: the merge table replayed as
    one F.aggregate left fold of V literal replaces (the trainer's own
    batch-apply expression, whole table).  Semantics-identical to
    `bpe_exact_apply_counts` by construction — kept as the equivalence
    test surface and the cost baseline for the vocab-scaling table in
    PERF_NOTES (this path's per-row work grows with V; the argmin path's
    is bounded by document length)."""
    stream0 = _stream(F.col(text_col))
    fold = F.array(
        *[
            F.struct(
                F.lit(f" {l}  {r} ").alias("f"),
                F.lit(f" {l}_{r} ").alias("r"),
            )
            for l, r in merges
        ]
    )
    base = docs.select(
        F.col(id_col),
        stream0.alias("s0"),
        F.size(F.split(F.trim(stream0), "  ")).cast("long").alias("n_words"),
    )
    s = (
        F.aggregate(
            fold, F.col("s0"), lambda acc, m: F.replace(acc, m["f"], m["r"])
        )
        if merges
        else F.col("s0")
    )
    out = base.select(
        id_col,
        "n_words",
        s.alias("s"),
    ).select(
        id_col,
        "n_words",
        F.size(F.split(F.trim("s"), "  ")).cast("long").alias("n_tokens"),
        "s",
    )
    return out if with_stream else out.drop("s")


def bpe_exact_apply_oracle_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    schedule: list[int] | None = None,
) -> str:
    """DuckDB twin of train(batched) -> EXACT merge-order apply: the
    `bpe_encode_oracle_sql` training chain with doc_id carried through
    every fold CTE.  Because the documents being encoded ARE the training
    corpus, the full-table fold equals the training replay, so the final
    training stream per doc IS the exact encoding — the oracle reads its
    token counts directly off the last chain CTE (no separate apply
    pass), while the Spark side re-derives them with the argmin operator;
    agreement pins the operator to the fold semantics."""
    schedule = BATCH_SCHEDULE if schedule is None else schedule
    parts = [
        f"""bx_t0 AS MATERIALIZED (
  SELECT doc_id,
         '  ' || array_to_string(string_split_regex(trim(lower(text)), ' +'), '  ')
         || '  ' AS s
  FROM ({docs_sql}) d
)"""
    ]
    for i, b in enumerate(schedule):
        parts.append(
            f"""bx_b{i} AS MATERIALIZED (
  SELECT lhs, rhs, n, ROW_NUMBER() OVER (ORDER BY n DESC, lhs ASC, rhs ASC) AS rnk
  FROM (
    SELECT t.toks[i] AS lhs, t.toks[i+1] AS rhs, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT toks, unnest(range(1, len(toks))) AS i
      FROM (SELECT string_split(trim(s), '  ') AS toks FROM bx_t{i}) x
    ) t
    GROUP BY 1, 2
    ORDER BY n DESC, lhs ASC, rhs ASC
    LIMIT {b}
  ) q
)"""
        )
        parts.append(
            f"""bx_l{i} AS (
  SELECT COALESCE(list(lhs || '|' || rhs ORDER BY rnk), CAST([] AS VARCHAR[])) AS ms
  FROM bx_b{i}
)"""
        )
        parts.append(
            f"""bx_t{i + 1} AS MATERIALIZED (
  SELECT t.doc_id,
         list_reduce(
           list_prepend(t.s, l.ms),
           (acc, x) -> replace(acc,
             ' ' || split_part(x, '|', 1) || '  ' || split_part(x, '|', 2) || ' ',
             ' ' || split_part(x, '|', 1) || '_' || split_part(x, '|', 2) || ' ')
         ) AS s
  FROM bx_t{i} t CROSS JOIN bx_l{i} l
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT a.doc_id,
       CAST(len(string_split(trim(a.s), '  ')) AS BIGINT) AS n_words,
       CAST(len(string_split(trim(z.s), '  ')) AS BIGINT) AS n_tokens
FROM bx_t0 a JOIN bx_t{len(schedule)} z ON a.doc_id = z.doc_id
"""
    )
