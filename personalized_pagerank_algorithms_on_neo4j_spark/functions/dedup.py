"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All stages are shuffle-conscious compositions of built-in DataFrame ops:
- exact:      one hash-groupBy (map-side partial agg) on a digest column.
- minhash:    shingle explode -> per-(doc, hash_i) min -> band signature ->
              bucket self-join. The self-join runs on band-signature keys, so
              candidate generation never compares non-colliding docs — the
              O(n^2) never materializes.
- simhash:    token-hash bit votes -> 64-bit signature; near-dups = equal
              signatures (or banded prefix buckets).
- ngram jaccard: shingle explode + equi-self-join on shingle + count ratio.
- embedding:  sign-sketch buckets (SRP-like, deterministic) + exact cosine
              verify inside buckets.

Hashes are md5-based (`text.portable_hash`) so every pipeline is
reproducible and DuckDB-oracle-checkable — no JVM-specific murmur3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.iterative import BROADCAST_EDGE_BOUND, stats_reset_checkpoint
from .text import portable_hash, tokens


def normalized(col: Column) -> Column:
    return F.regexp_replace(F.lower(col), r"\s+", " ")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(digest, keep_id, n_dups) for every group of byte-identical (normalized)
    docs with >1 member. keep_id = smallest id (the canonical survivor)."""
    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (smallest id) per normalized-text group."""
    from pyspark.sql import Window

    win = Window.partitionBy(F.md5(normalized(F.col(text_col))))
    return (
        df.withColumn("_keep", F.min(id_col).over(win))
        .where(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )


# ---------------------------------------------------------------------------
# Shingles
# ---------------------------------------------------------------------------


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) from a *materialized* token-array
    column, joined by single spaces.

    `toks` MUST be a plain column reference (pre-project the tokenization
    into its own column first): a lambda body re-evaluates every captured
    non-attribute subexpression per element, so passing the raw
    split(regexp_replace(...)) tree here would re-tokenize the whole document
    once per shingle position — measured 3x slower at sf0.1.

    Documents shorter than n tokens contribute their full token sequence as
    one shingle (so two identical 1-token docs still dedup); empty/whitespace
    documents contribute NO shingles (otherwise every empty doc would match
    every other via the '' shingle)."""
    return F.filter(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
        lambda s: F.length(s) > 0,
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Shingles straight from a text column — convenience form; hot paths
    should pre-project tokens and use `shingles_from_tokens` (see its note)."""
    return shingles_from_tokens(tokens(normalized(col)), n)


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # shingles are array_distinct-ed per document, so the exploded
    # (doc_id, sh) rows are unique by construction — no distinct shuffle;
    # the token array is projected first so the shingle lambda reads an
    # attribute, not a re-evaluated tokenization tree
    return df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalized(F.col(text_col))).alias("_toks"),
    ).select(
        "doc_id", F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("sh")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


def _jaccard_select(common: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b, common) + per-doc shingle sizes -> thresholded Jaccard."""
    return (
        common.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )



def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard >= threshold.
    Pairs are generated through the shared-shingle equi join (a < b).

    `max_shingle_df` caps the document frequency of join-key shingles: a
    stop-shingle appearing in d docs would alone contribute d^2/2 join rows
    (the classic dedup skew bomb at corpus scale), while contributing almost
    no Jaccard signal. Shingles with DF > cap are dropped from the JOIN side
    only — per-doc shingle-set sizes (the Jaccard denominator) stay exact, so
    capped scores are slight underestimates for pairs whose overlap includes a
    hot shingle, and exact otherwise. The hot-shingle list is tiny (it takes
    > cap docs to qualify), so the anti join broadcasts."""
    # The common-count arithmetic assumes one row per doc_id: a duplicated doc
    # row would double its shingle rows, double n_sh, and quadruple the
    # self-join's common count, inflating jaccard past the true value. Dedup
    # by id first (one narrow shuffle of the docs table; MIN-aggregate
    # consumers like the minhash signature are duplicate-insensitive and
    # skip this). localCheckpoint, not cache(): an operator-internal
    # cache() is never unpersisted and leaks one storage entry per call —
    # the root cause of the round-3 decontamination bench drift.
    ds = _doc_shingles(df.dropDuplicates([id_col]), text_col, id_col, n).localCheckpoint(
        eager=True
    )
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    join_side = ds
    if max_shingle_df is not None:
        hot = (
            ds.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("sh")
        )
        join_side = ds.join(F.broadcast(hot), "sh", "left_anti")
    a = join_side.select(F.col("doc_id").alias("doc_a"), "sh")
    b = join_side.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return _jaccard_select(common, sizes, threshold)


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """(doc_small, doc_big, containment): unordered pairs oriented
    small-shingle-set first, where CONTAINMENT |S(a) & S(b)| / min(|S(a)|,
    |S(b)|) >= threshold — the ONE-SIDED near-dup measure (Broder 1997's
    containment, vs his resemblance/Jaccard).  Catches doc-in-doc
    duplication that Jaccard structurally cannot: a 30-shingle quote
    fully embedded in a 300-shingle article scores containment 1.0 but
    Jaccard 0.1, below any sane resemblance threshold.  The quote/
    boilerplate-embedding flavor of dedup an LLM pipeline needs BESIDE
    resemblance (whole-doc) and ExactSubstr (span removal).

    Same scale discipline as `ngram_jaccard_pairs` (shared machinery):
    shared-shingle equi join for candidates, hot-shingle DF cap on the
    JOIN side only (denominators stay exact, capped scores are slight
    underestimates), one groupBy per pair.  Orientation: smaller shingle
    set first, ties by lower id — deterministic, so the output is
    hashable cross-engine."""
    ds = _doc_shingles(
        df.dropDuplicates([id_col]), text_col, id_col, n
    ).localCheckpoint(eager=True)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    join_side = ds
    if max_shingle_df is not None:
        hot = (
            ds.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("sh")
        )
        join_side = ds.join(F.broadcast(hot), "sh", "left_anti")
    a = join_side.select(F.col("doc_id").alias("doc_a"), "sh")
    b = join_side.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    scored = (
        common.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_sh", "na"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "nb"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.round(
                F.col("common").cast("double")
                / F.least("na", "nb").cast("double"),
                6,
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )
    small_first = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("doc_a") < F.col("doc_b"))
    )
    return scored.select(
        F.when(small_first, F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("doc_small"),
        F.when(small_first, F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("doc_big"),
        "containment",
    )


def ngram_span_duplicates(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(span, n_docs, n_occurrences): every n-token span that appears in
    >= min_docs distinct documents — substring-level duplication, the
    complement of whole-document dedup (suffix-array spirit of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", at n-gram
    granularity; cf. the reference's doc-level shingling only).

    Scale shape: strictly linear. Positional spans (NOT distinct-ed — the
    occurrence count is the point) explode to ~|tokens| rows, then ONE
    groupBy(span) with map-side combine; the output is an aggregate, never a
    doc-pair expansion, so a span shared by d documents costs d rows, not
    d^2. COUNT(DISTINCT doc_id) adds the standard expand-plan pass over the
    same shuffle. At corpus scale, group on a 64-bit span hash instead of
    the text to narrow the shuffle; the text form here keeps the output
    human-actionable (which spans to strip)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    # explode(NULL) emits no rows, so docs shorter than n tokens vanish here
    span_arr = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - n),
            lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
        ),
    )
    spans = toks.select("doc_id", F.explode(span_arr).alias("span"))
    return (
        spans.groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_sig_wide(
    df: DataFrame,
    num_hashes: int,
    n: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(doc_id, _m0 .. _m{num_hashes-1}): one row per doc, one groupBy.

    Hash family: wrapped double-hash — two md5 base hashes per shingle, then
    h_i = ((1000*i + 12289)*h1 + i*h2) mod PRIME53. The multiplier forces
    modular wraparound (a non-wrapping linear combo degenerates: argmin
    converges to argmin(h2) as i grows) while the worst-case product
    (1000*15+12289)*2^48 stays under 2^63 for both engines. md5 cost is 2
    per shingle instead of num_hashes.

    Shuffle shape: the i-th minimum is a plain MIN aggregate over a per-row
    computed hash — so all num_hashes minima come out of ONE map-side-combined
    groupBy over the raw shingle rows. No explode-by-i (x16 rows) and no
    second band groupBy; at corpus scale the whole signature stage is a
    single shuffle of (doc_id, partial minima)."""
    from .text import PRIME53

    assert num_hashes <= 16, "multiplier bound keeps products < 2^63 up to i=15"
    ds = _doc_shingles(df, text_col, id_col, n)
    based = ds.select(
        "doc_id",
        portable_hash(F.col("sh"), 0).alias("h1"),
        portable_hash(F.col("sh"), 1).alias("h2"),
    )
    def h_i(i: int):
        return (
            (F.lit(1000 * i + 12289) * F.col("h1") + F.lit(i) * F.col("h2"))
            % F.lit(PRIME53)
        )

    return based.groupBy("doc_id").agg(
        *[F.min(h_i(i)).alias(f"_m{i}") for i in range(num_hashes)]
    )


def hot_shingles(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(sh, df): the ``k`` most document-frequent word n-gram shingles with
    df >= ``min_df`` — corpus-wide boilerplate / memorization-risk mining
    (the aggregate view of the same shingle space the pairwise dedup
    operators join on: a shingle hot here is exactly one the LSH/jaccard
    caps would prune).

    Scale shape: shingle explode (rows unique per (doc, shingle) by
    construction — no distinct shuffle) -> ONE map-side-combinable count
    per shingle -> TakeOrderedAndProject top-k under the total order
    (df DESC, sh ASC); no join, no global window, deterministic at any
    parallelism."""
    counts = (
        _doc_shingles(df, text_col, id_col, n)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") >= min_df)
    )
    return counts.orderBy(F.desc("df"), F.asc("sh")).limit(k)


def similar_docs(
    df: DataFrame,
    probe_id: int,
    k: int = 10,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_common, jaccard): the k documents most shingle-similar to
    ``probe_id`` — the single-probe retrieval form of `ngram_jaccard_pairs`
    ("find me near-duplicates of THIS doc").

    Scale shape: the probe's shingle set is one document (broadcast); the
    corpus explodes once, semi-matches against the broadcast set (no
    self-join, no candidate blowup), one count per doc, sizes join for the
    denominator, TakeOrderedAndProject top-k under the total order
    (jaccard DESC, doc_id ASC). The probe itself is excluded."""
    ds = _doc_shingles(df.dropDuplicates([id_col]), text_col, id_col, n)
    ds = ds.localCheckpoint(eager=True)  # probe set + corpus + sizes read it
    probe = ds.where(F.col("doc_id") == probe_id).select("sh")
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    n_probe = probe.count()
    if n_probe == 0:
        return df.sparkSession.createDataFrame(
            [], "doc_id long, n_common long, jaccard double"
        )
    common = (
        ds.where(F.col("doc_id") != probe_id)
        .join(F.broadcast(probe), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    scored = common.join(sizes, "doc_id").select(
        "doc_id",
        "n_common",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("n_sh") + F.lit(n_probe) - F.col("n_common")).cast("double"),
            6,
        ).alias("jaccard"),
    )
    return scored.orderBy(F.desc("jaccard"), F.asc("doc_id")).limit(k)


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, i, minhash): num_hashes min-hashes per doc (narrow layout,
    unfolded from the single-aggregation wide form)."""
    wide = _minhash_sig_wide(df, num_hashes, n, text_col, id_col)
    return wide.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])
        ).alias("i", "minhash"),
    )


MINHASH_BUCKET_CAP = 1_000  # (band, bucket) keys larger than this are dropped


def minhash_banded(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, band, bucket): the LSH band table — bucket = md5 of the
    band's ordered minhashes, built straight off the wide signature row
    (one x`bands` explode of tiny structs, no per-(doc, band) groupBy).
    Shared by the self-join candidate generator and the cross-corpus /
    streaming incremental variants so the banding scheme exists once."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}); a partial "
            "trailing band would silently change candidate recall"
        )
    rows = num_hashes // bands
    wide = _minhash_sig_wide(df, num_hashes, n, text_col, id_col)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"_m{b * rows + j}").cast("string")
                            for j in range(rows)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return wide.select(
        "doc_id", F.explode(band_entries).alias("e")
    ).select("doc_id", "e.band", "e.bucket")


def _drop_hot_buckets(
    banded: DataFrame, max_bucket_size: int, label: str
) -> DataFrame:
    """Materialize a (doc_id, band, bucket) frame and exclude (band, bucket)
    keys larger than ``max_bucket_size``, logging the drop (no-silent-caps).

    The ONE implementation of the hot-bucket discipline, shared by the
    self-join, cross-corpus, and streaming candidate generators so cap
    semantics and logging cannot drift. EAGER by design: the banded frame
    is checkpointed (it always has >= 2 downstream consumers) and the drop
    count is one cheap aggregate over that checkpoint."""
    banded = banded.localCheckpoint(eager=True)
    hot = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") > max_bucket_size)
        .select("band", "bucket", "_sz")
        .localCheckpoint(eager=True)
    )
    dropped = hot.agg(F.count(F.lit(1)), F.sum("_sz")).first()
    if dropped[0]:
        import logging

        logging.getLogger(__name__).warning(
            "%s: dropped %d hot (band,bucket) keys covering %d doc-band "
            "rows (bucket size > %d); identical-doc boilerplate belongs "
            "to exact_dup_groups",
            label, dropped[0], dropped[1], max_bucket_size,
        )
    return banded.join(
        hot.select("band", "bucket"), ["band", "bucket"], "left_anti"
    )


def cross_corpus_lsh_candidates(
    new_df: DataFrame,
    old_df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = MINHASH_BUCKET_CAP,
) -> DataFrame:
    """(new_id, old_id): incoming docs that share at least one LSH band
    bucket with a historical corpus — the incremental-ingest twin of
    `minhash_lsh_candidates` (new docs are near-dup-checked against what
    the pipeline already holds, without re-pairing the history with
    itself).

    Scale shape: both sides band independently; the join is an equi join
    on (band, bucket) where the NEW side is a microbatch (small) and the
    OLD side is the persisted signature store — at scale the store is
    bucketed by (band, bucket) so only the batch side shuffles. The
    hot-bucket cap applies to the HISTORICAL side (the unbounded one),
    same discipline and logging as the self-join variant."""
    nb = minhash_banded(new_df, num_hashes, bands, n, text_col, id_col)
    ob = minhash_banded(old_df, num_hashes, bands, n, text_col, id_col)
    if max_bucket_size is not None:
        ob = _drop_hot_buckets(
            ob, max_bucket_size, "cross_corpus_lsh_candidates"
        )
    return (
        nb.select(F.col("doc_id").alias("new_id"), "band", "bucket")
        .join(
            ob.select(F.col("doc_id").alias("old_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("new_id", "old_id")
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int = MINHASH_BUCKET_CAP,
) -> DataFrame:
    """(doc_a, doc_b) pairs sharing at least one LSH band bucket.

    rows_per_band = num_hashes/bands; band signature = md5 of the ordered
    minhashes in the band; the bucket join key is (band, signature).

    The banded table comes straight off the wide signature row (band bucket =
    md5 of the band's minima, then a x`bands` explode of tiny structs) — no
    per-(doc, band) groupBy stage; the only shuffles in the whole candidate
    pipeline are the signature groupBy, the bucket self-join, and the final
    pair distinct.

    Hot-bucket cap: a (band, bucket) key with more than ``max_bucket_size``
    members (mass-duplicated boilerplate at corpus scale) would emit O(k^2)
    candidate pairs from the self-join — AQE splits the join but not the
    output cardinality — so oversized buckets are EXCLUDED from pairing and
    the drop is logged (the no-silent-caps rule; same discipline as
    ``SEMDEDUP_CAP``). Docs in a dropped bucket can still pair through their
    other ``bands - 1`` buckets; byte-identical boilerplate is the
    ``exact_dup_groups`` operator's job, not LSH's. ``max_bucket_size=None``
    disables the cap.

    NOTE: with the cap enabled this function is EAGER — the banded
    signature table is materialized at call time (it feeds three
    consumers: the size aggregate and both self-join sides) and the
    drop count is logged via one cheap aggregate over that checkpoint.
    Callers that only want to inspect the plan should pass
    ``max_bucket_size=None``.

    The cap is intentionally NOT modeled in the DuckDB oracles (they
    stay cap-free); tests/test_entry.test_minhash_bucket_cap_never_binds_
    at_gate_scale guards that no bucket can reach the cap at the compare
    scale, so capped Spark and uncapped oracle agree there by
    construction."""
    banded = minhash_banded(df, num_hashes, bands, n, text_col, id_col)
    if max_bucket_size is not None:
        banded = _drop_hot_buckets(
            banded, max_bucket_size, "minhash_lsh_candidates"
        )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard >= threshold."""
    cand = minhash_lsh_candidates(df, num_hashes, bands, n, text_col, id_col)
    # localCheckpoint, not cache(): see ngram_jaccard_pairs — an internal
    # cache() leaks one storage entry per call
    ds = _doc_shingles(df, text_col, id_col, n).localCheckpoint(eager=True)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = ds.select(F.col("doc_id").alias("doc_a"), "sh")
    b = ds.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return _jaccard_select(common, sizes, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over token hashes."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(normalized(F.col(text_col)))).alias("tok"),
    )
    th = tok.select("doc_id", portable_hash(F.col("tok")).alias("h"))
    # bit b of h = floor(h / 2^b) % 2 (portable: no engine-specific bit ops)
    votes = th.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).select(
        "doc_id",
        "bit",
        F.when(
            F.floor(F.col("h") / F.pow(F.lit(2.0), F.col("bit"))).cast("long")
            % 2
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("vote"),
    )
    bit_sums = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_dup_groups(df: DataFrame, bits: int = 32, **kw) -> DataFrame:
    """Docs sharing an identical simhash signature (strong near-dup signal)."""
    sh = simhash(df, bits, **kw)
    return (
        sh.groupBy("simhash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def embedding_sign_sketch(vec: Column, dims: int = 16) -> Column:
    """Deterministic sign sketch: bit i = sign(vec[i]) over the first `dims`
    dimensions — an SRP-style bucket key with no random planes needed."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at(vec, (i + 1).cast("int")).cast("double") > 0,
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    sketch_dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine >= threshold; candidate pairs
    come from equal sign-sketch buckets (prunes the quadratic blow-up), then
    exact cosine verifies inside each bucket."""
    sk = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        embedding_sign_sketch(F.col(vec_col), sketch_dims).alias("bucket"),
    )
    a = sk.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = sk.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = 16,
    iterations: int = 2,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic near-dedup (Abbas et al., arXiv:2303.09540):
    K-means-cluster the embedding space, then verify exact cosine only
    WITHIN each cluster — (id_a, id_b, cosine) for within-cluster pairs at
    cosine >= threshold.

    vs ``embedding_near_dup_pairs``: the sign-sketch buckets are fixed
    axis-aligned half-space cuts, while trained centroids adapt to the
    corpus's actual density, so semantically-close pairs that straddle a
    coordinate hyperplane still land in one bucket.

    Scale shape: clustering is the k-means recurrence (broadcast
    centroids, one shuffle of k*dim partials per Lloyd round — see
    clustering.py); the pairwise stage is quadratic only INSIDE a
    cluster, and k is the control knob (k ~ n / target_cluster_size).
    Clusters that still exceed ``max_cluster_size`` are excluded from
    pairing rather than allowed to explode the join — the same
    cap-the-hot-key discipline as the shingle-DF cap in
    ``ngram_jaccard_pairs``; re-cluster with a larger k to cover them."""
    from .clustering import _assign, kmeans_fit

    centroids = kmeans_fit(df, k, iterations, vec_col, id_col)
    if not centroids:
        return df.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cosine"),
        ).limit(0)
    labels = _assign(df, centroids, vec_col, id_col)
    # k rows by definition: the size filter is a broadcast join, never a
    # shuffle of the labeled corpus
    small_enough = (
        labels.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") <= max_cluster_size)
        .select("cluster")
    )
    # both sides of the within-cluster pair join read this frame; without
    # materialization the assignment mapInPandas would re-scan the vector
    # table twice
    lab = (
        labels.join(F.broadcast(small_enough), "cluster")
        .join(df.select(id_col, vec_col), id_col)
        .localCheckpoint(eager=True)
    )
    a = lab.select(
        "cluster", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = lab.select(
        "cluster", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def contrastive_pairs(
    df: DataFrame,
    k: int = 16,
    iterations: int = 2,
    pos_threshold: float = 0.8,
    neg_threshold: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """(id_a, id_b, cosine, label): contrastive training pairs mined from
    the SemDeDup substrate — within-cluster pairs at cosine >=
    ``pos_threshold`` labelled 'pos', within-cluster pairs BELOW
    ``neg_threshold`` labelled 'neg' (the classic hard-negative recipe:
    same trained k-means cell = topically close, low cosine = not a
    paraphrase — exactly the negatives contrastive embedding training
    wants, vs easy random negatives from other cells).  Pairs between the
    thresholds are ambiguous and emitted under neither label.

    One clustering + ONE within-cluster pair join serves both labels
    (`semantic_dedup_pairs`' scale shape verbatim: broadcast-centroid
    assignment, quadratic only inside a cluster, oversized clusters
    excluded with k as the knob)."""
    from .clustering import _assign, kmeans_fit

    if not pos_threshold > neg_threshold:
        raise ValueError("pos_threshold must exceed neg_threshold")
    centroids = kmeans_fit(df, k, iterations, vec_col, id_col)
    if not centroids:
        return df.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cosine"),
            F.lit("pos").alias("label"),
        ).limit(0)
    labels = _assign(df, centroids, vec_col, id_col)
    small_enough = (
        labels.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") <= max_cluster_size)
        .select("cluster")
    )
    lab = (
        labels.join(F.broadcast(small_enough), "cluster")
        .join(df.select(id_col, vec_col), id_col)
        .localCheckpoint(eager=True)
    )
    a = lab.select(
        "cluster", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = lab.select(
        "cluster", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va")))
        * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    scored = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )
    return scored.select(
        "id_a",
        "id_b",
        "cosine",
        F.when(F.col("cosine") >= pos_threshold, F.lit("pos"))
        .when(F.col("cosine") < neg_threshold, F.lit("neg"))
        .alias("label"),
    ).where(F.col("label").isNotNull())


def dedup_survivorship(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    max_iters: int = 20,
    strict: bool = True,
) -> DataFrame:
    """(doc_id, cluster_id, survivor_id, keep) for every document in a
    near-dup cluster — the pipeline step AFTER detection: MinHash-LSH
    candidates -> connected components -> ONE survivor per cluster,
    chosen as the longest text (ties -> lowest id; both rules
    deterministic so the DuckDB twin picks identically). `keep` marks the
    survivor; a training pipeline drops the rest. Documents in no cluster
    are implicitly kept and not listed.

    Scale shape inherits the parts: banded LSH (never all-pairs),
    checkpointed min-label propagation, and survivor election as ONE
    window partitioned by cluster — parallel across clusters, no global
    sort, no rank-then-self-join (first over the ordered window tags
    every row with its cluster's head in the same pass)."""
    pairs = minhash_lsh_candidates(df, num_hashes, bands, n, text_col, id_col)
    clusters = dedup_clusters(pairs, max_iters=max_iters, strict=strict)
    return survivors_from_clusters(clusters, df, text_col, id_col)


def survivors_from_clusters(
    clusters: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id, survivor_id, keep): the shared survivor
    election — longest text, ties to lowest id, keep marks the survivor
    — over any (doc_id, cluster_id) assignment.  ONE place for the rule:
    both the MinHash survivorship pipeline and the perceptual-image twin
    call this, so the tie semantics cannot drift between their oracles."""
    from pyspark.sql import Window

    sized = clusters.join(
        docs.select(
            F.col(id_col).alias("doc_id"), F.length(text_col).alias("_len")
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_len"), F.asc("doc_id")
    )
    return sized.select(
        "doc_id",
        "cluster_id",
        F.first("doc_id").over(w).alias("survivor_id"),
    ).select(
        "doc_id",
        "cluster_id",
        "survivor_id",
        (F.col("doc_id") == F.col("survivor_id")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Cross-corpus decontamination (benchmark n-gram overlap)
# ---------------------------------------------------------------------------


def cross_corpus_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_sh, n_common, contamination) per corpus document:
    the fraction of its n-gram shingles that appear ANYWHERE in the
    benchmark corpus — the standard eval-decontamination signal (docs above
    a threshold are dropped before training).

    Scale shape: the benchmark shingle set is tiny relative to a training
    corpus (MBs vs TBs), so it is distinct-ed, tagged, and BROADCAST into a
    single map-side LEFT join over the corpus shingles; counting rows and
    tag hits in the SAME groupBy yields n_sh and n_common in one pass — the
    corpus shingles are scanned once, nothing is cached (the earlier
    two-branch form cached the shingle frame and leaked one cache entry per
    call), and there is no corpus self-join anywhere."""
    bs = (
        _doc_shingles(bench, text_col, id_col, n)
        .select("sh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        _doc_shingles(corpus.dropDuplicates([id_col]), text_col, id_col, n)
        .join(F.broadcast(bs), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count("_hit").alias("n_common"),
        )
        .select(
            "doc_id",
            "n_sh",
            "n_common",
            F.round(
                F.col("n_common").cast("double") / F.col("n_sh").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup cluster assignment (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def _dedup_clusters_local(
    und: DataFrame, max_iters: int, strict: bool, jump: bool
) -> DataFrame:
    """Driver-local twin of the distributed min-label loop over the
    symmetrized pair frame ``und(a, b)`` — the same recurrence per
    iteration (new(x) = min(own, labels of in-neighbors), then two
    pointer-jump shortcuts when ``jump``, stop when the label vector is
    unchanged), so results — including deliberately truncated ones — are
    identical at every ``max_iters``."""
    import numpy as np

    spark = und.sparkSession
    pdf = und.toPandas()
    out_schema = "doc_id long, cluster_id long"
    if len(pdf) == 0:
        return spark.createDataFrame([], out_schema)
    a = pdf["a"].to_numpy(dtype=np.int64)
    b = pdf["b"].to_numpy(dtype=np.int64)
    # und is symmetric, so the a-side alone covers every node (matches the
    # distributed path's und.select("a").distinct() node set)
    from .._nputil import unique_stable

    nodes = unique_stable(a)
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    lab = nodes.copy()
    converged = False
    for _ in range(max_iters):
        new = lab.copy()
        # row (a, b) propagates label(a) to node b — both directions are
        # present in und, exactly like the labels⋈und neighbor join
        np.minimum.at(new, ib, lab[ia])
        if jump:
            # twice, like the distributed loop: label(x) <- label(label(x));
            # every label value is a node id of this component set
            for _ in range(2):
                new = new[np.searchsorted(nodes, new)]
        if np.array_equal(new, lab):
            converged = True
            break
        lab = new
    if strict and not converged:
        raise RuntimeError(
            f"dedup_clusters: label propagation did not reach a confirmed "
            f"fixed point within {max_iters} iterations (chain-shaped "
            f"component deeper than max_iters?); raise max_iters or pass "
            f"strict=False to accept bounded-depth labels"
        )
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"doc_id": nodes, "cluster_id": lab}),
        out_schema,
    )


def dedup_clusters(
    pairs: DataFrame,
    max_iters: int = 20,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    strict: bool = True,
    jump: bool = False,
) -> DataFrame:
    """(doc_id, cluster_id): connected components over near-dup pairs by
    min-label propagation; cluster_id = smallest doc_id in the component
    (the canonical survivor, consistent with exact_dedup's min-id rule).

    Per iteration every node takes min(own label, neighbor labels) — one
    equi join + groupBy per step, state truncated via localCheckpoint; stops
    at the fixed point (no label changed). Near-dup components are shallow
    (duplicate groups, not social graphs), so plain 1-hop propagation
    converges in a few rounds there.

    ``jump=True`` adds a pointer-jumping shortcut after each 1-hop step:
    every label value is itself a node of the same component (the min seen
    so far), so one labels⋈labels self-join rewrites label(x) to
    label(label(x)) — O(log diameter) convergence instead of O(diameter).
    Use it for CHAIN-SHAPED inputs (spanning-forest trees, single-linkage
    clusters — a 131-node chain needs 130 1-hop rounds but 8 jumped ones).
    The fixed point, and therefore the result, is identical either way:
    at the 1-hop fixed point every label is the component min and the
    shortcut is the identity.

    With ``strict`` (default), raises if the fixed point was not confirmed
    within ``max_iters`` — truncated labels split one true component into
    several clusters, which a survivorship step would silently trust. Pass
    ``strict=False`` only when a bounded-depth result is intended (e.g.
    comparing against an equally-truncated oracle)."""
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    # stats_reset on entry as well: callers may hand in a frame whose
    # size estimate is already inflated (a nested loop's join output),
    # and every iteration below multiplies against und's estimate
    und = stats_reset_checkpoint(
        edges.unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    # Driver-local kernel under the broadcast-size cutoff (the LocalGraph
    # precedent, graph.py): if the symmetric pair table would broadcast,
    # its components fit the driver — replay the IDENTICAL per-iteration
    # recurrence (1-hop min + optional double pointer-jump + sum-equality
    # stop) vectorized in numpy, so truncated labels, strict raises and
    # the fixed point are bit-equal to the distributed loop's at any
    # max_iters.  Replaces the loop's 2-3 Spark jobs per iteration
    # (nested loops like Borůvka's per-round merges pay this many times
    # per query); the count probe is a cheap scan of the checkpoint just
    # materialized.  Above the bound the superstep loop below is
    # unchanged — the 100x plan.
    if und.count() <= BROADCAST_EDGE_BOUND:
        return _dedup_clusters_local(und, max_iters, strict, jump)
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    def _label_sum(df: DataFrame):
        # decimal(38,0): exact at any n x max_id, no silent bigint wrap
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]

    converged = False
    # Convergence check: labels only ever DECREASE (new = min(own,
    # neighbors)), and the node set is fixed, so the exact label sum
    # strictly decreases until — and only until — the fixed point. An
    # aggregate over the just-checkpointed frame is map-side partials
    # plus a 1-row exchange, where the previous equality join re-shuffled
    # both O(n) label frames every round.
    prev_sum = _label_sum(labels)
    for _ in range(max_iters):
        neighbor = (
            labels.join(und, labels.node == und.a)
            .select(F.col("b").alias("node"), "label")
        )
        new_labels = (
            labels.unionAll(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if jump:
            # label values are node ids of the labels table (mins of node
            # ids), so the inner join keeps every row: label(x) <- the
            # label OF label(x).  Applied TWICE per iteration: the second
            # shortcut quadruples the horizon for one extra tiny join
            # inside the same job (measured on a 200-chain: 8 -> 5
            # iterations, -36% wall; a third jump adds nothing)
            for _ in range(2):
                hop = new_labels.select(
                    F.col("node").alias("label"), F.col("label").alias("_l2")
                )
                new_labels = new_labels.join(hop, "label").select(
                    "node", F.col("_l2").alias("label")
                )
        # stats_reset, not plain localCheckpoint: the jump self-join (and
        # any caller nesting this loop inside another join loop, as
        # Borůvka does) SQUARES the checkpointed sizeInBytes estimate per
        # round — see stats_reset_checkpoint for the measured pathology
        new_labels = stats_reset_checkpoint(new_labels)
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if strict and not converged:
        raise RuntimeError(
            f"dedup_clusters: label propagation did not reach a confirmed "
            f"fixed point within {max_iters} iterations (chain-shaped "
            f"component deeper than max_iters?); raise max_iters or pass "
            f"strict=False to accept bounded-depth labels"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def source_shingle_overlap(
    df: DataFrame,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source_a, source_b, inter, union_n): pairwise distinct-shingle
    overlap between corpus sources — the provenance-level duplication
    signal (two feeds scraping the same sites show a fat intersection
    long before doc-level dedup finds the pairs).

    Output is INTEGER-only (intersection and union sizes, both BIGINT):
    emitting the float Jaccard would re-expose the cross-engine
    ROUND(x, 6) .5-boundary flip, and callers can divide.  Pairs with an
    empty intersection are absent (inner-join semantics).

    Scale shape: ONE distinct shuffle bounded by |vocabulary| x |sources|,
    then a self-join whose per-shingle multiplicity is bounded by
    |sources| — a small dimension (tens..thousands), so the join output is
    |shared vocab| x O(|sources|^2) worst case, map-side-combined down to
    one row per source pair.  The distinct frame is localCheckpoint'd
    (EAGER) — it feeds the size aggregate and both join sides.
    """
    # Explicit round-robin repartition BEFORE the shingle expansion: the
    # small parquet input collapses to one split, which would serialize
    # the tokenize+shingle work on one task (the doc_winnow lesson); the
    # distinct reshuffles on (src, sh) afterwards anyway, so the extra
    # exchange ships only the narrow (src, text) rows.  The expansion
    # itself is _doc_shingles with the SOURCE as the id column (same
    # pre-projected-tokens contract, one implementation).
    spark = df.sparkSession
    num = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    ss = (
        _doc_shingles(
            df.select(F.col(source_col), F.col(text_col)).repartition(num),
            text_col,
            source_col,
            n,
        )
        .select(F.col("doc_id").alias("src"), "sh")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = ss.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = ss.select(F.col("src").alias("source_a"), "sh")
    b = ss.select(F.col("src").alias("source_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("src").alias("source_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("src").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("union_n"),
        )
    )


def split_leakage(
    df: DataFrame,
    splits: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_df: int | None = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """(doc_a, doc_b, split_a, split_b): near-duplicate pairs that straddle
    a train/val/test boundary — the eval-hygiene check run before trusting
    any held-out metric (a test doc near-duplicating a train doc inflates
    the score even when exact dedup is clean).

    Composition: the shingle-Jaccard candidate pairs (with the same
    stop-shingle document-frequency cap) joined to the split assignment on
    both endpoints, keeping only boundary-crossing pairs.  The pair set is
    tiny next to the corpus, so AQE broadcasts it against the doc-sized
    split frame; output is split labels only (no float scores).
    """
    pairs = ngram_jaccard_pairs(
        df,
        threshold=threshold,
        n=n,
        text_col=text_col,
        id_col=id_col,
        max_shingle_df=max_shingle_df,
    )
    sa = splits.select(
        F.col(id_col).alias("doc_a"), F.col(split_col).alias("split_a")
    )
    sb = splits.select(
        F.col(id_col).alias("doc_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
    )


def lsh_incremental_oracle_sql(minhash_sig_sql: str, new_source: str) -> str:
    """DuckDB twin of the incremental-LSH probe: candidates between the
    newly-arrived source's docs and the standing corpus, via the same
    2-row banded minhash buckets.  ``minhash_sig_sql`` yields
    (doc_id, i, minhash)."""
    return f"""
WITH sig AS MATERIALIZED ({minhash_sig_sql}),
banded AS MATERIALIZED (
  SELECT doc_id, i // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY i)) AS bucket
  FROM sig GROUP BY doc_id, i // 2
),
newb AS (
  SELECT b.doc_id, b.band, b.bucket FROM banded b
  JOIN documents d USING (doc_id) WHERE d.source = '{new_source}'
),
oldb AS (
  SELECT b.doc_id, b.band, b.bucket FROM banded b
  JOIN documents d USING (doc_id) WHERE d.source <> '{new_source}'
)
SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
FROM newb n JOIN oldb o USING (band, bucket)
"""


def decontamination_oracle_sql(shingles_sql: str, bench_source: str) -> str:
    """DuckDB twin of ``cross_corpus_contamination``: per-doc fraction of
    its distinct shingles that also occur in the held-out benchmark
    source.  ``shingles_sql`` is the engine-shared shingle-array
    expression over a `text` column."""
    return f"""
WITH cs AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest({shingles_sql}) AS sh
  FROM documents WHERE source <> '{bench_source}'
),
bs AS MATERIALIZED (
  SELECT DISTINCT unnest({shingles_sql}) AS sh
  FROM documents WHERE source = '{bench_source}'
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM cs GROUP BY doc_id),
common AS (
  SELECT cs.doc_id, COUNT(*) AS n_common FROM cs JOIN bs USING (sh)
  GROUP BY cs.doc_id
)
SELECT s.doc_id, s.n_sh,
       COALESCE(c.n_common, 0) AS n_common,
       ROUND(CAST(COALESCE(c.n_common, 0) AS DOUBLE) / CAST(s.n_sh AS DOUBLE), 6)
         AS contamination
FROM sizes s LEFT JOIN common c ON s.doc_id = c.doc_id
"""


def dedup_eval_oracle_sql(true_pairs_sql: str, cand_pairs_sql: str) -> str:
    """DuckDB twin of the candidate-set evaluation: precision/recall of
    ANY (doc_a, doc_b) candidate SQL against a ground-truth pair SQL."""
    return f"""
WITH de_true AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({true_pairs_sql})
),
de_cand AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({cand_pairs_sql})
),
de_hit AS (
  SELECT t.doc_a, t.doc_b FROM de_true t
  JOIN de_cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
),
de_n AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM de_true) AS n_true,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM de_cand) AS n_cand,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM de_hit) AS n_hit
)
SELECT n_true, n_cand, n_hit,
       CASE WHEN n_cand > 0
            THEN ROUND(CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE), 6) END
         AS precision,
       CASE WHEN n_true > 0
            THEN ROUND(CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE), 6) END
         AS recall
FROM de_n
"""
