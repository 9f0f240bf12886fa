"""Perceptual image dedup: dHash + Hamming-banded candidate pairing.

The reference's host platform treats media dedup as a first-class
curation step next to text dedup (this engine's MinHash/winnow family);
the canonical perceptual primitive is the difference hash (dHash): shrink
the image to a tiny grid, compare each cell to its right neighbour, and
pack the 64 comparison bits — near-duplicate images (recompression,
small edits, watermarks) land within a few flipped bits while unrelated
images sit near Hamming 32.

Exact-integer contract (the engine-wide float-free discipline): the
"shrink" step is a BOX SUM, not a mean — equal-area boxes make
compare-sums identical to compare-means with no division, so the hash is
a pure integer function of the pixels and bit-identical across engines
and across the numpy adapter.  The 64 bits are packed as TWO 32-bit
halves (``h_lo`` bits 0-31 = grid rows 0-3, ``h_hi`` bits 32-63) —
staying clear of BIGINT sign-bit games in either engine.

Banded pairing is EXACT, not approximate, at the shipped threshold: the
hash splits into 8 disjoint 8-bit bands, and any pair within Hamming
distance <= 7 must share at least one untouched band (pigeonhole), so
banding at ``max_hamming`` <= 7 recalls every true pair; the DuckDB
oracle twin rebuilds the pairs BRUTE-FORCE (all pairs, no banding), so
the driver gate checks the semantics, not the candidate machinery.

Scale shape: the dhash derivation is ONE exchange (repartition by image
id BEFORE the pixel explode; the box-sum aggregate, the neighbour
window and the bit-pack aggregate are all satisfied by that one
hash-partitioning); pairing shuffles on (band, value) — never all
pairs.  Hot buckets (near-flat images collapsing to the same band
bytes) are skipped above ``band_cap`` images per bucket, a recall
trade-off documented on the knob; the cap is guard-tested to never bind
at the oracle-compare scale (tests/test_imagededup.py).

The REAL decode path (``media_dhash`` over MEDIA_SCHEMA blobs) reuses
multimodal.decode_image — honest codec-free netpbm, Arrow-batched
``mapInPandas``, no per-row Python UDF in any SQL-checked query — and
shares the same integer core, pinned against the DataFrame pipeline by
tests on synthesized P5/P6 payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import decode_image

# fixture/grid geometry: 32x36 gray pixels, 4x4 boxes -> 8x9 grid ->
# 8 right-neighbour comparisons per row x 8 rows = 64 bits
GRAY_H, GRAY_W = 32, 36
BOX = 4
GRID_ROWS, GRID_COLS = GRAY_H // BOX, GRAY_W // BOX  # 8 x 9

MAX_HAMMING = 6  # < 8 bands -> banded recall is exact (pigeonhole)
IMAGE_BAND_CAP = 512  # skip hotter buckets (recall trade; guard-tested)

# deterministic synthetic "decoded image" for the fixture tables: four
# variants per base image (base = doc_id div 4); variant k inverts
# 2k pseudo-random boxes, so same-base pairs sit at small, variant-
# distance-proportional Hamming distances and cross-base pairs are far.
# One template, two integer-division spellings (Spark DIV vs DuckDB //).
_V_RAW = "((({base}) * 2654435761 + r * 1299721 + c * 7919) % 1000003) % 256"
_V_FLIP = "((((r {div} 4) * 9 + (c {div} 4)) * 31 + ({base}) * 7 + 11) % 72) < 2 * (doc_id % 4)"


def _v_expr(div: str) -> str:
    base = f"doc_id {div} 4"
    raw = _V_RAW.format(base=base)
    flip = _V_FLIP.format(base=base, div=div)
    return f"CASE WHEN {flip} THEN 255 - ({raw}) ELSE ({raw}) END"


def gray_fixture(docs: DataFrame) -> DataFrame:
    """(doc_id, r, c, v): the deterministic synthetic gray matrix per
    document — the engine-side stand-in for a decoded image in the
    SQL-checked queries (the REAL decode path is ``media_dhash``).
    Repartitions by doc_id BEFORE the 1152x pixel explode: pre-explode
    rows ship smaller, and every downstream grouping/window in the dhash
    derivation is satisfied by this one exchange."""
    spark = docs.sparkSession
    n = spark.sparkContext.defaultParallelism
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        .repartition(n, "doc_id")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(GRAY_H - 1))).alias("r"),
        )
        .select(
            "doc_id",
            "r",
            F.explode(F.sequence(F.lit(0), F.lit(GRAY_W - 1))).alias("c"),
        )
        .select("doc_id", "r", "c", F.expr(_v_expr("DIV")).alias("v"))
    )


def gray_fixture_sql(docs_sql: str) -> str:
    return f"""
  SELECT doc_id, r, c, CAST({_v_expr('//')} AS BIGINT) AS v
  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ({docs_sql}) dd) d,
       range(0, {GRAY_H}) t1(r), range(0, {GRAY_W}) t2(c)
"""


def dhash_from_gray(gray: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, h_lo, h_hi): pack the 64 right-neighbour box-sum
    comparisons.  Bit k = gr * 8 + gc is set iff sum(box[gr][gc]) >
    sum(box[gr][gc+1]); strict > keeps ties at 0 in both engines."""
    s = gray.groupBy(
        F.col(id_col).alias("doc_id"),
        (F.col("r") / BOX).cast("long").alias("gr"),
        (F.col("c") / BOX).cast("long").alias("gc"),
    ).agg(F.sum("v").alias("s"))
    w = Window.partitionBy("doc_id", "gr").orderBy("gc")
    bits = (
        s.select(
            "doc_id",
            "gr",
            "gc",
            "s",
            F.lead("s").over(w).alias("s_next"),
        )
        .where(F.col("gc") < GRID_COLS - 1)
        .select(
            "doc_id",
            (F.col("gr") * (GRID_COLS - 1) + F.col("gc")).alias("k"),
            (F.col("s") > F.col("s_next")).cast("long").alias("bit"),
        )
    )
    # F.shiftleft takes a literal bit count; a per-row shift needs expr
    half = F.when(
        F.col("k") < 32,
        F.col("bit") * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))"),
    )
    half_hi = F.when(
        F.col("k") >= 32,
        F.col("bit") * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(k - 32 AS INT))"),
    )
    return bits.groupBy("doc_id").agg(
        F.coalesce(F.sum(half), F.lit(0)).cast("long").alias("h_lo"),
        F.coalesce(F.sum(half_hi), F.lit(0)).cast("long").alias("h_hi"),
    )


def _dhash_sql(gray_sql: str) -> str:
    """CTE body computing (doc_id, h_lo, h_hi) from a gray-matrix SQL."""
    return f"""
img_gray AS MATERIALIZED ({gray_sql}),
img_box AS MATERIALIZED (
  SELECT doc_id, r // {BOX} AS gr, c // {BOX} AS gc, SUM(v) AS s
  FROM img_gray GROUP BY doc_id, r // {BOX}, c // {BOX}
),
img_bits AS MATERIALIZED (
  SELECT doc_id, gr * {GRID_COLS - 1} + gc AS k,
         CASE WHEN s > LEAD(s) OVER (PARTITION BY doc_id, gr ORDER BY gc)
              THEN 1 ELSE 0 END AS bit
  FROM img_box QUALIFY gc < {GRID_COLS - 1}
),
img_hash AS MATERIALIZED (
  SELECT doc_id,
         CAST(COALESCE(SUM(CASE WHEN k < 32
                    THEN bit * (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) END), 0) AS BIGINT) AS h_lo,
         CAST(COALESCE(SUM(CASE WHEN k >= 32
                    THEN bit * (CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)) END), 0) AS BIGINT) AS h_hi
  FROM img_bits GROUP BY doc_id
)"""


def dhash_oracle_sql(docs_sql: str) -> str:
    return f"""
WITH {_dhash_sql(gray_fixture_sql(docs_sql))}
SELECT doc_id, h_lo, h_hi FROM img_hash
"""


def band_values(hashes: DataFrame) -> DataFrame:
    """(doc_id, band, value): the 8 disjoint 8-bit Hamming-LSH bands
    (0-3 from h_lo, 4-7 from h_hi) — shared by the pairing operator and
    the cap guard test so the guard measures the REAL bucketing."""
    return hashes.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("band"),
        "h_lo",
        "h_hi",
    ).select(
        "doc_id",
        "band",
        F.expr(
            "shiftright(CASE WHEN band < 4 THEN h_lo ELSE h_hi END,"
            " CAST((band % 4) * 8 AS INT)) & 255"
        ).alias("value"),
    )


def near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = MAX_HAMMING,
    band_cap: int = IMAGE_BAND_CAP,
) -> DataFrame:
    """(doc_a, doc_b, hamming): all pairs within ``max_hamming`` bit
    flips, found via 8-bit band buckets (exact for max_hamming <= 7 —
    any such pair shares an untouched band by pigeonhole), verified on
    the packed halves with bit_count(xor).  Buckets holding more than
    ``band_cap`` images are skipped — a documented recall trade for
    hot buckets at corpus scale (flat-image band bytes), guard-tested
    to never bind at the oracle-compare scale."""
    if not 0 <= max_hamming <= 7:
        raise ValueError("banded recall is exact only for max_hamming in [0, 7]")
    h = hashes.localCheckpoint(eager=True)  # bands + both verify sides
    bands = band_values(h)
    sizes = bands.groupBy("band", "value").agg(F.count("*").alias("_bn"))
    keep = bands.join(
        sizes.where(F.col("_bn") <= int(band_cap)), ["band", "value"]
    ).drop("_bn")
    a = keep.select(
        F.col("doc_id").alias("doc_a"), "band", "value"
    )
    b = keep.select(F.col("doc_id").alias("doc_b"), "band", "value")
    cand = (
        a.join(b, ["band", "value"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = h.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h_lo").alias("lo_a"),
        F.col("h_hi").alias("hi_a"),
    )
    hb = h.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h_lo").alias("lo_b"),
        F.col("h_hi").alias("hi_b"),
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
                + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= int(max_hamming))
    )


def near_dup_oracle_sql(docs_sql: str, max_hamming: int = MAX_HAMMING) -> str:
    """Brute-force twin: ALL pairs, no banding — a different pairing
    algorithm, so the gate checks the dedup semantics."""
    return f"""
WITH {_dhash_sql(gray_fixture_sql(docs_sql))}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.h_lo, b.h_lo)) + bit_count(xor(a.h_hi, b.h_hi)) AS BIGINT) AS hamming
FROM img_hash a JOIN img_hash b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h_lo, b.h_lo)) + bit_count(xor(a.h_hi, b.h_hi)) <= {int(max_hamming)}
"""


def _clusters_sql(docs_sql: str, max_hamming: int) -> str:
    """Shared CTE chain (brute-force pairs -> exact recursive closure ->
    min-label clusters) for the cluster and survivorship oracles — ONE
    place for the pairing predicate and closure, mirroring what
    ``_dhash_sql`` does for the hash CTEs."""
    return f"""{_dhash_sql(gray_fixture_sql(docs_sql))},
img_pair AS MATERIALIZED (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM img_hash a JOIN img_hash b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.h_lo, b.h_lo)) + bit_count(xor(a.h_hi, b.h_hi)) <= {int(max_hamming)}
),
img_und AS MATERIALIZED (
  SELECT u AS a, v AS b FROM img_pair UNION SELECT v, u FROM img_pair
),
img_r(a, b) AS (
  SELECT a, a FROM (SELECT a FROM img_und UNION SELECT b FROM img_und) n0
  UNION
  SELECT rr.a, p.b FROM img_r rr JOIN img_und p ON rr.b = p.a
),
img_cl AS MATERIALIZED (
  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS cluster_id FROM img_r GROUP BY a
)"""


def dup_clusters_oracle_sql(docs_sql: str, max_hamming: int = MAX_HAMMING) -> str:
    """Connected components over the brute-force near-dup pairs via
    exact recursive closure (no depth bound to guard)."""
    return f"""
WITH RECURSIVE {_clusters_sql(docs_sql, max_hamming)}
SELECT doc_id, cluster_id FROM img_cl
"""


# --- the REAL decode path (MEDIA_SCHEMA blobs) -------------------------------


def dhash_ints(gray: np.ndarray) -> tuple[int, int]:
    """(h_lo, h_hi) of a decoded gray (or RGB) image — the numpy twin of
    the DataFrame pipeline, sharing the identical integer core: integer
    luminance (299r + 587g + 114b) // 1000 for RGB, crop to the largest
    grid-divisible region, box SUMS, strict > comparisons."""
    a = np.asarray(gray)
    if a.ndim == 3:
        a = (
            299 * a[:, :, 0].astype(np.int64)
            + 587 * a[:, :, 1].astype(np.int64)
            + 114 * a[:, :, 2].astype(np.int64)
        ) // 1000
    a = a.astype(np.int64)
    h, w = a.shape
    bh, bw = h // GRID_ROWS, w // GRID_COLS
    if bh == 0 or bw == 0:
        raise ValueError(f"image {h}x{w} smaller than the {GRID_ROWS}x{GRID_COLS} grid")
    a = a[: bh * GRID_ROWS, : bw * GRID_COLS]
    sums = a.reshape(GRID_ROWS, bh, GRID_COLS, bw).sum(axis=(1, 3))
    lo = hi = 0
    for gr in range(GRID_ROWS):
        for gc in range(GRID_COLS - 1):
            if sums[gr, gc] > sums[gr, gc + 1]:
                k = gr * (GRID_COLS - 1) + gc
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
    return lo, hi


_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("h_lo", T.LongType(), True),
        T.StructField("h_hi", T.LongType(), True),
    ]
)


def media_dhash(media: DataFrame) -> DataFrame:
    """(media_id, h_lo, h_hi) from MEDIA_SCHEMA blobs via the codec-free
    netpbm decode — Arrow-batched ``mapInPandas`` (payloads are large;
    the repartition-by-id-before-decode discipline is the caller's, as
    in multimodal.extract_decoded_features).  Undecodable payloads (the
    honest codec boundary) yield NULL hashes rather than failing the
    batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lo_out, hi_out = [], []
            for payload in pdf["payload"]:
                try:
                    lo, hi = dhash_ints(decode_image(payload))
                except (NotImplementedError, ValueError):
                    lo, hi = None, None
                lo_out.append(lo)
                hi_out.append(hi)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "h_lo": pd.array(lo_out, dtype="Int64"),
                    "h_hi": pd.array(hi_out, dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=_DHASH_SCHEMA
    )


def dup_survivors_oracle_sql(docs_sql: str, max_hamming: int = MAX_HAMMING) -> str:
    """Survivorship over the image duplicate clusters: ONE survivor per
    cluster, longest text (ties -> lowest id — the SHARED election rule,
    see functions/dedup.survivors_from_clusters).  Reuses the cluster
    CTE chain verbatim, so the two oracles cannot disagree about
    membership."""
    return f"""
WITH RECURSIVE {_clusters_sql(docs_sql, max_hamming)},
img_sized AS (
  SELECT c.doc_id, c.cluster_id, LENGTH(d.text) AS len
  FROM img_cl c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT doc_id, cluster_id, survivor_id, doc_id = survivor_id AS keep
FROM (
  SELECT doc_id, cluster_id,
         FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
                                   ORDER BY len DESC, doc_id ASC) AS survivor_id
  FROM img_sized
)
"""
