"""Perceptual image dedup (functions/imagededup.py).

Three layers: the numpy decode adapter must agree bit-for-bit with the
DataFrame pipeline (they share one integer core — box sums, strict >),
the banded pairing must equal brute force on random hashes (the
pigeonhole exactness claim), and the hot-bucket cap must never bind at
the oracle-compare scale (capped-operator discipline)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions.imagededup import (
    GRAY_H,
    band_values,
    GRAY_W,
    IMAGE_BAND_CAP,
    dhash_from_gray,
    dhash_ints,
    gray_fixture,
    media_dhash,
    near_dup_pairs,
)

from .conftest import SF_ORACLE


def _fixture_gray(doc_id: int) -> np.ndarray:
    """Pure-Python replay of the gray fixture formula."""
    base, variant = doc_id // 4, doc_id % 4
    a = np.empty((GRAY_H, GRAY_W), dtype=np.int64)
    for r in range(GRAY_H):
        for c in range(GRAY_W):
            raw = ((base * 2654435761 + r * 1299721 + c * 7919) % 1000003) % 256
            flip = (((r // 4) * 9 + (c // 4)) * 31 + base * 7 + 11) % 72 < 2 * variant
            a[r, c] = 255 - raw if flip else raw
    return a


def _p5(gray: np.ndarray) -> bytes:
    h, w = gray.shape
    return b"P5 %d %d 255\n" % (w, h) + gray.astype(np.uint8).tobytes()


def test_dhash_adapter_matches_dataframe_pipeline(spark):
    """dhash_ints over a P5 payload of the fixture matrix must equal the
    DataFrame pipeline's hash for the same doc — the decode path and the
    SQL-checked path share one integer core."""
    docs = spark.createDataFrame([(i,) for i in (0, 5, 13, 42)], "doc_id long")
    df_hashes = {
        r["doc_id"]: (r["h_lo"], r["h_hi"])
        for r in dhash_from_gray(gray_fixture(docs)).collect()
    }
    for doc_id in (0, 5, 13, 42):
        gray = _fixture_gray(doc_id)
        from personalized_pagerank_algorithms_on_neo4j_spark.functions.multimodal import (
            decode_image,
        )

        assert dhash_ints(decode_image(_p5(gray))) == df_hashes[doc_id], doc_id


def test_dhash_rgb_luminance_and_crop():
    """P6 RGB decodes through integer luminance; non-divisible sizes crop
    to the largest grid-divisible region (the codec-free resize)."""
    gray = _fixture_gray(7)
    # an RGB image whose every channel equals the gray value has
    # luminance (299+587+114)*v // 1000 == v exactly
    rgb = np.stack([gray, gray, gray], axis=-1)
    assert dhash_ints(rgb) == dhash_ints(gray)
    # padding rows/cols beyond the grid-divisible region must not matter
    padded = np.pad(gray, ((0, 3), (0, 2)), constant_values=199)
    assert dhash_ints(padded) == dhash_ints(gray)
    with pytest.raises(ValueError, match="smaller than"):
        dhash_ints(np.zeros((4, 4), dtype=np.int64))


def test_banded_pairs_equal_brute_force(spark):
    """Pigeonhole exactness: banding at max_hamming <= 7 recalls every
    true pair.  Random 64-bit hashes plus planted near pairs."""
    rng = random.Random(17)
    rows = []
    for i in range(60):
        rows.append((i, rng.getrandbits(32), rng.getrandbits(32)))
    # planted near-dups: flip 1..7 bits of an existing hash
    for j, flips in enumerate(range(1, 8)):
        src = rows[j]
        lo, hi = src[1], src[2]
        for k in rng.sample(range(64), flips):
            if k < 32:
                lo ^= 1 << k
            else:
                hi ^= 1 << (k - 32)
        rows.append((100 + j, lo, hi))
    df = spark.createDataFrame(rows, "doc_id long, h_lo long, h_hi long")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in near_dup_pairs(df, max_hamming=7).collect()
    )
    want = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            d = bin((a[1] ^ b[1])).count("1") + bin((a[2] ^ b[2])).count("1")
            if d <= 7:
                u, v = sorted((a[0], b[0]))
                want.append((u, v, d))
    assert got == sorted(want)
    assert len([w for w in want if w[2] > 0]) >= 7  # the plants are found
    with pytest.raises(ValueError, match="exact only"):
        near_dup_pairs(df, max_hamming=8)


def test_band_cap_never_binds_at_gate_scale(spark):
    """The hot-bucket skip must be invisible at SF_ORACLE (the scale the
    cap-free brute-force oracle compares at): the fullest 8-bit band
    bucket must sit well under IMAGE_BAND_CAP."""
    import __spark_entry__ as E

    h = E.q_image_dhash(spark, SF_ORACLE)
    bands = band_values(h)  # the operator's REAL bucketing, not a replica
    top = (
        bands.groupBy("band", "value")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert top * 2 <= IMAGE_BAND_CAP, (
        f"fullest band bucket {top} within 2x of IMAGE_BAND_CAP="
        f"{IMAGE_BAND_CAP}; the skip could bind at compare scale"
    )


def test_media_dhash_decode_path(spark):
    """The real decode path: P5 payloads hash identically to the direct
    adapter; codec-bound payloads yield NULL instead of failing the
    Arrow batch."""
    g0, g1 = _fixture_gray(3), _fixture_gray(9)
    media = spark.createDataFrame(
        [
            (3, bytearray(_p5(g0))),
            (9, bytearray(_p5(g1))),
            (99, bytearray(b"\xff\xd8\xff\xe0 jpeg-ish")),
        ],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: (r["h_lo"], r["h_hi"]) for r in media_dhash(media).collect()}
    assert got[3] == dhash_ints(g0)
    assert got[9] == dhash_ints(g1)
    assert got[99] == (None, None)
