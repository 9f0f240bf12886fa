"""Tests for the LLM-data-pipeline operators (dedup / text / simsearch /
multimodal) against independent plain-Python references."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from personalized_pagerank_algorithms_on_neo4j_spark.functions import (
    dedup,
    multimodal,
    simsearch,
    text,
)

from .conftest import SF_SMALL

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "THE quick   brown fox jumps over the lazy dog"),  # dup after normalize
    (3, "the quick brown fox leaps over the lazy dog"),  # near dup (1 token)
    (4, "der hund und die katze sind mit der maus"),  # German-ish
    (5, "completely different text about spark engines and data"),
    (6, "le chat est dans la maison et le jardin"),  # French-ish
    (7, "zzz qqq xxx"),  # no stopwords -> unknown
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def _py_hash(s: str, seed: int = 0) -> int:
    return int(hashlib.md5(f"{s}#{seed}".encode()).hexdigest()[:12], 16)


def test_portable_hash_matches_python(spark, docs_df):
    rows = docs_df.select("text", text.portable_hash(F.col("text")).alias("h")).collect()
    for r in rows:
        assert r["h"] == _py_hash(r["text"])


def test_exact_dup_groups(docs_df):
    groups = dedup.exact_dup_groups(docs_df).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 0 and groups[0]["n_dups"] == 3


def test_exact_dedup_keeps_smallest(docs_df):
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(docs_df).collect())
    assert kept == [0, 3, 4, 5, 6, 7]


def test_ngram_jaccard_finds_near_dup(docs_df):
    pairs = dedup.ngram_jaccard_pairs(docs_df, threshold=0.3, n=3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 3) in got and 0.3 <= got[(0, 3)] < 1.0
    assert (0, 5) not in got


def test_jaccard_value_matches_python(docs_df):
    def py_shingles(t, n=3):
        toks = " ".join(t.lower().split()).split(" ")
        if len(toks) <= n:
            return {" ".join(toks[:n])}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    a, b = py_shingles(DOCS[0][1]), py_shingles(DOCS[3][1])
    expect = round(len(a & b) / len(a | b), 6)
    pairs = dedup.ngram_jaccard_pairs(docs_df, threshold=0.0, n=3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 3)] == expect


def test_minhash_lsh_recall(docs_df):
    # 16 single-row bands: collision prob 1-(1-j)^16 (~0.9997 at j=0.4);
    # deterministic given the md5 hash family
    cand = dedup.minhash_lsh_candidates(docs_df, num_hashes=16, bands=16)
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (0, 1) in pairs and (0, 2) in pairs  # exact dups always collide
    assert (0, 3) in pairs  # j=0.4 near dup
    assert (0, 5) not in pairs  # unrelated docs share no shingle
    verified = dedup.minhash_dedup_pairs(docs_df, threshold=0.9, num_hashes=16, bands=16)
    vp = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert (0, 1) in vp and (0, 3) not in vp


def test_simhash_groups_exact_dups(docs_df):
    groups = dedup.simhash_dup_groups(docs_df, bits=32)
    rows = groups.collect()
    assert any(r["keep_id"] == 0 and r["n_docs"] == 3 for r in rows)
    # signatures of near-dups are close in hamming distance
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_df, 32).collect()}
    ham = bin(sh[0] ^ sh[3]).count("1")
    ham_far = bin(sh[0] ^ sh[5]).count("1")
    assert ham < ham_far


def test_langid_and_quality(docs_df):
    prof = {r["doc_id"]: r for r in text.text_profile(docs_df).collect()}
    assert prof[0]["lang_pred"] == "en"
    assert prof[4]["lang_pred"] == "de"
    assert prof[6]["lang_pred"] == "fr"
    assert prof[7]["lang_pred"] == "unknown"
    assert prof[0]["n_tokens"] == 9
    assert 0.0 <= prof[7]["quality"] <= prof[0]["quality"] <= 1.0
    # fingerprints: identical bag of words => identical fingerprint
    assert prof[0]["fingerprint"] == prof[1]["fingerprint"]
    assert prof[0]["fingerprint"] != prof[5]["fingerprint"]


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([(1, "hello42world! x2")], "id long, text string")
    toks = df.select(text.bpe_ish_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["hello", "42", "world", "!", "x", "2"]


def test_cosine_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got = simsearch.cosine_topk(emb, query_id=0, k=5).collect()
    pdf = emb.toPandas()
    vecs = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    q = vecs[pdf["vec_id"].tolist().index(0)]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    expect = {
        int(pdf["vec_id"][i]): round(float(cos[i]), 6)
        for i in np.argsort(-cos)[:5]
    }
    got_map = {r["vec_id"]: r["cosine"] for r in got}
    for vid, c in expect.items():
        assert got_map.get(vid) == pytest.approx(c, abs=2e-6)


def test_lsh_and_ivf_topk_contain_top1(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    brute = {r["vec_id"] for r in simsearch.cosine_topk(emb, 0, k=3).collect()}
    lsh = {r["vec_id"] for r in simsearch.lsh_topk(emb, 0, k=10).collect()}
    ivf = {r["vec_id"] for r in simsearch.ivf_topk(emb, 0, k=10, n_cells=8, nprobe=4).collect()}
    assert 0 in lsh and 0 in ivf  # the query itself always survives
    # approximate methods should recover a reasonable share of the brute top-3
    assert len(brute & lsh) >= 2


def test_embedding_near_dup_pairs_run(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.8, sketch_dims=8)
    for r in pairs.take(5):
        assert r["cosine"] >= 0.8


def test_semantic_dedup_pairs_within_cluster_and_cap(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    pairs = dedup.semantic_dedup_pairs(emb, k=8, iterations=1, threshold=0.8)
    for r in pairs.take(5):
        assert r["cosine"] >= 0.8
    # every reported pair must share a k-means cluster
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.clustering import (
        kmeans_assign,
    )

    labels = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, k=8, iterations=1).collect()
    }
    for r in pairs.collect():
        assert labels[r["id_a"]] == labels[r["id_b"]]
    # a cap below every cluster size excludes all pairs
    assert (
        dedup.semantic_dedup_pairs(
            emb, k=8, iterations=1, threshold=0.8, max_cluster_size=0
        ).count()
        == 0
    )


def _ppm_bytes(pixels, magic=b"P6", maxval=255):
    """Serialize a small netpbm image: pixels is an (h, w[, 3]) uint array."""
    import numpy as np

    arr = np.asarray(pixels)
    h, w = arr.shape[:2]
    header = b"%s\n# test comment\n%d %d\n%d\n" % (magic, w, h, maxval)
    dt = ">u2" if maxval > 255 else "u1"
    return header + arr.astype(dt).tobytes()


def _wav_bytes(samples, rate=8000):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_decode_image_netpbm_exact():
    import numpy as np

    px = np.arange(12).reshape(2, 2, 3) * 20
    out = multimodal.decode_image(_ppm_bytes(px))
    assert out.shape == (2, 2, 3) and (out == px).all()
    gray = np.array([[0, 100], [200, 255]])
    out5 = multimodal.decode_image(_ppm_bytes(gray, magic=b"P5"))
    assert out5.shape == (2, 2) and (out5 == gray).all()
    wide = np.array([[300, 65535]])
    out16 = multimodal.decode_image(_ppm_bytes(wide, magic=b"P5", maxval=65535))
    assert out16.dtype == np.dtype(">u2") and (out16 == wide).all()
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_decode_audio_wav_roundtrip():
    import numpy as np

    sig = (np.sin(np.linspace(0, 20, 400)) * 20000).astype("<i2")
    samples, rate = multimodal.decode_audio(_wav_bytes(sig, rate=16000))
    assert rate == 16000 and samples.shape == (400, 1)
    assert (samples[:, 0] == sig).all()


def test_extract_decoded_features_mixed(spark):
    import numpy as np

    px = (np.arange(48).reshape(4, 4, 3) * 5).astype("u1")
    rows = [
        (1, "image", bytearray(_ppm_bytes(px)), "image/x-portable-pixmap"),
        (2, "audio", bytearray(_wav_bytes([0, 1000, -1000, 500] * 50)), "audio/wav"),
        (3, "image", bytearray(b"\xff\xd8\xff\xe0 jpeg-ish"), "image/jpeg"),
        (4, "image", None, "image/x-portable-pixmap"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string"
    )
    out = {
        r["media_id"]: r
        for r in multimodal.extract_decoded_features(media).collect()
    }
    assert out[1]["decode_ok"] and len(out[1]["features"]) == multimodal.FEATURE_DIM
    # mean of channel 0 matches the real pixel data
    assert out[1]["features"][0] == pytest.approx(
        float((px[:, :, 0] / px.max()).mean()), abs=1e-5
    )
    assert out[2]["decode_ok"] and out[2]["features"][0] > 0  # real RMS
    assert not out[3]["decode_ok"] and out[3]["features"] is None
    assert not out[4]["decode_ok"]
    with pytest.raises(Exception):
        multimodal.extract_decoded_features(media, on_error="raise").collect()


def test_multimodal_features_deterministic(spark, docs_df):
    media = multimodal.media_from_documents(docs_df)
    feats = multimodal.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == len(DOCS)
    assert rows[0]["features"] == rows[1]["features"]  # same payload bytes
    assert rows[0]["n_bytes"] == len(DOCS[0][1].encode())
    expect = multimodal._fake_features(DOCS[0][1].encode())
    assert rows[0]["features"] == pytest.approx(expect)
    # codec-requiring formats are explicitly not implemented
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_resize_and_frame_plans(spark):
    media = spark.createDataFrame(
        [
            (1, "image", None, "image/png", 1024, 512, None),
            (2, "image", None, "image/png", 100, 50, None),
            (3, "video", None, "video/mp4", None, None, 3500),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    rs = {r["media_id"]: r for r in multimodal.resize_plan(media, 512).collect()}
    assert rs[1]["out_width"] == 512 and rs[1]["out_height"] == 256
    assert rs[2]["scale"] == 1.0
    frames = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_ngram_jaccard_df_cap(spark, docs_df):
    """The shingle document-frequency cap must (a) leave results unchanged
    when no shingle exceeds it and (b) prune hot stop-shingles from the
    self-join so a pathological corpus can't go quadratic."""
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs_df, threshold=0.3, n=3, max_shingle_df=None
        ).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs_df, threshold=0.3, n=3, max_shingle_df=1000
        ).collect()
    }
    assert capped == uncapped  # cap never binds on the fixture

    # hot-shingle corpus: every doc shares one stop-shingle ("aaa bbb ccc"),
    # plus a unique tail -> uncapped join would make all n^2/2 pairs
    hot = spark.createDataFrame(
        [(i, f"aaa bbb ccc unique{i} tail{i} words{i}") for i in range(60)],
        schema="doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(hot, threshold=0.0, n=3, max_shingle_df=10)
    # the only shared shingles have DF=60 > cap, so NO pair survives the
    # capped join (instead of 60*59/2 = 1770 pairs)
    assert pairs.count() == 0


def test_minhash_hot_bucket_cap(spark, docs_df):
    """The (band, bucket) size cap must (a) leave candidates unchanged when no
    bucket exceeds it and (b) bound the self-join output on a mass-duplicate
    corpus — an uncapped hot bucket emits O(k^2) pairs."""
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(
            docs_df, num_hashes=16, bands=16
        ).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(
            docs_df, num_hashes=16, bands=16, max_bucket_size=None
        ).collect()
    }
    assert capped == uncapped  # default cap never binds on the fixture

    # 60 byte-identical docs -> identical signatures -> every band is one
    # bucket of size 60; 3 distinct near-dup docs stay under the cap
    boiler = [(i, "aaa bbb ccc ddd eee fff ggg") for i in range(60)]
    tail = [(100 + i, "hhh iii jjj kkk lll") for i in range(3)]
    hot = spark.createDataFrame(
        boiler + tail, schema="doc_id long, text string"
    )
    pairs = dedup.minhash_lsh_candidates(
        hot, num_hashes=16, bands=4, max_bucket_size=10
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # boilerplate bucket (size 60 > 10) dropped: none of its 1770 pairs
    assert not any(a < 100 for a, _ in got)
    # the small identical-trio bucket (size 3) is untouched
    assert got == {(100, 101), (100, 102), (101, 102)}


def test_lsh_index_probe_matches_collision_set(spark):
    """The indexed probe must return exactly the ids sharing >= 1 band value
    with the query (no full-scan OR-filter), and a precomputed index must be
    reusable across queries."""
    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(40)],
        schema="vec_id long, embedding array<double>",
    )
    idx = simsearch.build_lsh_index(emb, sketch_dims=16, bands=4).cache()
    try:
        assert idx.count() == 40 * 4  # one row per (vector, band)

        # brute-force collision set for query 0 from the index itself
        qkeys = {(r["band"], r["value"]) for r in idx.where("id = 0").collect()}
        expect = {
            r["id"] for r in idx.collect() if (r["band"], r["value"]) in qkeys
        }
        got = simsearch.lsh_topk(emb, 0, k=1000, index=idx)
        assert {r["vec_id"] for r in got.collect()} == expect

        # same index serves another query (amortized build)
        got7 = simsearch.lsh_topk(emb, 7, k=1000, index=idx)
        assert 7 in {r["vec_id"] for r in got7.collect()}
    finally:
        # leaving this cached would substitute an InMemoryRelation into any
        # later test that builds the same plan (see test_plans)
        idx.unpersist()


def test_dedup_clusters_components(spark):
    """Min-label components: a chain {1-2, 2-3}, a pair {10-11}, ids not in
    any pair absent (they're singletons by construction)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_oracle_depth(spark):
    """The unrolled oracle depth must cover convergence at the compare scale
    (mirror of the push-chain depth guard)."""
    import __spark_entry__ as E
    from .conftest import SF_ORACLE

    d = E._t(spark, SF_ORACLE, "documents").select("doc_id", "text")
    pairs = dedup.minhash_lsh_candidates(d, num_hashes=8, bands=4, n=3).cache()
    try:
        shallow = dedup.dedup_clusters(pairs, max_iters=E.CLUSTER_STEPS)
        deep = dedup.dedup_clusters(pairs, max_iters=64)
        s = {(r["doc_id"], r["cluster_id"]) for r in shallow.collect()}
        f = {(r["doc_id"], r["cluster_id"]) for r in deep.collect()}
        assert s == f
    finally:
        # this plan is identical to the one test_plans inspects — a leaked
        # cache entry would swap an InMemoryRelation into that test's plan
        pairs.unpersist()


# ---------------------------------------------------------------------------
# Sampling / splitting (training-data curation)
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_consistent(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sampling

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    s25 = {r["doc_id"] for r in sampling.hash_sample(df, 0.25, seed=3).collect()}
    s25b = {r["doc_id"] for r in sampling.hash_sample(
        df.repartition(7), 0.25, seed=3).collect()}
    assert s25 == s25b  # partition-layout invariant
    # rate monotonicity: a higher-rate sample CONTAINS the lower-rate one
    s50 = {r["doc_id"] for r in sampling.hash_sample(df, 0.50, seed=3).collect()}
    assert s25 <= s50
    # roughly proportional (hash uniformity; generous bounds on n=2000)
    assert 0.19 < len(s25) / 2000 < 0.31
    # different seed -> a genuinely different draw
    s25c = {r["doc_id"] for r in sampling.hash_sample(df, 0.25, seed=4).collect()}
    assert s25 != s25c


def test_split_assign_partitions_every_row_once(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sampling

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = sampling.split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 1000  # exactly one split per row
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.split_assign(df, {"a": 0.5, "b": 0.4})


def test_stratified_sample_rates_per_stratum(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sampling

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(
        df, {"en": 0.2, "zh": 1.0}, strata_col="lang", seed=5
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["zh"] == 500  # rate 1.0 keeps the whole stratum
    assert 60 < counts["en"] < 140  # ~0.2 of 500
    # stratum not listed -> default_rate (0) drops it
    rows2 = [(i, "fr") for i in range(100)]
    df2 = spark.createDataFrame(rows2, "doc_id long, lang string")
    assert sampling.stratified_sample(
        df2, {"en": 0.5}, strata_col="lang").count() == 0


# ---------------------------------------------------------------------------
# K-means clustering
# ---------------------------------------------------------------------------


def test_kmeans_matches_numpy_lloyd(spark):
    """The DataFrame k-means must replay exactly the same recurrence as a
    plain-numpy Lloyd run with the same deterministic seed/rounding rules."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import clustering

    rng = np.random.default_rng(0)
    dim, n, k, iters = 8, 120, 4, 3
    X = np.round(rng.normal(size=(n, dim)), 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["cluster"] for r in
           clustering.kmeans_assign(df, k=k, iterations=iters, dim=dim).collect()}

    cents = X[:k].astype(float).copy()
    for it in range(iters + 1):
        d2 = np.round(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 9)
        assign = d2.argmin(axis=1)  # argmin takes lowest index on ties
        if it == iters:
            break
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = np.round(X[mask].mean(axis=0), 6)
    assert got == {i: int(assign[i]) for i in range(n)}


def test_kmeans_zero_iterations_is_seed_assignment(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import clustering

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.1, 0.0]), (3, [9.9, 10.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["cluster"] for r in
           clustering.kmeans_assign(df, k=2, iterations=0, dim=2).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# Corpus hygiene: PII scrub, repetition, decontamination
# ---------------------------------------------------------------------------


def test_redact_pii_and_counts(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.org today"),
        (1, "see https://a.example/path?q=1 and http://b.example/x"),
        (2, "call 555 123-4567 or 555 9999-0000"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        text.pii_count(F.col("text"), "email").alias("e"),
        text.pii_count(F.col("text"), "url").alias("u"),
        text.pii_count(F.col("text"), "phone").alias("p"),
        text.redact_pii(F.col("text")).alias("clean"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert (by_id[0]["e"], by_id[0]["u"], by_id[0]["p"]) == (1, 0, 0)
    assert by_id[0]["clean"] == "mail me at <EMAIL> today"
    assert (by_id[1]["e"], by_id[1]["u"]) == (0, 2)
    assert by_id[1]["clean"] == "see <URL> and <URL>"
    assert by_id[2]["p"] == 2
    assert by_id[2]["clean"] == "call <PHONE> or <PHONE>"
    assert by_id[3]["clean"] == "nothing sensitive here"


def test_repetition_ratio(spark):
    rows = [
        (0, "a b a b a b"),          # bigrams: ab ba ab ba ab -> 2 distinct / 5
        (1, "w x y z"),              # all distinct -> 0
        (2, ""),                     # empty -> 0 by convention
        (3, "solo"),                 # single token -> one degenerate gram -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["rep"] for r in df.select(
        "doc_id", text.repetition_ratio(F.col("text"), 2).alias("rep")).collect()}
    assert got[0] == round(1 - 2 / 5, 6)
    assert got[1] == 0.0
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_cross_corpus_contamination(spark):
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),         # shares all shingles w/ bench
            (11, "epsilon zeta eta theta"),         # shares none
            (12, "alpha beta gamma iota kappa"),    # partial
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           dedup.cross_corpus_contamination(corpus, bench, n=3).collect()}
    assert got[10]["contamination"] == 1.0
    assert got[11]["contamination"] == 0.0
    assert 0.0 < got[12]["contamination"] < 1.0
    # corpus docs 10: shingles {abc, bcd(3-grams of 4 tokens -> 2)}; sanity on sizes
    assert got[10]["n_sh"] == 2 and got[10]["n_common"] == 2


def test_weighted_sample_scales_with_weight(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sampling

    rows = [(i, 1.0 if i < 500 else 0.1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = sampling.weighted_sample(df, "w", base_rate=1.0, seed=2).groupBy(
        (F.col("doc_id") < 500).alias("hi")
    ).count().collect()
    by = {r["hi"]: r["count"] for r in kept}
    assert by[True] == 500          # weight 1.0 keeps everything
    assert 25 < by.get(False, 0) < 75  # weight 0.1 keeps ~10% of 500
    # weight 0 drops everything
    z = spark.createDataFrame([(i, 0.0) for i in range(100)], "doc_id long, w double")
    assert sampling.weighted_sample(z, "w").count() == 0


def test_ivf_with_kmeans_trained_centroids(spark):
    """An IVF index built from kmeans_fit centroids must keep working end to
    end (trained cells track the data distribution; recall at least matches
    the seed-cell index for the self-query)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import clustering
    from .conftest import SF_SMALL
    from personalized_pagerank_algorithms_on_neo4j_spark.sources.tables import load_table

    e = load_table(spark, SF_SMALL, "embeddings")
    cents = clustering.kmeans_fit(e, k=8, iterations=2, dim=64)
    assert len(cents) == 8 and len(cents[0]) == 64
    index = simsearch.ivf_assign(e, centroids=cents)
    got = simsearch.ivf_topk(e, query_id=0, k=5, nprobe=3, index=index).collect()
    assert any(r["vec_id"] == 0 for r in got)  # self-query recalls itself
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in got)
    # every vector landed in a trained cell
    _, assigned = index
    assert assigned.count() == e.count()


def test_tfidf_top_terms(spark):
    """Hand-checked tf-idf on a 3-doc corpus; ROW_NUMBER tiebreak on term."""
    import math

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["term"]): (r["score"], r["pos"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }

    def idf(df_):
        return round(math.log(4.0 / (df_ + 1.0)) + 1.0, 6)

    # doc 0: apple tf=2 df=1, banana tf=1 df=2
    assert out[(0, "apple")] == (round(2 * idf(1), 6), 1)
    assert out[(0, "banana")] == (round(1 * idf(2), 6), 2)
    # doc 2: cherry tf=2 df=2, date tf=1 df=1
    assert out[(2, "cherry")][1] == 1 and out[(2, "date")][1] == 2
    # k=2 cap holds per doc
    assert len(out) == 6


def test_exact_k_sample_exact_and_repartition_stable(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.sampling import (
        exact_k_sample,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)], "doc_id long, lang string"
    )
    # per-stratum: exactly min(k, |stratum|) rows
    got = exact_k_sample(df, k=7, seed=1, strata_col="lang").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["a"]) == 7 and len(by_lang["b"]) == 7
    # global: exact k, and the chosen set is partition-layout independent
    g1 = {r["doc_id"] for r in exact_k_sample(df, k=9, seed=1).collect()}
    g2 = {
        r["doc_id"]
        for r in exact_k_sample(df.repartition(13), k=9, seed=1).collect()
    }
    assert g1 == g2 and len(g1) == 9
    # k > |df| keeps everything
    assert exact_k_sample(df, k=100, seed=1).count() == 60


def test_funnel_reach_and_report(spark):
    """Hand-built log: ordered-first-occurrence semantics, not mere presence."""
    from datetime import datetime

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        funnel_reach,
        funnel_report,
    )

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: view -> click -> purchase in order => 3
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2: purchase BEFORE first click => stops at 2 (view<=click ok)
        (2, t(0), "view"), (2, t(1), "purchase"), (2, t(2), "click"),
        # u3: click only (no view) => 0
        (3, t(0), "click"),
        # u4: view only => 1
        (4, t(5), "view"),
    ]
    df = spark.createDataFrame(
        [(u, ts, et) for u, ts, et in rows],
        "user_id long, ts timestamp, event_type string",
    )
    steps = ["view", "click", "purchase"]
    got = {r["user"]: r["reached"] for r in funnel_reach(df, steps).collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 1}

    rep = {r["step_idx"]: (r["step"], r["n_users"], r["conversion"])
           for r in funnel_report(df, steps).collect()}
    assert rep[1] == ("view", 3, 1.0)
    assert rep[2] == ("click", 2, round(2 / 3, 6))
    assert rep[3] == ("purchase", 1, round(1 / 3, 6))


def test_retention_cohorts(spark):
    from datetime import datetime

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        retention_cohorts,
    )

    # 2024-01-01 is a Monday; u1 signs up wk0 and is active wk0+wk2,
    # u2 signs up wk0, active wk0 only; u3 never signs up (excluded)
    rows = [
        (1, datetime(2024, 1, 2), "signup"),
        (1, datetime(2024, 1, 16), "click"),
        (2, datetime(2024, 1, 3), "signup"),
        (3, datetime(2024, 1, 4), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r["cohort"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 2): 1}


def test_bloom_no_false_negatives_and_probe_plan(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import bloom as B

    members = spark.createDataFrame(
        [(f"item-{i}",) for i in range(200)], "v string"
    )
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(400)], "v string"
    )
    m_bits = B.WORD_BITS * 64  # 3072 bits for 200 keys: low FP
    filt = B.bloom_build(members, "v", m_bits, k_hashes=3).cache()
    filt.count()
    try:
        # Bloom guarantee: every member probes true
        probed = B.bloom_probe(members, filt, "v", m_bits, 3)
        assert probed.where(~F.col("maybe_member")).count() == 0
        # non-members: mostly false (FP rate well under 50% at this sizing)
        fp = B.bloom_probe(others, filt, "v", m_bits, 3)
        n_fp = fp.where(F.col("maybe_member")).count()
        assert n_fp < 100, n_fp
        # probe plan: candidate side flows with zero exchanges (cut the plan
        # at the cached filter node — its stored lineage legitimately
        # contains the one filter-sized build shuffle)
        plan = probed._jdf.queryExecution().executedPlan().toString()
        top = plan.split("InMemoryRelation")[0]
        assert "BroadcastHashJoin" in top
        assert "Exchange hashpartitioning" not in top, top[:1500]
    finally:
        filt.unpersist()


def test_event_transitions_counts_and_rows(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        event_transitions,
    )

    rows = [
        # user 1: a -> b -> b -> c   (ties broken by event_id: 2 before 3)
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:01:00", "b"),
        (4, 1, "2024-01-01 00:02:00", "c"),
        # user 2: a -> c
        (5, 2, "2024-01-01 00:00:00", "a"),
        (6, 2, "2024-01-01 00:05:00", "c"),
        # user 3: single event -> no transition
        (7, 3, "2024-01-01 00:00:00", "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.src, r.dst): (r.n, r.prob)
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "b"): (1, 0.5),
        ("b", "c"): (1, 0.5),
    }


def test_ngram_span_duplicates_positional_counts(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.dedup import (
        ngram_span_duplicates,
    )

    df = spark.createDataFrame(
        [
            (0, "a b c a b c"),   # "a b c" occurs at 2 positions... n=3 spans: abc bca cab abc
            (1, "a b c x y z"),
            (2, "x y"),           # shorter than n -> contributes nothing
        ],
        "doc_id long, text string",
    )
    got = {
        r.span: (r.n_docs, r.n_occurrences)
        for r in ngram_span_duplicates(df, n=3, min_docs=2).collect()
    }
    # only "a b c" crosses documents (twice in doc 0, once in doc 1)
    assert got == {"a b c": (2, 3)}


def test_item_jaccard_cap_and_values(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.cooccurrence import (
        item_jaccard,
    )

    rows = [
        # baskets 1,2 share items x,y; basket 3 is a mega-basket
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "z"),
        (3, "x"), (3, "y"), (3, "z"), (3, "w"),
        # duplicate incidence row must not double-count
        (1, "x"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b): (r.shared, r.jaccard)
        for r in item_jaccard(df, max_basket_size=3).collect()
    }
    # basket 3 (size 4 > cap) is dropped entirely: degrees x=2,y=2,z=1
    assert got[("x", "y")] == (2, 1.0)
    assert got[("x", "z")] == (1, 0.5)
    assert got[("y", "z")] == (1, 0.5)
    assert ("w", "x") not in got and ("w", "y") not in got
    # uncapped: w appears, jaccard denominators grow
    full = {
        (r.item_a, r.item_b): (r.shared, r.jaccard)
        for r in item_jaccard(df, max_basket_size=None).collect()
    }
    assert full[("x", "y")] == (3, 1.0)
    assert full[("w", "x")] == (1, round(1 / 3, 6))


# ---------------------------------------------------------------------------
# packing: chunking / sequence packing / mixture rebalancing
# ---------------------------------------------------------------------------


def test_chunk_documents_cover_and_overlap(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.packing import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (2, "a b"),  # shorter than one chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = (r.chunk_text, r.n_tokens)
    # doc 2: one short chunk, intact
    assert by_doc[2] == {0: ("a b", 2)}
    # doc 1: stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert by_doc[1][0] == ("t0 t1 t2 t3", 4)
    assert by_doc[1][1] == ("t3 t4 t5 t6", 4)  # 1-token overlap
    assert by_doc[1][2] == ("t6 t7 t8 t9", 4)
    # every token covered: union of chunk tokens == original tokens
    seen = set()
    for text, _ in by_doc[1].values():
        seen.update(text.split(" "))
    assert seen == {f"t{i}" for i in range(10)}


def test_pack_sequences_invariants(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.packing import pack_sequences

    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget_tokens=20, n_buckets=4, seed=1)
    rows1 = {r.doc_id: (r.bucket, r.pack, r.pack_offset) for r in out.collect()}
    assert len(rows1) == 100
    for b, p, off in rows1.values():
        assert 0 <= b < 4 and p >= 0 and 0 <= off < 20
    # deterministic under repartitioning
    rows2 = {
        r.doc_id: (r.bucket, r.pack, r.pack_offset)
        for r in pack_sequences(
            df.repartition(13), budget_tokens=20, n_buckets=4, seed=1
        ).collect()
    }
    assert rows1 == rows2
    # within a bucket, consecutive docs' offsets advance by n_tokens mod budget
    per_bucket = {}
    for r in out.collect():
        per_bucket.setdefault(r.bucket, []).append(r)
    for rs in per_bucket.values():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.pack == cum // 20 and r.pack_offset == cum % 20
            cum += r.n_tokens


def test_mixture_rebalance_proportions(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.packing import mixture_rebalance

    rows = [(i, "a" if i < 600 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # a:b counts 600:400; targets 1:1 -> binding source b kept whole-ish,
    # a downsampled to ~400
    out = mixture_rebalance(df, {"a": 0.5, "b": 0.5}, seed=2)
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    assert counts["b"] > 350  # ppm hash keeps ~all of the binding source
    assert abs(counts["a"] - counts["b"]) < 80  # ~1:1 out of a 600:400 corpus
    # rerun-stable: identical selection
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in mixture_rebalance(df, {"a": 0.5, "b": 0.5}, seed=2).collect()
    )
    assert ids1 == ids2


def test_bm25_topk_hand_computed(spark):
    import math

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import bm25_topk

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score for r in bm25_topk(df, "apple banana", k=3).collect()}
    # N=3, avgdl=3; df(apple)=1, df(banana)=2
    k1, b = 1.2, 0.75

    def score(tf, dl, dfreq):
        idf = round(math.log((3 - dfreq + 0.5) / (dfreq + 0.5) + 1.0), 6)
        norm = round(k1 * (1 - b + b * dl / 3.0), 6)
        return round(idf * (tf * (k1 + 1)) / (tf + norm), 6)

    exp1 = round(score(2, 3, 1) + score(1, 3, 2), 6)
    exp2 = round(score(1, 2, 2), 6)
    assert out[1] == exp1 and out[2] == exp2
    assert 3 not in out  # no query term
    # doc 1 ranks first (has the rare term twice)
    assert out[1] > out[2]


def test_bm25_topk_hostile_query_terms(spark):
    """Query terms are joined by index, never embedded as SQL literals:
    quotes and backslashes must score byte-for-byte."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import bm25_topk

    rows = [(1, "o'brien x"), (2, r"dir\new y"), (3, "plain z"), (4, "foo\\ w")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for term, hit in [("o'brien", 1), (r"dir\new", 2), ("foo\\", 4)]:
        out = [r.doc_id for r in bm25_topk(df, term, k=4).collect()]
        assert out == [hit], (term, out)


def test_bm25_batch_matches_single(spark):
    """A batch of queries must score each query exactly as the
    single-query operator does (same math, one shared corpus pass)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        bm25_topk,
        bm25_topk_batch,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    queries = [(1, "spark join"), (2, "window agg")]
    batch = bm25_topk_batch(docs, queries, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(batch, key=lambda r: (r["query_id"], r["pos"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["pos"])
        )
    for qid, qtext in queries:
        single = [
            (r["doc_id"], r["score"], r["pos"])
            for r in sorted(
                bm25_topk(docs, qtext, k=5).collect(), key=lambda r: r["pos"]
            )
        ]
        assert by_q[qid] == single, qid
    # a batch whose term union exceeds the fused bound rides the two-pass
    # postings plan — results must be identical per query, and duplicate
    # query_id entries must NOT double-count shared terms
    import personalized_pagerank_algorithms_on_neo4j_spark.functions.text as T

    filler = [
        (100 + i, f"zz{i}a zz{i}b zz{i}c")
        for i in range(T._BM25_FUSED_TERMS_MAX // 3 + 2)
    ]
    big = filler + [(1, "spark"), (1, "spark join")]  # dup qid, shared term
    out = {
        (r["query_id"], r["doc_id"], r["score"], r["pos"])
        for r in bm25_topk_batch(docs, big, k=5).collect()
        if r["query_id"] == 1
    }
    want = {
        (1, r["doc_id"], r["score"], r["pos"])
        for r in bm25_topk(docs, "spark join", k=5).collect()
    }
    assert out == want
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_topk_batch(docs, [])

    # a SINGLE query longer than the fused bound (pasted paragraph) must
    # also ride the postings plan and produce the identical result set
    long_q = "spark join " + " ".join(f"zz{i}x" for i in range(T._BM25_FUSED_TERMS_MAX))
    long_out = sorted(
        (r["doc_id"], r["score"], r["pos"])
        for r in bm25_topk(docs, long_q, k=5).collect()
    )
    assert [c for c in bm25_topk(docs, long_q, k=5).columns] == [
        "doc_id", "score", "pos"
    ]
    # the zz* filler terms match no document, so scores equal the
    # fused-plan "spark join" scores exactly
    short_out = sorted(
        (r["doc_id"], r["score"], r["pos"])
        for r in bm25_topk(docs, "spark join", k=5).collect()
    )
    assert long_out == short_out and long_out


def test_unigram_logprob_hand_computed(spark):
    import math

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        unigram_logprob_scores,
    )

    rows = [(1, "a a b"), (2, "b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.logprob) for r in unigram_logprob_scores(df).collect()}
    # counts: a=2, b=2, c=1; T=5, V=3 -> p(a)=3/8, p(b)=3/8, p(c)=2/8
    lp = {t: round(math.log(p), 9) for t, p in {"a": 3 / 8, "b": 3 / 8, "c": 2 / 8}.items()}
    assert out[1] == (3, round((2 * lp["a"] + lp["b"]) / 3, 6))
    assert out[2] == (2, round((lp["b"] + lp["c"]) / 2, 6))
    # the doc with the rare term scores lower
    assert out[2][1] < out[1][1]


def test_bigram_logprob_hand_computed(spark):
    import math

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        bigram_logprob_scores,
    )

    rows = [(1, "a a b"), (2, "b c"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_bigrams, r.logprob)
        for r in bigram_logprob_scores(df).collect()
    }
    # bigrams: doc1 (a,a),(a,b); doc2 (b,c). V = 4 distinct tokens.
    # c(a,*)=2, c(b,*)=1; p(a|a)=(1+1)/(2+4), p(b|a)=(1+1)/(2+4),
    # p(c|b)=(1+1)/(1+4)
    lp_aa = round(math.log(2 / 6), 9)
    lp_ab = round(math.log(2 / 6), 9)
    lp_bc = round(math.log(2 / 5), 9)
    assert out[1] == (2, round((lp_aa + lp_ab) / 2, 6))
    assert out[2] == (1, round(lp_bc, 6))
    assert 3 not in out  # single-token doc: no bigram, no row


def test_two_hop_neighbors_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        two_hop_neighbors,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4), (1, 3), (3, 1)], "src long, dst long"
    )
    got = {r.node: r.n_two_hop for r in two_hop_neighbors(edges, hub_cap=None).collect()}
    # 1: via 2 -> {3,4}, 3 is direct, self excluded -> {4}; via 3 -> {1} self
    # 2: via 3 -> {1}; via 4 -> none
    # 3: via 1 -> {2,3}, self excluded -> {2}
    assert got == {1: 1, 2: 1, 3: 1}
    capped = {
        r.node: r.n_two_hop for r in two_hop_neighbors(edges, hub_cap=1).collect()
    }
    # only mid=3 (out-degree 1) survives the cap: 2 -> 3 -> 1
    assert capped == {2: 1}


def test_triangle_counts_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        triangle_counts,
    )

    # triangles {1,2,3} and {3,4,5}; direction, duplicates, and the
    # self-loop must all be ignored; 6 has no triangle -> no row
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (3, 3), (3, 4), (5, 4), (3, 5), (5, 6)],
        "src long, dst long",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_adamic_adar_hand_computed(spark):
    import math

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        adamic_adar,
    )

    # shared out-neighbors: 7 (from 1,2,3 -> in_deg 3), 8 (from 1,2 -> 2)
    edges = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7), (1, 8), (2, 8), (4, 9)], "src long, dst long"
    )
    rows = {
        (r.node_a, r.node_b): (r.n_common, r.score)
        for r in adamic_adar(edges, threshold=0.0, hub_cap=None).collect()
    }
    w3 = round(1e9 / math.log(3))
    w2 = round(1e9 / math.log(2))
    def half_up(nano):
        return ((nano + 500) // 1000) / 1e6
    assert rows == {
        (1, 2): (2, half_up(w3 + w2)),   # share 7 and 8
        (1, 3): (1, half_up(w3)),        # share 7 only
        (2, 3): (1, half_up(w3)),
    }
    # node 9 has in_deg 1: never a shared neighbor, no pair from it
    assert not any(4 in p for p in rows)
    # a hub cap below 3 drops neighbor 7 from pair generation
    capped = {
        (r.node_a, r.node_b)
        for r in adamic_adar(edges, threshold=0.0, hub_cap=2).collect()
    }
    assert capped == {(1, 2)}


def test_clustering_coefficient_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        clustering_coefficient,
    )

    # same fixture as the triangle test; undirected degrees:
    # 1:2, 2:2, 3:4, 4:2, 5:3, 6:1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (3, 3), (3, 4), (5, 4), (3, 5), (5, 6)],
        "src long, dst long",
    )
    got = {
        r.node: (r.deg, r.n_triangles, r.cc)
        for r in clustering_coefficient(edges).collect()
    }
    assert got == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (4, 2, round(2 * 2 / (4 * 3), 9)),
        4: (2, 1, 1.0),
        5: (3, 1, round(2 * 1 / (3 * 2), 9)),
        6: (1, 0, 0.0),  # deg < 2 -> cc defined 0, row still present
    }


def test_node_similarity_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        node_similarity,
    )

    # out-neighbors: 1 -> {7,8}, 2 -> {7,8}, 3 -> {8,9}
    edges = spark.createDataFrame(
        [(1, 7), (1, 8), (2, 7), (2, 8), (3, 8), (3, 9)], "src long, dst long"
    )
    rows = {
        (r.node_a, r.node_b): (r.n_common, r.jaccard)
        for r in node_similarity(edges, threshold=0.0, hub_cap=None).collect()
    }
    assert rows == {
        (1, 2): (2, 1.0),
        (1, 3): (1, round(1 / 3, 6)),
        (2, 3): (1, round(1 / 3, 6)),
    }
    # threshold filters the weak pairs; capping out shared neighbor 8
    # (in-degree 3) leaves only the pair sharing 7
    thr = node_similarity(edges, threshold=0.5, hub_cap=None).collect()
    assert {(r.node_a, r.node_b) for r in thr} == {(1, 2)}
    capped = node_similarity(edges, threshold=0.0, hub_cap=2).collect()
    assert {(r.node_a, r.node_b): r.n_common for r in capped} == {(1, 2): 1}


def test_hll_distinct_accuracy(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.sketches import (
        hll_distinct,
    )

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    exact = ev.select("user_id").distinct().count()
    got = hll_distinct(ev, "user_id").collect()[0]["approx_distinct"]
    # standard HLL error ~1.04/sqrt(4096) = 1.6%; allow 3 sigma
    assert abs(got - exact) / exact < 0.05, (got, exact)
    # grouped path: every group within tolerance of its exact count
    per = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct(ev, "user_id", group_cols=["event_type"]).collect()
    }
    exact_per = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(per) == set(exact_per)
    for k, e in exact_per.items():
        assert abs(per[k] - e) / e < 0.08, (k, per[k], e)
    # tiny cardinality rides the linear-counting branch almost exactly
    small = spark.createDataFrame([(i % 7,) for i in range(100)], "v long")
    got_small = hll_distinct(small, "v").collect()[0]["approx_distinct"]
    assert abs(got_small - 7) < 0.5, got_small


def test_range_join_semantics_and_plan(spark):
    import contextlib
    import io

    from personalized_pagerank_algorithms_on_neo4j_spark.operators.range_join import (
        range_join,
    )

    facts = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 9.99), (4, 10.0), (5, 25.0), (6, 100.0)],
        "id long, v double",
    )
    bands = spark.createDataFrame(
        [("neg", -10.0, 0.0), ("low", 0.0, 10.0), ("mid", 5.0, 30.0)],
        "band string, lo double, hi double",
    )
    out = {(r["id"], r["band"]) for r in range_join(facts, bands, "v").collect()}
    # hi is exclusive; overlapping bands both match; gaps drop rows
    assert out == {
        (1, "neg"),
        (2, "low"),
        (3, "low"),
        (3, "mid"),
        (4, "mid"),
        (5, "mid"),
    }
    # explicit width must give identical semantics
    out2 = {
        (r["id"], r["band"])
        for r in range_join(facts, bands, "v", bucket_width=3.0).collect()
    }
    assert out2 == out
    # the point of the operator: an equi-join plan, never a nested loop
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(facts, bands, "v").explain()
    assert "BroadcastNestedLoopJoin" not in buf.getvalue()


def test_dedup_survivorship_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "completely different text about something else entirely"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.dedup_survivorship(docs, n=3).collect()}
    # docs 1 and 2 are near-dups; the LONGER doc 2 survives
    assert set(out) >= {1, 2}
    assert out[1]["cluster_id"] == out[2]["cluster_id"]
    assert out[1]["survivor_id"] == 2 and out[2]["survivor_id"] == 2
    assert out[2]["keep"] and not out[1]["keep"]
    # exactly one survivor per cluster
    by_cluster: dict[int, int] = {}
    for r in out.values():
        by_cluster[r["cluster_id"]] = by_cluster.get(r["cluster_id"], 0) + int(
            r["keep"]
        )
    assert all(v == 1 for v in by_cluster.values())


def test_cms_heavy_hitters_guarantee(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.sketches import (
        cms_heavy_hitters,
    )

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    true_counts = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    thr = sorted(true_counts.values())[-10]  # a threshold the top 10 reach
    got = {
        r["user_id"]: r["est_count"]
        for r in cms_heavy_hitters(ev, "user_id", threshold=thr).collect()
    }
    # CMS estimates upper-bound true counts -> every true heavy hitter
    # is reported, and no estimate undercounts
    for u, n in true_counts.items():
        if n >= thr:
            assert u in got, (u, n, thr)
    for u, est in got.items():
        assert est >= true_counts[u]


def test_k_core_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        k_core,
    )

    # triangle {1,2,3} plus a tail 3-4-5: the 2-core is the triangle
    # (peeling 5 first drops 4's degree under 2 — a genuinely iterative case)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src long, dst long"
    )
    core2 = {r.node: r.core_degree for r in k_core(edges, k=2).collect()}
    assert core2 == {1: 2, 2: 2, 3: 2}
    # the whole graph is its own 1-core
    core1 = {r.node: r.core_degree for r in k_core(edges, k=1).collect()}
    assert core1 == {1: 2, 2: 2, 3: 3, 4: 2, 5: 1}
    # empty core when k exceeds every degree
    assert k_core(edges, k=4).count() == 0


def test_decayed_user_scores_half_life(spark):
    import datetime as dt

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        decayed_user_scores,
    )

    t0 = dt.datetime(2026, 1, 8)
    rows = [
        (1, t0, 1.0),
        (1, t0 - dt.timedelta(days=7), 1.0),  # exactly one half-life older
        (2, t0 - dt.timedelta(days=14), 2.0),  # two half-lives
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r.user_id: (r.n_events, r.score) for r in decayed_user_scores(df, 7.0).collect()}
    assert got[1] == (2, 1.5)
    assert got[2] == (1, 0.5)


def test_validate_expectations_counts(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.quality_checks import (
        expect,
        validate_expectations,
    )

    rows = [
        (1, "a", 5.0),
        (2, None, 50.0),   # null name
        (2, "c", -1.0),    # dup id, out-of-range value
        (3, "dd", 5.0),    # name fails ^.$ regex
    ]
    df = spark.createDataFrame(rows, "id long, name string, v double")
    got = {
        r.rule: (r.violations, r.total)
        for r in validate_expectations(
            df,
            [
                expect("not_null", "name"),
                expect("in_range", "v", 0.0, 10.0),
                expect("matches", "name", "^.$"),
                expect("in_set", "name", "a", "c"),
                expect("unique", "id"),
            ],
        ).collect()
    }
    assert got["not_null:name"] == (1, 4)
    assert got["in_range:v"] == (2, 4)       # 50.0 and -1.0
    assert got["matches:name"] == (2, 4)     # null and "dd"
    assert got["in_set:name"] == (2, 4)      # null and "dd"
    assert got["unique:id"] == (1, 4)        # one duplicate of id=2


def test_shard_manifest_partitions_whole_corpus(spark):
    """Shard assignment must be deterministic and total: every doc in
    exactly one shard, manifest totals equal corpus totals, shard ids
    within range — and stable under a different input partitioning."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sharding

    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    man = sharding.shard_manifest(d, n_shards=8, seed=3).collect()
    assert {r["shard"] for r in man} <= set(range(8))
    assert sum(r["n_docs"] for r in man) == d.count()
    total_tokens = d.select(
        F.sum(F.size(F.split(F.trim("text"), " +"))).alias("t")
    ).collect()[0]["t"]
    assert sum(r["n_tokens"] for r in man) == total_tokens
    # repartitioning must not move any doc to a different shard
    a = {
        r["doc_id"]: r["shard"]
        for r in sharding.shard_assign(d, 8, seed=3).collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in sharding.shard_assign(d.repartition(13), 8, seed=3).collect()
    }
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sharding.shard_assign(d, 0)


def test_curriculum_order_buckets_track_quality(spark):
    """bucket 0 = highest quality; bucket strictly tracks the quantized
    quality score; order_key is the seeded portable hash of the id."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import sharding

    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    rows = sharding.curriculum_order(d, n_buckets=5, seed=9).collect()
    assert len(rows) == d.count()
    for r in rows:
        expect_bucket = min(int((1.0 - r["quality"]) * 5), 4)
        assert r["bucket"] == expect_bucket, (r["doc_id"], r["quality"])
        assert 0 <= r["bucket"] <= 4
        assert r["order_key"] == _py_hash(str(r["doc_id"]), 9)
    # the schedule is a total preorder by quality: max quality in bucket b
    # >= max quality in bucket b+1
    by_bucket: dict[int, list[float]] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["quality"])
    buckets = sorted(by_bucket)
    for lo, hi in zip(buckets, buckets[1:]):
        assert min(by_bucket[lo]) >= max(by_bucket[hi])


def test_histogram_quantiles_inverted_cdf(spark):
    """Histogram quantiles must equal the type-1 (inverted-CDF) quantile of
    the bucket-rounded values, per group."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.sketches import (
        histogram_quantiles,
    )

    rows = [("a", v) for v in [1.011, 2.02, 2.02, 3.0, 10.5]] + [
        ("b", v) for v in [0.5, 0.75]
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {
        (r["g"], r["prob"]): r["value"]
        for r in histogram_quantiles(
            df, "value", [0.5, 0.9], group_col="g", resolution=100
        ).collect()
    }

    import math

    def type1(vals, p):
        vs = sorted(round(v * 100) / 100 for v in vals)
        return vs[math.ceil(p * len(vs)) - 1]

    assert got[("a", 0.5)] == type1([1.011, 2.02, 2.02, 3.0, 10.5], 0.5)
    assert got[("a", 0.9)] == type1([1.011, 2.02, 2.02, 3.0, 10.5], 0.9)
    assert got[("b", 0.5)] == 0.5 and got[("b", 0.9)] == 0.75
    # resolution quantization: 1.011 rounds to the 1.01 bucket
    low = {
        r["prob"]: r["value"]
        for r in histogram_quantiles(
            df.where(F.col("g") == "a"), "value", [0.1], resolution=100
        ).collect()
    }
    assert low[0.1] == 1.01


def test_similar_docs_retrieval(spark, docs_df):
    """Single-probe retrieval: exact dups score 1.0, the near-dup ranks
    above unrelated docs, the probe itself is excluded, and a probe with
    no shingles returns an empty frame."""
    rows = dedup.similar_docs(docs_df, probe_id=0, k=5).collect()
    got = {r["doc_id"]: r["jaccard"] for r in rows}
    assert 0 not in got
    assert got[1] == 1.0 and got[2] == 1.0  # exact/normalized dups
    assert got[3] < 1.0 and got[3] > 0.0    # near dup
    assert 5 not in got or got[5] < got[3]
    # ranked by (jaccard desc, id asc)
    ordered = [r["doc_id"] for r in rows]
    assert ordered[:2] == [1, 2]
    # unknown probe id -> no shingles -> empty result, correct schema
    empty = dedup.similar_docs(docs_df, probe_id=999, k=5)
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "n_common", "jaccard"]


def test_bigram_next_tokens_hand_computed(spark):
    import math

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        bigram_next_tokens,
    )

    rows = [(1, "a b"), (2, "a b"), (3, "a c"), (4, "d a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # after 'a': b twice, c once; tot=3, V=4
    got = [
        (r["term"], r["n"], r["prob"])
        for r in bigram_next_tokens(df, "A", k=5).collect()
    ]
    assert got == [
        ("b", 2, round(3 / 7, 9)),
        ("c", 1, round(2 / 7, 9)),
    ]
    assert math.isclose(sum(p for _, _, p in got), 5 / 7)


def test_parse_json_fields_semantics(spark):
    """Typed from_json extraction: valid rows land typed, malformed JSON
    and missing fields yield NULL (PERMISSIVE), other columns survive,
    and aggregates skip the nulls — the DuckDB twin's null algebra."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.jsoncol import (
        json_field_stats,
        parse_json_fields,
    )

    df = spark.createDataFrame(
        [
            (1, "a", '{"k": 10}'),
            (2, "a", '{"k": 32, "extra": "x"}'),
            (3, "b", "not json"),
            (4, "b", '{"other": 1}'),
            (5, None, None),
        ],
        "id long, grp string, props string",
    )
    p = {r["id"]: r["k"] for r in parse_json_fields(df, "props", {"k": "long"}).collect()}
    assert p == {1: 10, 2: 32, 3: None, 4: None, 5: None}
    stats = {
        r["grp"]: (r["n_events"], r["k_sum"], r["k_max"], r["k_distinct"])
        for r in json_field_stats(df, "props", "k", "grp").collect()
    }
    assert stats["a"] == (2, 42, 32, 2)
    assert stats["b"] == (2, None, None, 0)


def test_json_field_stats_oracle_survives_malformed_rows():
    """The DuckDB twin must DEGRADE malformed JSON to NULL (json_valid
    guard), not raise 'Malformed JSON' — the same null algebra as Spark's
    PERMISSIVE from_json. Runs the oracle itself on a table containing a
    malformed row and checks the aggregate parity by hand."""
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.jsoncol import (
        json_field_stats_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        """CREATE TABLE ev(grp VARCHAR, props VARCHAR);
           INSERT INTO ev VALUES
             ('a', '{"k": 10}'),
             ('a', '{"k": 32}'),
             ('b', 'not json'),
             ('b', '{"other": 1}'),
             ('b', NULL)"""
    )
    sql = json_field_stats_oracle_sql("SELECT * FROM ev", "props", "k", "grp")
    rows = {
        r[0]: r[1:] for r in con.execute(sql).fetchall()
    }
    assert rows["a"] == (2, 42, 32, 2)
    assert rows["b"] == (3, None, None, 0)


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------


def test_winnow_match_guarantee_and_density(spark):
    # Two docs sharing a run of w+k-1 = 7 tokens MUST share a fingerprint
    # (the winnowing guarantee); unrelated docs with disjoint vocab share none.
    shared = "alpha bravo charlie delta echo foxtrot golf"
    df = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} seven eight nine ten eleven twelve"),
            (3, "k l m n o p q r s t u v w x y z aa bb cc dd"),
        ],
        schema="doc_id long, text string",
    )
    fps = text.winnow_fingerprints(df, k=4, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "docs sharing a 7-token run share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: winnowing selects at most one fingerprint per window start,
    # far fewer than the number of grams (expected ~2/(w+1))
    n_grams_3 = 20 - 4 + 1
    assert 1 <= len(by_doc[3]) < n_grams_3


def test_winnow_short_docs_degenerate_windows(spark):
    # < k tokens: whole token string is the single gram -> one fingerprint
    # at pos 0.  >= k tokens but < w grams: global min over the clipped
    # window, still exactly one selection (deduplicated).
    df = spark.createDataFrame(
        [(1, "just two"), (2, "five little tokens right here")],
        schema="doc_id long, text string",
    )
    rows = text.winnow_fingerprints(df, k=4, w=4).collect()
    got = {r["doc_id"]: (r["fp_pos"], r["fp_hash"]) for r in rows}
    assert len(rows) == 2 and set(got) == {1, 2}
    assert got[1][0] == 0
    # doc 2 has 2 grams; the selected one is the min of the two packed keys
    assert got[2][0] in (0, 1)


def test_winnow_rightmost_min_tiebreak(spark):
    # A doc that repeats the same k-gram everywhere: every window's minimum
    # hash ties, so the tie-break must pick the RIGHTMOST position in each
    # window — selections advance with the window, one per start, and all
    # share the single gram hash.
    df = spark.createDataFrame(
        [(1, " ".join(["rep"] * 12))], schema="doc_id long, text string"
    )
    rows = text.winnow_fingerprints(df, k=4, w=4).collect()
    hashes = {r["fp_hash"] for r in rows}
    assert len(hashes) == 1
    # window starts 0..5 select positions start+w-1 = 3..8 (rightmost of
    # each tied window)
    assert sorted(r["fp_pos"] for r in rows) == [3, 4, 5, 6, 7, 8]


def test_winnow_pos_cap_never_binds_at_gate_scale(spark):
    # The 2^20-grams-per-doc packing cap must stay far from binding on the
    # ORACLE-COMPARE corpus (sf0.01 — the scale the cap-free DuckDB twin
    # actually runs at; mirrors the minhash bucket-cap guard pattern).
    from .conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    max_toks = docs.select(
        F.max(F.size(text.tokens(F.lower(F.col("text"))))).alias("m")
    ).collect()[0]["m"]
    assert max_toks < (1 << text.WINNOW_POS_BITS) // 64


# ---------------------------------------------------------------------------
# Fuzzy record linkage (name variants)
# ---------------------------------------------------------------------------


def test_name_variant_pairs_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import linkage

    df = spark.createDataFrame(
        [
            (1, "Acme Corp"),
            (2, "acme corp"),      # case/trim variant of 1 -> dist 0
            (3, "Acme Corp."),     # punctuation variant -> dist 1
            (4, "Acme Holdings"),  # same block, too far (dist > 3)
            (5, "Apex Corp"),      # different first token: never a candidate
        ],
        schema="id long, name string",
    )
    rows = linkage.name_variant_pairs(df, "name", max_dist=3).collect()
    got = {(r["name_a"], r["name_b"]): (r["dist"], r["n_a"], r["n_b"]) for r in rows}
    # "acme corp" has count 2 (rows 1+2 fold in the distinct aggregate)
    assert got == {("acme corp", "acme corp."): (1, 2, 1)}


def test_name_variant_hot_block_cap_drops_block(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import linkage

    df = spark.createDataFrame(
        [(i, f"hot name{i}") for i in range(10)] + [(99, "cold x"), (98, "cold y")],
        schema="id long, name string",
    )
    uncapped = linkage.name_variant_pairs(df, "name", max_dist=3, block_cap=None)
    capped = linkage.name_variant_pairs(df, "name", max_dist=3, block_cap=5)
    # the 'hot' block (10 distinct names) is dropped; 'cold' block survives
    assert uncapped.where(F.col("name_a").startswith("hot")).count() > 0
    crows = capped.collect()
    assert all(r["name_a"].startswith("cold") for r in crows)
    assert len(crows) == 1  # cold x / cold y at dist 1


def test_name_variant_block_cap_never_binds_at_gate_scale(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import linkage
    from .conftest import SF_ORACLE

    part = spark.read.parquet(f"{SF_ORACLE}/part.parquet")
    max_block = (
        part.select(F.split(F.lower(F.trim(F.col("p_name"))), " +").getItem(0).alias("tok"),
                    F.lower(F.trim(F.col("p_name"))).alias("nm"))
        .distinct()
        .groupBy("tok")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_block < linkage.NAME_BLOCK_CAP // 64


# ---------------------------------------------------------------------------
# Token-budgeted mixture selection
# ---------------------------------------------------------------------------


def test_token_budget_mix_greedy_prefix_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import packing

    # equal quality ("x y z" repeated patterns would differ) -> craft texts
    # with controlled lengths; same quality within a source falls back to
    # doc_id order.
    df = spark.createDataFrame(
        [
            (1, "s", "a b c d e f"),          # 6 tokens
            (2, "s", "a b c d e f"),          # 6 tokens, same quality
            (3, "s", "a b c d e f"),          # 6 tokens, same quality
        ],
        schema="doc_id long, source string, text string",
    )
    kept = packing.token_budget_mix(df, budget=13).collect()
    got = sorted((r["doc_id"], r["cum_tokens"]) for r in kept)
    # prefix by doc_id: cum 6, 12, 18 -> doc 3 overflows the 13 budget
    assert got == [(1, 6), (2, 12)]


def test_token_budget_mix_equals_naive_window(spark):
    from pyspark.sql import Window as W

    from personalized_pagerank_algorithms_on_neo4j_spark.functions import packing
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        quality_score_raw,
        tokens,
    )
    from .conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    banded = packing.token_budget_mix(docs, budget=800)
    c = F.col("text")
    naive = (
        docs.select(
            "doc_id",
            "source",
            quality_score_raw(c).alias("_q"),
            F.size(tokens(c)).cast("long").alias("n_tok"),
        )
        .withColumn(
            "cum_tokens",
            F.sum("n_tok").over(
                W.partitionBy("source")
                .orderBy(F.desc("_q"), F.asc("doc_id"))
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .where(F.col("cum_tokens") <= 800)
        .select(
            "doc_id",
            "source",
            F.round("_q", 6).alias("quality"),
            "n_tok",
            "cum_tokens",
        )
    )
    b = sorted(tuple(r) for r in banded.collect())
    n = sorted(tuple(r) for r in naive.select(*banded.columns).collect())
    assert b == n and len(b) > 0


def test_source_shingle_overlap_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "sA", "a b c d"),     # shingles: "a b c", "b c d"
            (2, "sB", "a b c x"),     # shingles: "a b c", "b c x"
            (3, "sC", "q r s t"),     # disjoint from sA/sB
        ],
        schema="doc_id long, source string, text string",
    )
    rows = dedup.source_shingle_overlap(df, n=3).collect()
    got = {(r["source_a"], r["source_b"]): (r["inter"], r["union_n"]) for r in rows}
    # sA ∩ sB = {"a b c"}: inter 1, union 2+2-1=3; sC pairs are absent
    assert got == {("sA", "sB"): (1, 3)}


def test_snapshot_diff_statuses_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.quality_checks import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y")],
        schema="id long, v string, w string",
    )
    new = spark.createDataFrame(
        [(2, "b", "x"), (3, "CHANGED", "y"), (4, "d", None)],
        schema="id long, v string, w string",
    )
    rows = snapshot_diff(old, new, "id").collect()
    got = {r["id"]: r["status"] for r in rows}
    # 1 removed, 2 unchanged (omitted), 3 changed, 4 added; null-sentinel
    # digests must not equate NULL with the empty string or collide rows
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_null_vs_empty_not_equal(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.quality_checks import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, None)], schema="id long, v string")
    new = spark.createDataFrame([(1, "")], schema="id long, v string")
    rows = snapshot_diff(old, new, "id").collect()
    assert [(r["id"], r["status"]) for r in rows] == [(1, "changed")]


def test_split_leakage_flags_only_boundary_pairs(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.dedup import (
        split_leakage,
    )

    near = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            (1, near),                   # near-dup of 2 (one token changed)
            (2, near + " nine"),
            (3, near),                   # near-dup of 1/2, same split as 1
            (4, "totally different words here with nothing shared at all"),
        ],
        schema="doc_id long, text string",
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "test")],
        schema="doc_id long, split string",
    )
    rows = split_leakage(df, splits, threshold=0.5, n=3).collect()
    got = {(r["doc_a"], r["doc_b"]): (r["split_a"], r["split_b"]) for r in rows}
    # (1,2) and (2,3) cross; (1,3) is within-train and must NOT appear
    assert set(got) == {(1, 2), (2, 3)}
    assert got[(1, 2)] == ("train", "test")


def test_snapshot_diff_digest_not_injectable(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.quality_checks import (
        snapshot_diff,
    )

    # byte-shifting across the column boundary must NOT hash equal:
    # ('a|', 'b') vs ('a', '|b') concat identically without length prefixes
    old = spark.createDataFrame([(1, "a|", "b")], schema="id long, v string, w string")
    new = spark.createDataFrame([(1, "a", "|b")], schema="id long, v string, w string")
    rows = snapshot_diff(old, new, "id").collect()
    assert [(r["id"], r["status"]) for r in rows] == [(1, "changed")]


def test_winnow_dup_pairs_matches_and_caps(spark):
    shared = " ".join(f"s{i}" for i in range(12))  # 12-token shared run
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail one"),
            (2, f"{shared} other ending entirely"),
            (3, "unrelated vocabulary nothing matching anything else at all"),
        ],
        schema="doc_id long, text string",
    )
    rows = text.winnow_dup_pairs(df, min_shared=2, k=4, w=4).collect()
    got = {(r["doc_a"], r["doc_b"]): r["shared"] for r in rows}
    # 12 shared tokens >> w+k-1 = 7 -> multiple shared fingerprints for (1,2)
    assert set(got) == {(1, 2)} and got[(1, 2)] >= 2
    # the DF cap drops ubiquitous fingerprints: with cap 1 every fingerprint
    # shared by 2+ docs is excluded -> no pairs survive
    assert text.winnow_dup_pairs(df, min_shared=1, k=4, w=4, max_fp_df=1).count() == 0


def test_winnow_fp_df_cap_never_binds_at_gate_scale(spark):
    # at SF_ORACLE, the scale the cap-free DuckDB twin compares at
    from .conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    max_df = (
        text.winnow_fingerprints(docs, k=4, w=4)
        .select("doc_id", "fp_hash")
        .distinct()
        .groupBy("fp_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_df < 1000 // 64


def test_betweenness_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.graph import PropertyGraph
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.betweenness import (
        betweenness_landmarks,
    )

    # diamond: 1 -> {2,4} -> 3. From landmark 1 there are TWO shortest
    # 1->3 paths, so delta(2) = delta(4) = sigma/sigma3 * (1+0) = 1/2;
    # node 3 is a leaf (bc 0); landmarks 2 and 4 contribute nothing
    # (their only successor 3 is a leaf of their trees).
    nodes = spark.createDataFrame(
        [(i, f"n{i}") for i in (1, 2, 3, 4)], "id long, name string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (1, 4), (2, 3), (4, 3)], "src long, dst long"
    )
    g = PropertyGraph(spark, nodes, edges, nodes_cover_edges=True)
    got = {r["node"]: r["bc_micros"] for r in
           betweenness_landmarks(g, n_landmarks=3, max_hops=4).collect()}
    # delta in integer micro-units: 0.5 -> 500000
    assert got == {2: 500000, 4: 500000, 3: 0}

    # empty-edge graph: graceful empty result, not a crash
    g0 = PropertyGraph(
        spark, nodes,
        spark.createDataFrame([], "src long, dst long"),
        nodes_cover_edges=True,
    )
    assert betweenness_landmarks(g0, n_landmarks=2, max_hops=2).count() == 0


def test_betweenness_sigma_bound_at_gate_scale(spark):
    # sigma (shortest-path counts) must stay orders of magnitude under the
    # 2^63 overflow bound at gate scale (Spark wraps silently past it,
    # DuckDB raises — the cross-engine divergence the docstring documents).
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.sources.tpch_graph import (
        GRAPH_EDGES_SQL,
    )
    from .conftest import SF_ORACLE

    con = duckdb.connect()
    for t in ("customer", "supplier", "orders", "lineitem", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    # enumerate every path (UNION ALL keeps multiplicity); sigma at a node
    # = COUNT of distinct paths arriving at its minimal dist
    mx = con.execute(f"""
WITH RECURSIVE e AS MATERIALIZED ({GRAPH_EDGES_SQL}),
lm AS (SELECT src AS source FROM
       (SELECT src, COUNT(*) od FROM e GROUP BY src)
       ORDER BY od DESC, src ASC LIMIT 8),
walk(source, node, dist) AS (
  SELECT source, source, 0 FROM lm
  UNION ALL
  SELECT w.source, e.dst, w.dist + 1
  FROM walk w JOIN e ON e.src = w.node WHERE w.dist < 6
),
paths AS (SELECT source, node, dist, COUNT(*) AS n_paths
          FROM walk GROUP BY 1, 2, 3),
md AS (SELECT source, node, MIN(dist) AS dist FROM walk GROUP BY 1, 2)
SELECT MAX(p.n_paths) FROM paths p
JOIN md USING (source, node) WHERE p.dist = md.dist""").fetchone()[0]
    assert 1 < mx < 2**40  # non-vacuous: real multiplicity exists


def test_pmi_collocations_hand_computed(spark):
    # corpus: "a b" x4, "a c" x2 -> bigrams: (a,b):4, (a,c):2
    # marginals: c1(a)=6; c2(b)=4, c2(c)=2; N=6
    # pmi(a,b) = ln(4*6/(6*4)) = 0; pmi(a,c) = ln(2*6/(6*2)) = 0
    # make it non-trivial with a second left word: "d b" x2
    # counts: (a,b):4 (a,c):2 (d,b):2; c1: a=6 d=2; c2: b=6 c=2; N=8
    import math

    docs = spark.createDataFrame(
        [(i, "a b") for i in range(4)]
        + [(10 + i, "a c") for i in range(2)]
        + [(20 + i, "d b") for i in range(2)],
        schema="doc_id long, text string",
    )
    rows = text.pmi_collocations(docs, min_count=2).collect()
    got = {(r["w1"], r["w2"]): (r["c12"], r["pmi"]) for r in rows}
    exp = {
        ("a", "b"): (4, round(math.log(4 * 8 / (6 * 6)), 6)),
        ("a", "c"): (2, round(math.log(2 * 8 / (6 * 2)), 6)),
        ("d", "b"): (2, round(math.log(2 * 8 / (2 * 6)), 6)),
    }
    assert got == exp


def test_source_divergence_hand_computed(spark):
    import math

    # sA: tokens a,a,b (p: a=2/3, b=1/3); sB: b,b,c (p: b=2/3, c=1/3)
    # corpus: a=2, b=3, c=1, N=6 (q: a=1/3, b=1/2, c=1/6)
    docs = spark.createDataFrame(
        [(1, "sA", "a a b"), (2, "sB", "b b c")],
        schema="doc_id long, source string, text string",
    )
    rows = text.source_divergence(docs).collect()
    got = {r["source"]: (r["n_tokens"], r["kl_nanos"]) for r in rows}

    def nanos(terms):
        # per-term nano-rounding BEFORE the sum, replicating the operator's
        # left-associated 1e9 * c / ns * ln(...) expression exactly
        return sum(round(1e9 * c / ns * math.log(c * n / (ns * cw)))
                   for c, ns, cw, n in terms)

    kl_a = nanos([(2, 3, 2, 6), (1, 3, 3, 6)])
    kl_b = nanos([(2, 3, 3, 6), (1, 3, 1, 6)])
    assert got == {"sA": (3, kl_a), "sB": (3, kl_b)}
    assert all(kl >= 0 for _, kl in got.values())


def test_dsir_weights_match_python_replay(spark):
    """DSIR nano-weights == a pure-Python replay of the hashed-bigram
    bucket model (same md5 bucket hash, same add-1 smoothing, same
    per-bucket nano-rounding), target docs score above dissimilar raw
    docs, and token-less docs get no row."""
    rows = [
        ("a", "good clean prose here", "tgt"),
        ("b", "good clean prose here too", "raw"),
        ("c", "entirely different junk words", "raw"),
        ("d", "   ", "raw"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = {
        r["doc_id"]: (r["n_grams"], r["dsir_nanos"])
        for r in text.dsir_importance_weights(
            docs, F.col("source") == "tgt", n_buckets=64, seed=3
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}  # "d" has no grams

    def grams(s):
        toks = [t for t in s.lower().split() if t]
        return toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(f"{g}#3".encode()).hexdigest()[:12], 16) % 64

    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    per_doc: dict[str, list[int]] = {}
    for doc_id, txt, src in rows:
        bs = [bucket(g) for g in grams(txt)]
        per_doc[doc_id] = bs
        for b in bs:
            (ct if src == "tgt" else cr)[b] = (ct if src == "tgt" else cr).get(b, 0) + 1
    t_tot = float(sum(ct.values()))
    r_tot = float(sum(cr.values()))
    wb = {
        b: round(
            1e9
            * math.log(
                ((ct.get(b, 0) + 1) / (t_tot + 64))
                / ((cr.get(b, 0) + 1) / (r_tot + 64))
            )
        )
        for b in set(ct) | set(cr)
    }
    for doc_id, bs in per_doc.items():
        if not bs:
            continue
        n_grams, nanos = out[doc_id]
        assert n_grams == len(bs)
        # +-1 nano per bucket term tolerates libm ulp + rounding-mode
        # differences between the JVM and CPython; the binding cross-engine
        # parity gate is the DuckDB oracle in test_entry
        assert abs(nanos - sum(wb[b] for b in bs)) <= len(bs)
    # a doc sharing the target's vocabulary outranks a dissimilar one
    assert out["b"][1] > out["c"][1]


def test_doc_token_entropy_hand_computed(spark):
    """Uniform doc -> ln(N); single-token doc -> 0; skewed doc matches the
    per-term nano replay; token-less docs get no row."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # uniform over 4 -> H = ln(4)
            (2, "a a a a"),        # degenerate -> H = 0
            (3, "a a b"),          # H = (2/3)ln(3/2) + (1/3)ln(3)
            (4, "   "),            # no tokens -> no row
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_nanos"])
        for r in text.doc_token_entropy(docs).collect()
    }
    assert set(got) == {1, 2, 3}

    def nanos(terms, n):
        return sum(round(1e9 * c / n * math.log(n / c)) for c in terms)

    assert got[1] == (4, 4, nanos([1, 1, 1, 1], 4))
    assert got[2] == (4, 1, 0)
    assert got[3] == (3, 2, nanos([2, 1], 3))
    # uniform maximizes entropy for its length
    assert got[1][2] > got[3][2] > got[2][2]


def test_ann_recall_invariants_and_perfect_degenerate(spark):
    """0 <= n_hit <= n_exact with recall = n_hit/n_exact on the real
    embeddings fixture; a corpus whose every vector equals the query is a
    single LSH bucket, so recall is exactly 1."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.simsearch import (
        ann_recall,
    )
    from personalized_pagerank_algorithms_on_neo4j_spark.sources.tables import (
        load_table,
    )

    from .conftest import SF_SMALL

    e = load_table(spark, SF_SMALL, "embeddings")
    rows = ann_recall(e, query_ids=[0, 1, 2], k=5).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_exact"]
        assert r["recall"] == round(r["n_hit"] / r["n_exact"], 6)

    same = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(12)], "vec_id long, embedding array<double>"
    )
    perfect = ann_recall(same, query_ids=[0], k=5).collect()
    assert perfect[0]["recall"] == 1.0
    assert perfect[0]["n_hit"] == perfect[0]["n_exact"] == 12  # all tie


def test_span_corruption_structure_and_parity(spark):
    """Sentinels are incremental and consistent between input and target,
    the reconstruction is lossless (unmasked tokens + target spans rebuild
    the doc), the mask rate sits in the designed band on a long doc, and
    the DuckDB twin emits byte-identical strings."""
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.packing import (
        span_corruption_oracle_sql,
        span_corruption_targets,
    )

    long_doc = " ".join(f"w{i}" for i in range(400))
    rows = [("long", long_doc), ("tiny", "one two three"), ("empty", " ")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in span_corruption_targets(df).collect()}
    assert set(out) == {"long", "tiny"}  # token-less docs get no row

    r = out["long"]
    assert r["n_spans"] >= 1
    # designed rate: 40% of blocks mask an E[L]=3 span in a block of 8
    assert 0.05 <= r["n_masked"] / 400 <= 0.30
    # sentinels increment 0..n_spans-1 and appear in BOTH strings
    for k in range(r["n_spans"]):
        assert f"<extra_id_{k}>" in r["input_text"]
        assert f"<extra_id_{k}>" in r["target_text"]
    assert f"<extra_id_{r['n_spans']}>" not in r["input_text"]
    # lossless: substituting each target span back at its sentinel
    # rebuilds the original token sequence
    rebuilt = r["input_text"]
    parts = rebuilt.split()
    tgt = r["target_text"].split()
    spans: dict[str, list[str]] = {}
    cur = None
    for t in tgt:
        if t.startswith("<extra_id_"):
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    merged: list[str] = []
    for t in parts:
        merged.extend(spans[t] if t in spans else [t])
    assert merged == long_doc.split()

    vals = ",".join("('%s','%s')" % p for p in rows)
    want = {
        r[0]: tuple(r)
        for r in duckdb.sql(
            span_corruption_oracle_sql(
                f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text)"
            )
        ).fetchall()
    }
    for doc_id, row in out.items():
        assert tuple(row) == (
            want[doc_id][0],
            int(want[doc_id][1]),
            int(want[doc_id][2]),
            want[doc_id][3],
            want[doc_id][4],
        )


def test_link_negatives_are_nonedges_and_deterministic(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import graphstats

    nodes = spark.createDataFrame([(i, f"n{i}") for i in range(10)],
                                  "id long, name string")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "src long, dst long"
    )
    out = graphstats.link_negatives(edges, nodes, k=2, seed=7)
    rows = {(r["src"], r["neg"], r["i"]) for r in out.collect()}
    edge_set = {(0, 1), (0, 2), (1, 2), (2, 3)}
    for s, neg, i in rows:
        assert (s, neg) not in edge_set and neg != s and 0 <= neg <= 9
        assert i in (0, 1)
    # at most k per source, and re-running yields the identical sample
    from collections import Counter
    per_src = Counter(s for s, _, _ in rows)
    assert all(c <= 2 for c in per_src.values()) and per_src
    rows2 = {(r["src"], r["neg"], r["i"]) for r in
             graphstats.link_negatives(edges, nodes, k=2, seed=7).collect()}
    assert rows == rows2


def test_link_negatives_distinct_and_seed_sensitive(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import graphstats

    nodes = spark.createDataFrame([(i, f"n{i}") for i in range(10)],
                                  "id long, name string")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "src long, dst long"
    )
    out = graphstats.link_negatives(edges, nodes, k=3, seed=7).collect()
    # no duplicate (src, neg) pairs even when draws collide in a bucket
    pairs = [(r["src"], r["neg"]) for r in out]
    assert len(pairs) == len(set(pairs))
    # different seeds vary the sample even on a single-bucket graph
    # (n_buckets = max(1, 10//8) = 1: only the argmin key can differ)
    s7 = {(r["src"], r["neg"]) for r in out}
    s8 = {(r["src"], r["neg"]) for r in
          graphstats.link_negatives(edges, nodes, k=3, seed=8).collect()}
    assert s7 != s8


def test_cross_corpus_winnow_matches_hand_computed(spark):
    shared = " ".join(f"c{i}" for i in range(9))  # 9-token shared run
    new = spark.createDataFrame(
        [(1, f"{shared} fresh suffix here"), (2, "nothing like the others")],
        schema="doc_id long, text string",
    )
    old = spark.createDataFrame(
        [(10, f"old prefix {shared} trailing"), (11, "also unrelated words")],
        schema="doc_id long, text string",
    )
    rows = text.cross_corpus_winnow_matches(new, old, min_shared=1).collect()
    got = {(r["new_id"], r["old_id"]): r["shared"] for r in rows}
    # 9 shared tokens >= w+k-1 = 7 -> (1, 10) must match; doc 2 matches none
    assert set(got) == {(1, 10)} and got[(1, 10)] >= 1


def test_cross_corpus_winnow_cap_binds(spark):
    # with cap 1, a fingerprint present in 2+ HISTORICAL docs is excluded
    # -> the new doc matching only through that boilerplate finds nothing
    shared = " ".join(f"z{i}" for i in range(9))
    new = spark.createDataFrame(
        [(1, f"{shared} new tail")], schema="doc_id long, text string"
    )
    old = spark.createDataFrame(
        [(10, f"{shared} old one"), (11, f"{shared} old two")],
        schema="doc_id long, text string",
    )
    uncapped = text.cross_corpus_winnow_matches(new, old, min_shared=1)
    capped = text.cross_corpus_winnow_matches(
        new, old, min_shared=1, max_fp_df=1
    )
    assert uncapped.count() > 0
    # every shared fingerprint lives in both historical docs -> all capped
    assert capped.count() == 0


def test_event_paths_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        event_paths,
    )

    # user 1: a b c a b c  -> trigrams: abc, bca, cab, abc
    # user 2: a b c        -> abc
    rows = []
    for i, e in enumerate("abcabc"):
        rows.append((i, 1, e, i))
    for i, e in enumerate("abc"):
        rows.append((10 + i, 2, e, 10 + i))
    ev = spark.createDataFrame(
        rows, schema="event_id long, user_id long, event_type string, ts long"
    )
    got = {
        (r["step_1"], r["step_2"], r["step_3"]): r["n"]
        for r in event_paths(ev, length=3, min_count=1).collect()
    }
    assert got == {("a", "b", "c"): 3, ("b", "c", "a"): 1, ("c", "a", "b"): 1}
    # min_count filters to supported paths only; paths never cross users
    assert {
        tuple(r[:3])
        for r in event_paths(ev, length=3, min_count=3).collect()
    } == {("a", "b", "c")}


def test_decayed_bipartite_edges_hand_computed(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        decayed_bipartite_edges,
    )

    # anchor = max ts = 86400s; ages: 0 days -> 1e6 micro-units,
    # exactly one half-life -> 5e5
    ev = spark.createDataFrame(
        [
            (1, 1, "x", 86400),
            (2, 1, "x", 0),
            (3, 2, "y", 0),
        ],
        schema="event_id long, user_id long, event_type string, ts long",
    )
    base = 1000
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in decayed_bipartite_edges(
            ev, half_life_days=1.0, type_base=base
        ).collect()
    }
    x, y = base + 1, base + 2  # name-ordered type ids
    assert got == {
        (1, x): 1_500_000,
        (x, 1): 1_500_000,
        (2, y): 500_000,
        (y, 2): 500_000,
    }


def test_url_policy_longest_match_and_default_allow(spark):
    """Robots semantics: a specific re-allow overrides a broader deny
    (longest prefix wins), unknown hosts and unmatched paths default to
    allowed, and rules match the CANONICAL form (raw urls with WWW/port/
    tracking junk still hit their rule)."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.urlnorm import (
        url_policy_decisions,
    )

    rules = [
        ("https://a.com/p/", False),
        ("https://a.com/p/1", True),
    ]
    urls = spark.createDataFrame(
        [
            ("https://a.com/p/7",),                      # denied by /p/
            ("https://a.com/p/12",),                     # re-allowed by /p/1
            ("https://a.com/other",),                    # no match -> allow
            ("https://b.com/p/7",),                      # unknown host -> allow
            ("HTTPS://WWW.A.com:443/p//7?utm_source=x",),  # canon -> denied
        ],
        "url string",
    )
    got = {
        r["url"]: (r["allowed"], r["matched_prefix"])
        for r in url_policy_decisions(urls, rules).collect()
    }
    assert got["https://a.com/p/7"] == (False, "https://a.com/p/")
    assert got["https://a.com/p/12"] == (True, "https://a.com/p/1")
    assert got["https://a.com/other"] == (True, None)
    assert got["https://b.com/p/7"] == (True, None)
    assert got["HTTPS://WWW.A.com:443/p//7?utm_source=x"] == (
        False,
        "https://a.com/p/",
    )
    # duplicate prefixes with conflicting flags: allow wins (struct-max
    # order length, allow, prefix — the oracle's ORDER BY mirrors it)
    dup = url_policy_decisions(
        spark.createDataFrame([("https://a.com/p/7",)], "url string"),
        [("https://a.com/p/", False), ("https://a.com/p/", True)],
    ).collect()
    assert dup[0]["allowed"] is True


def test_url_canonicalization_rules_and_duckdb_parity(spark):
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.functions import (
        urlnorm as U,
    )

    urls = [
        # case + www + default port + slash runs + tracking + order + frag
        "HTTPS://WWW.Site.COM:443/p//1/?utm_source=x&b=2&a=1#frag",
        "https://site.com/p/1?a=1&b=2",          # its canonical fixpoint
        "http://example.co.uk:80/",              # default http port
        "http://example.co.uk",                  # empty path -> '/'
        "HTTP://User.Example.ORG:8080//x///y/?fbclid=1",  # kept port
        "https://sub.shop.com.au/path/?z=1&y=2&ref=aff",  # multi-part suffix
        "not a url",                             # unparseable -> NULL
        "https://host.com/?utm_source=a&utm_medium=b",    # all-tracking query
        "https://a.b.c.co.jp/x?m=1&m=0",         # duplicate param names sort
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        "url",
        U.canonical_url(F.col("url")).alias("canon"),
        U.registered_domain(U.host_of(F.col("url"))).alias("domain"),
    ).collect()
    by_url = {r["url"]: r for r in got}
    assert by_url[urls[0]]["canon"] == "https://site.com/p/1?a=1&b=2"
    assert by_url[urls[1]]["canon"] == "https://site.com/p/1?a=1&b=2"
    assert by_url[urls[2]]["canon"] == "http://example.co.uk/"
    assert by_url[urls[3]]["canon"] == "http://example.co.uk/"
    assert by_url[urls[4]]["canon"] == "http://user.example.org:8080/x/y"
    assert by_url[urls[5]]["domain"] == "shop.com.au"
    assert by_url["not a url"]["canon"] is None
    assert by_url[urls[7]]["canon"] == "https://host.com/"
    assert by_url[urls[8]]["canon"] == "https://a.b.c.co.jp/x?m=0&m=1"
    assert by_url[urls[8]]["domain"] == "c.co.jp"
    # the DuckDB twins must agree byte-for-byte on every case
    con = duckdb.connect()
    csql = U.canonical_url_sql("url")
    dsql = U.registered_domain_sql(U.host_of_sql("url"))
    for r in got:
        o = con.execute(
            f"SELECT {csql} AS c, {dsql} AS d FROM (SELECT ? AS url)",
            [r["url"]],
        ).fetchone()
        assert r["canon"] == o[0], (r["url"], r["canon"], o[0])
        assert r["domain"] == o[1], (r["url"], r["domain"], o[1])


def test_decayed_bipartite_edges_null_type_cross_engine(spark):
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        decayed_bipartite_edges,
        decayed_bipartite_edges_sql,
    )

    # a NULL event_type must neither contribute an edge nor SHIFT the
    # type-id ranking (Spark sorts NULLS FIRST, DuckDB's ROW_NUMBER
    # defaults NULLS LAST — both sides now drop NULLs before ranking)
    rows = [
        (1, 1, "x", 86400),
        (2, 1, None, 86400),
        (3, 2, "y", 0),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id long, user_id long, event_type string, ts long"
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in decayed_bipartite_edges(
            ev, half_life_days=1.0, type_base=1000
        ).collect()
    }
    assert got == {
        (1, 1001): 1_000_000,
        (1001, 1): 1_000_000,
        (2, 1002): 500_000,
        (1002, 2): 500_000,
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, 1, 'x', to_timestamp(86400)::TIMESTAMP), "
        "(2, 1, NULL, to_timestamp(86400)::TIMESTAMP), "
        "(3, 2, 'y', to_timestamp(0)::TIMESTAMP)) "
        "t(event_id, user_id, event_type, ts)"
    )
    oracle = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            decayed_bipartite_edges_sql(half_life_days=1.0, type_base=1000)
        ).fetchall()
    }
    assert oracle == got


def test_knn_graph_shape_and_candidate_contract(spark):
    """Every node gets <= k neighbors, no self-edges, and every emitted
    edge shares at least one LSH band with its source (the candidate
    contract the oracle models)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    g = simsearch.knn_graph(emb, k=3).cache()
    rows = g.collect()
    assert rows and all(r["src"] != r["dst"] for r in rows)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r)
    assert max(len(v) for v in per_src.values()) <= 3
    idx = simsearch.build_lsh_index(emb, sketch_dims=16, bands=4)
    bands = {}
    for r in idx.collect():
        bands.setdefault(r["id"], set()).add((r["band"], r["value"]))
    assert all(bands[r["src"]] & bands[r["dst"]] for r in rows)
    # deterministic under re-execution (row_number ties broken by dst)
    again = sorted(map(tuple, simsearch.knn_graph(emb, k=3).collect()))
    assert sorted(map(tuple, rows)) == again


def test_knn_graph_feeds_louvain(spark):
    """The corpus-clustering composition: kNN edges (micro-unit integer
    weights) -> weighted two-level Louvain -> a real partition."""
    from personalized_pagerank_algorithms_on_neo4j_spark.operators.louvain import (
        louvain_weighted,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    g = simsearch.knn_graph(emb, k=5)
    edges_w = g.where(F.col("cosine") > 0).select(
        "src", "dst", F.round(F.col("cosine") * 1e6).cast("long").alias("weight")
    )
    labels = louvain_weighted(edges_w, rounds1=4, rounds2=2)
    rows = labels.collect()
    nodes = {r["node"] for r in rows}
    n_comm = len({r["label"] for r in rows})
    assert len(rows) == len(nodes)  # one label per node
    assert 1 < n_comm < len(nodes)  # neither all-singleton nor one blob


def test_snapshot_edge_diff_hand_fixture(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.graphstats import (
        snapshot_edge_diff,
    )

    rows = [
        # snap 1: {a,b,c}; snap 2: {b,c,d}; snap 3: {d}
        (1, 1, 2), (1, 2, 3), (1, 3, 4),
        (2, 2, 3), (2, 3, 4), (2, 9, 9),
        (3, 9, 9),
    ]
    df = spark.createDataFrame(rows, "snap long, src long, dst long")
    got = {
        (r["snap_from"], r["snap_to"]): (
            r["n_added"], r["n_removed"], r["n_kept"], r["jaccard"]
        )
        for r in snapshot_edge_diff(df).collect()
    }
    assert got == {
        (1, 2): (1, 1, 2, 0.5),
        (2, 3): (0, 2, 1, 0.333333),
    }


def test_winnow_paragraph_dups_cross_doc_only(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions import text as T

    para = " ".join(f"tok{i}" for i in range(16))  # one full block
    filler = " ".join(f"pad{i}" for i in range(16))
    other = " ".join(f"zzz{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, f"{para} {filler}"),          # para at block 0
            (2, f"{other} {para}"),           # same para at block 1
            (3, f"{filler} {filler}"),        # self-repeat within ONE doc
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["para_a"], r["doc_b"], r["para_b"])
        for r in T.winnow_paragraph_dups(docs, min_shared=2).collect()
    }
    assert (1, 0, 2, 1) in got
    # within-document repetition never surfaces here
    assert all(a != b for a, _, b, _ in got)
    # doc 3 pairs with doc 1 (filler paragraph shared cross-doc) but the
    # (3,0)x(3,1) self pair is excluded
    assert (1, 1, 3, 0) in got and (1, 1, 3, 1) in got


def test_paragraph_rows_null_and_empty_text_cross_engine(spark):
    """NULL text must emit ZERO paragraph rows in BOTH engines.  Without
    the size(_toks) > 0 guard, Spark's size(NULL) = -1 makes n_paras = 0
    and sequence(0, -1) emits the DESCENDING [0, -1] — two phantom rows
    whose _pi = -1 pid collides with doc-1's paragraph 255 — while the
    DuckDB twin's range(0, NULL) emits nothing (ADVICE r8).  Empty text
    stays: both engines tokenize '' to [''], one empty paragraph."""
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        paragraph_rows,
        paragraph_rows_sql,
    )

    para = " ".join(f"tok{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, para)], "doc_id long, text string"
    )
    got = sorted(
        (r["pid"], r["text"]) for r in paragraph_rows(docs).collect()
    )
    docs_sql = (
        "SELECT * FROM (VALUES (1, CAST(NULL AS VARCHAR)), (2, ''), "
        f"(3, '{para}')) AS v(doc_id, text)"
    )
    want = sorted(
        (int(pid), text)
        for pid, text in duckdb.sql(
            paragraph_rows_sql(docs_sql=docs_sql)
        ).fetchall()
    )
    assert got == want
    # doc 1 (NULL) contributes nothing; doc 2 ('') one empty paragraph
    assert [pid for pid, _ in got] == [2 * 256, 3 * 256]
    assert got[0][1] == ""


def test_user_transition_edges_null_type_cross_engine(spark):
    """A NULL event_type must neither create a transition node nor SHIFT
    the type ranks (the decayed_bipartite_edges NULL-ranking lesson,
    re-applied to the SCC composite-id encode/decode)."""
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        user_transition_edges,
        user_transition_edges_sql,
    )

    rows = [
        (1, 1, None, "2024-01-01 00:00:00"),
        (2, 1, "b", "2024-01-01 00:01:00"),
        (3, 1, "a", "2024-01-01 00:02:00"),
        (4, 2, "a", "2024-01-01 00:00:00"),
        (5, 2, "b", "2024-01-01 00:03:00"),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        (r["src"], r["dst"]) for r in user_transition_edges(ev).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({e}, {u}, "
            + ("NULL" if t is None else f"'{t}'")
            + f", TIMESTAMP '{ts}')"
            for e, u, t, ts in rows
        )
        + ") AS v(event_id, user_id, event_type, ts)"
    )
    oracle = sorted(con.execute(user_transition_edges_sql()).fetchall())
    assert got == oracle
    # ranks unshifted by the NULL: a=0, b=1 -> user1 has b->a only
    # (NULL->b transition is dropped), user2 a->b
    assert got == [(9, 8), (16, 17)]


def test_user_transition_edges_stride_guard_raises(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        TRANSITION_NODE_STRIDE,
        user_transition_edges,
    )
    import pytest as _pytest

    rows = [
        (i, 1, f"t{i}", "2024-01-01 00:00:%02d" % i)
        for i in range(TRANSITION_NODE_STRIDE)
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pytest.raises(ValueError, match="TRANSITION_NODE_STRIDE"):
        user_transition_edges(ev)


def test_transition_types_under_stride_at_gate_scale(spark):
    """The composite-id stride cap is invisible to the oracle (both
    engines model the same formula), so pin it at SF_ORACLE like every
    oracle-invisible cap."""
    from .conftest import SF_ORACLE
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        TRANSITION_NODE_STRIDE,
    )

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    n = ev.where(F.col("event_type").isNotNull()).select("event_type").distinct().count()
    assert n < TRANSITION_NODE_STRIDE


def test_winnow_paragraph_fp_df_cap_never_binds_at_gate_scale(spark):
    """Paragraph units have their own fingerprint-DF distribution; the
    Spark-side max_fp_df cap must not be able to bind at the scale the
    cap-free oracle compares at."""
    from .conftest import SF_ORACLE
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.text import (
        paragraph_rows,
        winnow_fingerprints,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    paras = paragraph_rows(docs)
    max_df = (
        winnow_fingerprints(paras, id_col="pid", k=4, w=4)
        .select("pid", "fp_hash")
        .distinct()
        .groupBy("fp_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_df < 1000 // 64


def test_bpe_merges_matches_python_reference(spark):
    """The distributed loop must replay a pure-python BPE trainer exactly:
    overlapping pair counts, argmax with (n desc, lhs, rhs) tie-break,
    greedy-left fusing."""
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.bpe import (
        bpe_merges,
    )

    corpus = [
        "a b a b c a b",
        "b c b c b c",
        "a b c d d d",
        "x",
        "",
    ]

    def ref(docs, rounds):
        streams = [d.lower().split() for d in docs]
        out = []
        for step in range(rounds):
            counts = {}
            for t in streams:
                for x, y in zip(t, t[1:]):
                    counts[(x, y)] = counts.get((x, y), 0) + 1
            if not counts:
                break
            (l, r), n = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((step, l, r, n))
            fused = []
            for t in streams:
                nt, i = [], 0
                while i < len(t):
                    if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                        nt.append(l + r)
                        i += 2
                    else:
                        nt.append(t[i])
                        i += 1
                fused.append(nt)
            streams = fused
        return out

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r["step"], r["lhs"], r["rhs"], r["n"])
        for r in bpe_merges(docs, rounds=6).orderBy("step").collect()
    ]
    assert got == ref(corpus, 6)
    assert len(got) == 6 and got[0][3] >= got[-1][3]


def test_bpe_compression_invariants(spark):
    from personalized_pagerank_algorithms_on_neo4j_spark.functions.bpe import (
        bpe_compression,
        bpe_merges,
    )

    corpus = [
        (1, "a b a b c a b"),
        (2, "b c b c b c"),
        (3, "x"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bpe_compression(docs, rounds=3).collect()}
    # before counts = whitespace token counts; after <= before; doc 3 has
    # no pairs so it never compresses
    assert rows[1]["n_before"] == 7 and rows[2]["n_before"] == 6
    assert all(r["n_after"] <= r["n_before"] for r in rows.values())
    assert rows[3]["n_before"] == rows[3]["n_after"] == 1
    # total symbols removed = total occurrences fused: each merge round
    # removes exactly as many symbols as the greedy-left fuse count of
    # its pair at apply time; cross-check the corpus-wide delta is
    # positive and bounded by rounds * max pair count
    merges = bpe_merges(docs, rounds=3).collect()
    delta = sum(r["n_before"] - r["n_after"] for r in rows.values())
    assert 0 < delta <= sum(m["n"] for m in merges)


def test_bpe_compression_oracle_on_merge_exhausted_corpus(spark):
    """When learnable merges run out before `rounds`, the oracle's
    passthrough LEFT JOIN must keep emitting one row per doc exactly
    like the Spark side (a cross join against the empty argmax CTE used
    to zero out every later round — caught in review)."""
    import duckdb

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.bpe import (
        bpe_compression,
        bpe_compression_oracle_sql,
    )

    corpus = [(1, "a b"), (2, "a b"), (3, "x")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["n_before"], r["n_after"])
        for r in bpe_compression(docs, rounds=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in corpus)
        + ") v(doc_id, text)"
    )
    oracle = sorted(
        map(tuple, con.execute(bpe_compression_oracle_sql(rounds=3)).fetchall())
    )
    assert got == oracle
    # round 1 fuses 'a b' everywhere; rounds 2-3 find nothing; doc 3 inert
    assert got == [(1, 2, 1), (2, 2, 1), (3, 1, 1)]


def test_funnel_oracle_builder_rejects_single_step():
    """The generic oracle builder must refuse < 2 steps instead of
    emitting a zero-WHEN `CASE s.step_idx ELSE n0 END` DuckDB rejects."""
    import pytest as _pytest

    from personalized_pagerank_algorithms_on_neo4j_spark.functions.funnel import (
        funnel_report_oracle_sql,
    )

    with _pytest.raises(ValueError, match=">= 2 steps"):
        funnel_report_oracle_sql(["view"])
    with _pytest.raises(ValueError, match=">= 2 steps"):
        funnel_report_oracle_sql([])
    # the 3-step production shape still builds
    assert "CASE s.step_idx WHEN 1" in funnel_report_oracle_sql(
        ["view", "click", "purchase"]
    )
