"""Batched-BPE training + longest-match apply (round-9 realistic-vocab
path): pure-Python parity, DuckDB-oracle parity, and the greedy-munch
edge cases."""

from __future__ import annotations

import random

import duckdb

from personalized_pagerank_algorithms_on_neo4j_spark.functions import bpe


def _py_batched_merges(texts, schedule):
    """Reference batched-greedy trainer: per round, top-B pairs of the
    round-opening counts ((n DESC, lhs, rhs) order), applied one at a
    time in rank order (left fold, greedy-left non-overlapping)."""
    streams = [t.lower().split() for t in texts]
    merges = []
    for rnd, batch_size in enumerate(schedule):
        counts: dict[tuple[str, str], int] = {}
        for s in streams:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        batch = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:batch_size]
        if not batch:
            break
        for rank, ((lhs, rhs), n) in enumerate(batch):
            merges.append((rnd, rank, lhs, rhs, n))
            nxt = []
            for s in streams:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                        out.append(lhs + "_" + rhs)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                nxt.append(out)
            streams = nxt
    return merges


def _py_longest_match(text, pieces):
    words = text.lower().split()
    pset = set(pieces)
    lens = sorted({p.count("_") + 1 for p in pieces}, reverse=True)
    i, n = 0, 0
    while i < len(words):
        step = 1
        for length in lens:
            if i + length <= len(words) and "_".join(words[i : i + length]) in pset:
                step = length
                break
        n += 1
        i += step
    return len(words), n


def _fixture():
    rng = random.Random(9)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for _ in range(40)
    ]
    texts.append("aa")          # single-word doc: exactly one token
    texts.append("aa bb aa bb")  # chain overlaps exercise greedy-left
    return texts


def test_batched_trainer_matches_python(spark):
    texts = _fixture()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sched = [6, 4, 2]
    got = bpe.bpe_merges_batched(docs, schedule=sched)
    assert got == _py_batched_merges(texts, sched)
    # batches are rank-ordered and respect the schedule sizes
    rounds = {}
    for rnd, rank, *_ in got:
        rounds.setdefault(rnd, []).append(rank)
    for rnd, ranks in rounds.items():
        assert ranks == list(range(len(ranks)))
        assert len(ranks) <= sched[rnd]


def test_longest_match_matches_python_and_oracle(spark):
    texts = _fixture()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sched = [6, 4, 2]
    merges = bpe.bpe_merges_batched(docs, schedule=sched)
    pieces = [f"{l}_{r}" for _, _, l, r, _ in merges]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe.bpe_longest_match_counts(docs, pieces).collect()
    }
    want = {i: _py_longest_match(t, pieces) for i, t in enumerate(texts)}
    assert got == want
    # the learned vocab actually compresses (n_tokens < n_words somewhere)
    assert any(t < w for w, t in got.values())

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    sql = bpe.bpe_encode_oracle_sql(
        "SELECT doc_id, text FROM documents", schedule=sched, doubling_rounds=6
    )
    orc = {
        int(r[0]): (int(r[1]), int(r[2])) for r in con.execute(sql).fetchall()
    }
    assert orc == want


def test_longest_match_prefers_longer_piece(spark):
    """A 3-word piece must beat its own 2-word prefix at the same
    position (the maximal-munch property the pointer graph encodes)."""
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe.bpe_longest_match_counts(
            docs, ["a_b", "a_b_c"]
        ).collect()
    }
    # doc 0: [a_b_c, d] = 2 tokens (NOT [a_b, c, d] = 3)
    assert got == {0: 2, 1: 2}


def test_longest_match_empty_vocab(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    row = bpe.bpe_longest_match_counts(docs, []).collect()[0]
    assert (row["n_words"], row["n_tokens"]) == (3, 3)
