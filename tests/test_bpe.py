"""BPE tokenizer (operators/bpe.py): textbook merge order, encode
round-trip properties, distributed/driver parity."""

from __future__ import annotations

import pytest

from big_data_co2_emission_analysis_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_encode,
    bpe_train,
)


def test_textbook_merge_order(spark):
    """The classic low/lower/newest/widest corpus: with frequencies
    low x5, lower x2, newest x6, widest x3 the first merges are
    (e, s) -> es (freq 9), (es, t) -> est (9), (est, </w>) (9), then
    (l, o) (7), (lo, w) (7)."""
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    docs = spark.createDataFrame(
        [(i, " ".join(t for (t,) in rows)) for i in range(1)], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=5)
    assert merges[:5] == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_encode_word_follows_merge_ranks():
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert _encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert _encode_word("low", ranks) == ["low", EOW]
    assert _encode_word("xyz", ranks) == ["x", "y", "z", EOW]  # no applicable merges


def test_encode_distributed_matches_driver(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest widest"), (3, None)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}
    want1 = _encode_word("low", ranks) * 2 + _encode_word("lower", ranks)
    assert got[1] == want1
    assert got[3] == []  # null text -> zero tokens, no crash


def test_more_merges_never_increase_token_count(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta " * 3) for i in range(4)],
        "doc_id long, text string",
    )
    short = bpe_encode(docs, bpe_train(docs, num_merges=3))
    long = bpe_encode(docs, bpe_train(docs, num_merges=50))
    s = {r["doc_id"]: r["n_tokens"] for r in short.collect()}
    l = {r["doc_id"]: r["n_tokens"] for r in long.collect()}
    assert all(l[k] <= s[k] for k in s)


def test_train_determinism_and_guards(spark):
    docs = spark.createDataFrame(
        [(1, "aa ab aa ab ba")], "doc_id long, text string"
    )
    assert bpe_train(docs, num_merges=5) == bpe_train(docs, num_merges=5)
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(docs, num_merges=0)
    with pytest.raises(ValueError, match="sample_docs"):
        bpe_train(docs, num_merges=1, sample_docs=2_000_000)


def test_registry_query_shape(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.queries.registry import all_queries

    rows = all_queries()["bpe_token_stats"].fn(spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        # BPE with EOW markers can never produce fewer tokens than words
        assert r["n_tokens"] >= r["n_words"] >= 1
        assert r["tokens_per_word"] >= 1.0
