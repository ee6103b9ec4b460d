"""Substring duplication (operators/substrings.py): window
construction, overlap-union coverage arithmetic, same-doc repetition,
short-doc edge, partition invariance."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.substrings import (
    duplicated_span_stats,
    duplicated_windows,
    token_windows,
    window_postings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_windows_order_and_short_doc(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b")])
    out = {
        r.doc_id: r.w
        for r in df.select("doc_id", token_windows("text", 3).alias("w")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # fewer than k tokens


def test_duplicated_windows_counts_same_doc_repeats(spark):
    # "x y z" appears twice inside doc 1: same-doc repetition counts
    df = _docs(spark, [(1, "x y z q x y z")])
    post = window_postings(df, k=3)
    dup = duplicated_windows(post).collect()
    assert len(dup) == 1
    assert dup[0].n_occurrences == 2


def test_coverage_union_of_overlapping_windows(spark):
    # doc 1 and doc 2 share the 4-token run "a b c d": doc 1 has two
    # overlapping dup windows [1..3] and [2..4] -> union covers 4
    # tokens, not 6
    df = _docs(spark, [(1, "a b c d x"), (2, "a b c d y")])
    out = {r.doc_id: r for r in duplicated_span_stats(df, k=3).collect()}
    for d in (1, 2):
        assert out[d].n_tokens == 5
        assert out[d].n_windows == 3
        assert out[d].n_dup_windows == 2
        assert out[d].covered_tokens == 4
        assert out[d].dup_token_frac == pytest.approx(4 / 5)


def test_disjoint_dup_spans_sum(spark):
    # two separate shared trigrams inside one doc, no overlap: 3+3
    df = _docs(
        spark,
        [
            (1, "a b c m m m m d e f"),
            (2, "a b c"),
            (3, "d e f"),
        ],
    )
    out = {r.doc_id: r for r in duplicated_span_stats(df, k=3).collect()}
    # doc1: dup windows at pos 1 (a b c) and pos 8 (d e f)... plus the
    # m-runs: "m m m" at pos 4 and 5 repeat within the doc -> those
    # also count; compute expected union: [1..3], [4..6], [5..7], [8..10]
    assert out[1].covered_tokens == 10
    assert out[2].covered_tokens == 3
    assert out[3].covered_tokens == 3


def test_no_dups_reports_zero(spark):
    df = _docs(spark, [(1, "p q r s t"), (2, "u v w x y")])
    out = {r.doc_id: r for r in duplicated_span_stats(df, k=3).collect()}
    for d in (1, 2):
        assert out[d].n_dup_windows == 0
        assert out[d].covered_tokens == 0
        assert out[d].dup_token_frac == 0.0


def test_partition_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    a = sorted(
        duplicated_span_stats(docs.repartition(1), k=5).collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        duplicated_span_stats(docs.repartition(7), k=5).collect(),
        key=lambda r: r.doc_id,
    )
    assert a == b
