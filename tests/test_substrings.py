"""Substring duplication (operators/substrings.py): window
construction, overlap-union coverage arithmetic, same-doc repetition,
short-doc edge, partition invariance."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.substrings import (
    duplicated_span_stats,
    duplicated_windows,
    removal_intervals,
    substring_dedup_rewrite,
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


def test_rewrite_keeps_first_occurrence(spark):
    # "a b c d" shared by docs 1 and 2: doc 1 (lexicographically first)
    # keeps it verbatim; doc 2 loses the union of its dup windows
    # [1..3] u [2..4] = tokens 1..4, keeping only "y"
    df = _docs(spark, [(1, "a b c d x"), (2, "a b c d y")])
    out = {r.doc_id: r for r in substring_dedup_rewrite(df, k=3).collect()}
    assert out[1].clean_text == "a b c d x"
    assert out[1].n_removed == 0
    assert out[2].clean_text == "y"
    assert out[2].n_removed == 4
    assert out[2].n_tokens == 5


def test_rewrite_same_doc_repeat_keeps_first(spark):
    # "x y z" twice inside one doc: pos 1 kept, pos 5 removed
    df = _docs(spark, [(1, "x y z q x y z")])
    out = substring_dedup_rewrite(df, k=3).collect()[0]
    assert out.clean_text == "x y z q"
    assert out.n_removed == 3


def test_rewrite_untouched_doc_passes_through_normalized(spark):
    df = _docs(spark, [(1, "  P q   R s t ")])
    out = substring_dedup_rewrite(df, k=3).collect()[0]
    assert out.clean_text == "p q r s t"  # normalize_text semantics
    assert out.n_removed == 0


def test_rewrite_fully_removed_doc_is_empty_string(spark):
    # doc 2 and doc 3 are both copies of doc 1's trigram: every token
    # of docs 2 and 3 is covered -> empty clean_text, row still present
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "a b c")])
    out = {r.doc_id: r for r in substring_dedup_rewrite(df, k=3).collect()}
    assert out[1].clean_text == "a b c"
    assert out[2].clean_text == ""
    assert out[3].clean_text == ""
    assert out[2].n_removed == 3


def test_removal_intervals_merge_adjacent_and_overlapping(spark):
    # doc 2 duplicates doc 1's "a b c" (pos 1) and "d e f" (pos 4):
    # spans [1..3] and [4..6] are adjacent -> one merged interval
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    ivs = removal_intervals(df, k=3).collect()
    by_doc = {}
    for r in ivs:
        by_doc.setdefault(r.doc_id, []).append((r.start, r.end))
    assert 1 not in by_doc  # first occurrence holder loses nothing
    assert sorted(by_doc[2]) == [(1, 6)]


def test_rewrite_partition_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    a = sorted(
        substring_dedup_rewrite(docs.repartition(1), k=5).collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        substring_dedup_rewrite(docs.repartition(7), k=5).collect(),
        key=lambda r: r.doc_id,
    )
    assert a == b


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


def test_removed_token_counts_equals_interval_sum(spark, sf_dir):
    """removed_token_counts (one lead() sweep) must equal the
    removal_intervals merge's per-doc sum(end - start + 1) exactly --
    the union-size identity curated_corpus_v4 relies on."""
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.operators.substrings import (
        removal_intervals,
        removed_token_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    via_intervals = {
        r["doc_id"]: r["rm"]
        for r in removal_intervals(docs, k=3)
        .groupBy("doc_id")
        .agg(F.sum(F.col("end") - F.col("start") + 1).cast("long").alias("rm"))
        .collect()
    }
    via_sweep = {
        r["doc_id"]: r["removed"] for r in removed_token_counts(docs, k=3).collect()
    }
    assert via_sweep == via_intervals
    assert len(via_sweep) > 0
