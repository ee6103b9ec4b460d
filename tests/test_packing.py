"""Unit tests for operators/packing.py (concat-and-split packing).

The load-bearing property is partition invariance: the distributed
prefix sum must produce the identical manifest no matter how the input
is range-partitioned, or packed corpora are not reproducible across
cluster sizes.
"""

from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.packing import (
    concat_split_pack,
    pack_stats,
)

ROWS = [(i, 7 + (i * 13) % 90) for i in range(200)]  # ids 0..199, 7..96 tokens
BUDGET = 128


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, n_tokens long")


def test_sequences_exactly_full_except_last(spark):
    stats = pack_stats(concat_split_pack(_df(spark), "doc_id", "n_tokens", BUDGET)).collect()
    total = sum(n for _, n in ROWS)
    assert [r["n_tokens"] for r in stats[:-1]] == [BUDGET] * (len(stats) - 1)
    assert stats[-1]["n_tokens"] == total - BUDGET * (len(stats) - 1)
    assert [r["seq_id"] for r in stats] == list(range(len(stats)))


def test_doc_pieces_reassemble(spark):
    man = concat_split_pack(_df(spark), "doc_id", "n_tokens", BUDGET)
    per_doc = {
        r["doc_id"]: (r["tok"], r["pieces"])
        for r in man.groupBy("doc_id")
        .agg(F.sum("tokens_in_seq").alias("tok"), F.count(F.lit(1)).alias("pieces"))
        .collect()
    }
    for doc_id, n in ROWS:
        tok, pieces = per_doc[doc_id]
        assert tok == n  # pieces sum back to the full document
        assert pieces <= n // BUDGET + 2  # bounded expansion


def test_partition_invariance(spark):
    base = concat_split_pack(_df(spark), "doc_id", "n_tokens", BUDGET, num_partitions=1)
    expect = sorted(map(tuple, base.collect()))
    for p in (3, 7, 64):
        got = sorted(
            map(
                tuple,
                concat_split_pack(
                    _df(spark), "doc_id", "n_tokens", BUDGET, num_partitions=p
                ).collect(),
            )
        )
        assert got == expect, f"manifest differs at {p} partitions"


def test_zero_token_docs_dropped_and_offsets_consistent(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 60)], "doc_id long, n_tokens long"
    )
    man = concat_split_pack(df, "doc_id", "n_tokens", budget=128).collect()
    assert {r["doc_id"] for r in man} == {1, 3}
    by = {(r["doc_id"], r["seq_id"]): r for r in man}
    # doc 3 starts at global offset 100: 28 tokens fill seq 0, 32 spill to seq 1
    assert by[(3, 0)]["tokens_in_seq"] == 28 and by[(3, 0)]["seq_offset"] == 100
    assert by[(3, 1)]["tokens_in_seq"] == 32 and by[(3, 1)]["doc_offset"] == 28


def test_doc_much_longer_than_budget_spans_many_sequences(spark):
    """A document 5x the budget must split into ceil(5.5) contiguous
    pieces whose offsets tile the doc exactly."""
    df = spark.createDataFrame(
        [(1, 30), (2, 5 * BUDGET + 64), (3, 10)], "doc_id long, n_tokens long"
    )
    man = sorted(
        (r["seq_id"], r["doc_offset"], r["tokens_in_seq"])
        for r in concat_split_pack(df, "doc_id", "n_tokens", BUDGET).collect()
        if r["doc_id"] == 2
    )
    assert len(man) == 6  # 30 tokens precede it; 5*B+64 tokens span 6 bins
    # pieces tile the document contiguously
    pos = 0
    for _, doc_off, n in man:
        assert doc_off == pos
        pos += n
    assert pos == 5 * BUDGET + 64


def test_control_plane_guard_raises_on_pathological_partitions(spark):
    """The P-row exclusive scan must raise past max_control_rows (one
    row per partition) instead of collecting millions of rows."""
    import pytest

    df = _df(spark)
    with pytest.raises(ValueError, match="max_control_rows"):
        concat_split_pack(
            df, "doc_id", "n_tokens", BUDGET, num_partitions=1000, max_control_rows=100
        )
    # normal partition counts pass unchanged
    assert concat_split_pack(
        df, "doc_id", "n_tokens", BUDGET, num_partitions=8, max_control_rows=100
    ).count() > 0


def test_pack_repeated_runs_identical_with_subsampled_boundaries(spark):
    """Regression (r7, caught at sf10): the totals job and the spans job
    each re-ran the range exchange, whose boundary sampler re-samples
    per job -- boundary-adjacent rows could land in different partitions
    than the broadcast offsets were computed from, silently shifting
    global offsets.  With enough rows that the sampler subsamples, two
    runs must still produce identical manifests (the persist-once fix,
    same as operators/quantiles.py)."""
    from big_data_co2_emission_analysis_spark.operators.packing import (
        concat_split_pack,
    )

    df = spark.range(200_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n")
    )

    def run():
        out = concat_split_pack(df, "doc_id", "n", budget=512, num_partitions=32)
        return out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.hash("seq_id", "doc_id", "doc_offset", "tokens_in_seq",
                         "seq_offset").cast("long")).alias("h"),
        ).collect()[0]

    a, b = run(), run()
    assert (a.rows, a.h) == (b.rows, b.h)
