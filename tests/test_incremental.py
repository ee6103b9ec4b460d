"""Unit tests for operators/incremental.py (mergeable aggregate state)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_co2_emission_analysis_spark.operators.incremental import (
    finalize,
    merge_partials,
    partial_agg,
)


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _final_map(spark, rows_lists):
    """Partial-agg each split, merge, finalize -> {k: (cnt,sum,min,max)}."""
    states = [partial_agg(_rows_df(spark, rs), ["k"], ["v"]) for rs in rows_lists]
    fin = finalize(merge_partials(states, ["k"]), ["v"]).collect()
    return {
        r["k"]: (r["v_count"], round(r["v_sum"], 6), r["v_min"], r["v_max"])
        for r in fin
    }


def test_merge_of_splits_equals_single_pass(spark):
    rows = [("a", 1.5), ("a", 2.5), ("b", -1.0), ("b", 7.0), ("c", 0.0)]
    whole = _final_map(spark, [rows])
    split = _final_map(spark, [rows[:2], rows[2:4], rows[4:]])
    assert whole == split
    assert whole["a"] == (2, 4.0, 1.5, 2.5)


def test_merge_is_split_invariant_property(spark):
    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.sampled_from(["x", "y", "z"]),
                st.floats(-1e3, 1e3, allow_nan=False).map(lambda f: round(f, 4)),
            ),
            min_size=1,
            max_size=30,
        ),
        cut=st.integers(0, 30),
    )
    def check(vals, cut):
        cut = min(cut, len(vals))
        whole = _final_map(spark, [vals])
        parts = [p for p in (vals[:cut], vals[cut:]) if p]
        assert _final_map(spark, parts) == whole

    check()


def test_empty_delta_is_identity(spark):
    rows = [("a", 3.0), ("b", 4.0)]
    base = partial_agg(_rows_df(spark, rows), ["k"], ["v"])
    merged = merge_partials([base, base.limit(0)], ["k"])
    assert sorted(map(tuple, finalize(merged, ["v"]).collect())) == sorted(
        map(tuple, finalize(base, ["v"]).collect())
    )
