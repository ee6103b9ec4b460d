"""Unit tests for operators/fuzzy.py (blocked entity resolution) and
operators/diff.py (snapshot reconciliation)."""

from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)
from big_data_co2_emission_analysis_spark.operators.fuzzy import (
    fuzzy_block_stats,
    fuzzy_match_pairs,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, ["id", "name"])


def test_fuzzy_finds_typo_pairs(spark):
    df = _names(
        spark,
        [
            (1, "acme widgets"),
            (2, "acme widgett"),  # distance 1 from id 1
            (3, "acme wadgets"),  # distance 1 from id 1, 2 from id 2
            (4, "acme rockets"),  # distance > 2 from all
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_match_pairs(df, "id", "name", max_distance=2).collect()
    }
    assert pairs == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_fuzzy_blocking_bounds_recall(spark):
    # distance 1, but different first token: blocked apart, never compared
    df = _names(spark, [(1, "acme widgets"), (2, "acmee widgets")])
    assert fuzzy_match_pairs(df, "id", "name", max_distance=2).count() == 0


def test_fuzzy_ids_ordered_and_no_self_pairs(spark):
    df = _names(spark, [(5, "x y"), (2, "x y"), (9, "x y")])
    rows = fuzzy_match_pairs(df, "id", "name", max_distance=0).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in rows) == [(2, 5), (2, 9), (5, 9)]
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_fuzzy_max_block_size_drops_degenerate_block(spark):
    # 30 identical rows in one block would expand 435 pairs; cap 10 drops
    # the whole block while the small block still matches
    rows = [(i, "boiler plate") for i in range(30)] + [
        (100, "rare gem"),
        (101, "rare gemm"),
    ]
    df = _names(spark, rows)
    out = fuzzy_match_pairs(df, "id", "name", max_distance=2, max_block_size=10)
    assert [(r["id_a"], r["id_b"]) for r in out.collect()] == [(100, 101)]
    stats = {r["block"]: r["n_rows"] for r in fuzzy_block_stats(df, "name").collect()}
    assert stats == {"boiler": 30, "rare": 2}


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def test_diff_classifies_all_statuses(spark):
    old = _snap(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = _snap(spark, [(2, "b"), (3, "C"), (4, None), (5, "e")])
    got = {
        r["k"]: (r["diff_status"], r["v_old"], r["v_new"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("removed", "a", None),
        2: ("unchanged", "b", "b"),
        3: ("changed", "c", "C"),
        4: ("unchanged", None, None),  # NULL <=> NULL is unchanged
        5: ("added", None, "e"),
    }


def test_diff_null_to_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "x")], "k int, v string")
    [row] = snapshot_diff(old, new, ["k"]).collect()
    assert row["diff_status"] == "changed"


def test_diff_summary_counts(spark):
    old = _snap(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _snap(spark, [(2, "b"), (3, "x"), (4, "d")])
    got = {
        r["diff_status"]: r["n_rows"]
        for r in snapshot_diff_summary(old, new, ["k"]).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}


def test_diff_compound_key_and_default_compare_cols(spark):
    old = spark.createDataFrame([(1, "x", 10, "m"), (2, "y", 20, "n")], ["a", "b", "v", "w"])
    new = spark.createDataFrame([(1, "x", 10, "M"), (2, "y", 20, "n")], ["a", "b", "v", "w"])
    got = {
        (r["a"], r["b"]): r["diff_status"]
        for r in snapshot_diff(old, new, ["a", "b"]).collect()
    }
    assert got == {(1, "x"): "changed", (2, "y"): "unchanged"}


def test_epoch_shuffle_reproducible_and_epoch_sensitive(spark):
    from big_data_co2_emission_analysis_spark.operators.sampling import epoch_shuffle

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    e1a = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 1).collect()]
    e1b = [r["doc_id"] for r in epoch_shuffle(df.repartition(7), "doc_id", 1).collect()]
    e2 = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 2).collect()]
    assert e1a == e1b  # reproducible across partitionings
    assert e1a != e2  # different permutation per epoch
    assert sorted(e1a) == sorted(e2) == list(range(100))  # true permutations


def test_mixture_sample_hits_target_proportions(spark):
    from big_data_co2_emission_analysis_spark.operators.sampling import mixture_sample

    rows = (
        [(i, "web") for i in range(8000)]
        + [(i + 10000, "books") for i in range(1000)]
        + [(i + 20000, "code") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "id long, domain string")
    out = mixture_sample(df, "domain", {"web": 0.6, "books": 0.3, "code": 0.1}, seed=7)
    got = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("id").alias("n")).collect()
    }
    # books is the binding domain (needs 30% from 10% supply): kept whole
    assert got["books"] > 900
    total = sum(got.values())
    assert abs(got["web"] / total - 0.6) < 0.05
    assert abs(got["books"] / total - 0.3) < 0.05
    assert abs(got["code"] / total - 0.1) < 0.05


def test_mixture_sample_total_rows_cap(spark):
    from big_data_co2_emission_analysis_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a") for i in range(5000)] + [(i + 9000, "b") for i in range(5000)],
        "id long, domain string",
    )
    out = mixture_sample(df, "domain", {"a": 0.5, "b": 0.5}, total_rows=1000, seed=3)
    n = out.count()
    assert 800 < n < 1200  # Bernoulli noise around the cap


def test_diff_reconstructs_new_snapshot(spark):
    """Load-bearing diff property: applying the diff to the old
    snapshot must reconstruct the new one exactly (added+changed rows
    take v_new, removed rows drop, unchanged rows carry over)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        old_rows=st.dictionaries(
            st.integers(0, 30), st.one_of(st.none(), st.integers(0, 5)), max_size=20
        ),
        new_rows=st.dictionaries(
            st.integers(0, 30), st.one_of(st.none(), st.integers(0, 5)), max_size=20
        ),
    )
    def check(old_rows, new_rows):
        old = spark.createDataFrame(
            [(k, v) for k, v in old_rows.items()] or [(None, None)], "k int, v int"
        ).filter(F.col("k").isNotNull())
        new = spark.createDataFrame(
            [(k, v) for k, v in new_rows.items()] or [(None, None)], "k int, v int"
        ).filter(F.col("k").isNotNull())
        diff = snapshot_diff(old, new, ["k"]).collect()
        rebuilt = {
            r["k"]: r["v_new"] for r in diff if r["diff_status"] != "removed"
        }
        assert rebuilt == new_rows

    check()


def test_fuzzy_matches_brute_force_reference(spark):
    """Property: fuzzy_match_pairs equals the brute-force definition
    (same-first-token pairs with levenshtein <= d) on random corpora."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    words = st.text(alphabet="abc", min_size=1, max_size=4)
    name = st.tuples(words, words).map(lambda t: f"{t[0]} {t[1]}")

    @settings(max_examples=10, deadline=None)
    @given(names=st.lists(name, min_size=2, max_size=12, unique=True))
    def check(names):
        rows = list(enumerate(names))
        expect = {
            (i, j, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if a.split()[0].lower() == b.split()[0].lower() and lev(a, b) <= 2
        }
        got = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in fuzzy_match_pairs(
                _names(spark, rows), "id", "name", max_distance=2
            ).collect()
        }
        assert got == expect

    check()
