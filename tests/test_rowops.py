"""Null-drop matrix, dedup, filter, and top-k tie semantics on crafted
frames (SURVEY.md section 5 point 4 -- the fixture tables have no
nulls, so the null semantics live here)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def nulls_df(spark):
    rows = [
        ("a", 1.0, 2.0),
        ("b", None, 2.0),
        ("c", 1.0, None),
        ("d", None, None),
        (None, None, None),
    ]
    return spark.createDataFrame(rows, "name string, x double, y double")


def test_drop_all(nulls_df):
    # reference N1 (project-co2.py:25): only the fully-null row goes
    assert nulls_df.na.drop(how="all").count() == 4


def test_drop_all_subset(nulls_df):
    # reference N2 (project-co2.py:26): drop only if BOTH x and y null
    assert nulls_df.na.drop(how="all", subset=["x", "y"]).count() == 3


def test_drop_any(nulls_df):
    # reference N3 (project-co2.py:29): the effective cleaning rule
    assert nulls_df.na.drop(how="any").count() == 1


def test_is_reduced_boundary(spark):
    # change == 0 counts as reduced (reference project-co2.py:105)
    df = spark.createDataFrame([(0.0,), (-0.1,), (0.1,)], "change double")
    flags = {r["change"]: r["f"] for r in df.select("change", (F.col("change") <= 0).alias("f")).collect()}
    assert flags[0.0] is True and flags[-0.1] is True and flags[0.1] is False


def test_drop_duplicates(spark):
    # declared in reference README.md:10 but never implemented there
    df = spark.createDataFrame([(1, "x"), (1, "x"), (1, "y"), (2, "x")], "k int, v string")
    assert df.dropDuplicates().count() == 3
    assert df.dropDuplicates(["k"]).count() == 2


def test_exact_dedup_keep_min_deterministic(spark):
    from big_data_co2_emission_analysis_spark.operators.dedup import exact_dedup_keep_min

    df = spark.createDataFrame([("x", 5), ("x", 2), ("y", 9), ("x", 7)], "k string, id int")
    out = {r["k"]: r["id"] for r in exact_dedup_keep_min(df, ["k"], "id").collect()}
    assert out == {"x": 2, "y": 9}


def test_topk_with_ties_deterministic(spark):
    df = spark.createDataFrame([("a", 3.0), ("b", 3.0), ("c", 2.0), ("d", 5.0)], "n string, v double")
    top = df.orderBy(F.desc("v"), F.asc("n")).limit(2).collect()
    assert [r["n"] for r in top] == ["d", "a"]


def test_isin_filter(spark):
    df = spark.createDataFrame([("Germany",), ("China",), ("Peru",)], "c string")
    assert df.filter(F.col("c").isin("Germany", "China", "Sweden")).count() == 2


def test_label_native_vs_udf_parity(spark):
    """X3: the native decimal label equals the reference's Python-UDF
    label (modulo Python round's banker's rounding at exact .5 ties --
    excluded from the fixture as SURVEY.md section 7 hard part (c))."""
    from pyspark.sql.types import StringType

    df = spark.createDataFrame(
        [(0, -2.1293, -0.0873), (1, 0.4339, 1.3529), (2, -18.10722, 8.32361)],
        "cluster int, mn double, mx double",
    )
    udf_label = F.udf(lambda a, b: f"{round(a, 3)} - {round(b, 3)}", StringType())
    native = F.concat(
        F.col("mn").cast("decimal(18,3)").cast("string"),
        F.lit(" - "),
        F.col("mx").cast("decimal(18,3)").cast("string"),
    )
    rows = df.select(udf_label("mn", "mx").alias("u"), native.alias("n")).collect()
    for r in rows:
        # native keeps trailing zeros ("0.434"), python round drops them;
        # compare numerically segment by segment
        ua, ub = r["u"].split(" - ")
        na, nb = r["n"].split(" - ")
        assert float(ua) == float(na) and float(ub) == float(nb)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change inner/left equi-join results."""
    from big_data_co2_emission_analysis_spark.operators.joins import salted_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_mktsegment")
    right = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(right, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(orders, right, ["o_custkey"], num_salts=8).groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    left_plain = orders.join(right, "o_custkey", "left").count()
    left_salted = salted_join(orders, right, ["o_custkey"], num_salts=8, how="left").count()
    assert left_plain == left_salted


def test_stratified_sample_fractions(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.operators.sampling import stratified_sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    totals = {r["l_returnflag"]: r["count"] for r in li.groupBy("l_returnflag").count().collect()}
    sampled = stratified_sample(li, "l_returnflag", {"A": 0.5, "N": 0.1}, seed=42)
    got = {r["l_returnflag"]: r["count"] for r in sampled.groupBy("l_returnflag").count().collect()}
    assert "R" not in got  # stratum absent from fractions drops
    assert abs(got["A"] / totals["A"] - 0.5) < 0.1
    assert abs(got["N"] / totals["N"] - 0.1) < 0.05


def test_train_test_split_keyed_is_stable_and_leak_free(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.operators.sampling import train_test_split

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    train, test = train_test_split(orders, 0.25, key_col="o_custkey", seed=7)
    n, tr, te = orders.count(), train.count(), test.count()
    assert tr + te == n
    assert 0.1 < te / n < 0.4
    # leak-free: no customer appears on both sides
    both = train.select("o_custkey").intersect(test.select("o_custkey"))
    assert both.count() == 0
    # stable across repartitioning
    tr2, te2 = train_test_split(orders.repartition(13), 0.25, key_col="o_custkey", seed=7)
    assert te2.count() == te


def test_jsonl_reader_corrupt_record_handling(spark, tmp_path):
    from big_data_co2_emission_analysis_spark.sources.readers import read_jsonl

    p = tmp_path / "data.jsonl"
    p.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": 3.0}\nnot json at all\n')
    df = read_jsonl(spark, str(p), schema="id bigint, v double")
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 2} and len(bad) == 1
    dropped = read_jsonl(spark, str(p), schema="id bigint, v double", mode="DROPMALFORMED")
    assert dropped.filter("id IS NOT NULL").count() == 2


def test_csv_malformed_modes(spark, tmp_path):
    from big_data_co2_emission_analysis_spark.sources.readers import read_csv

    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\nmalformed_single_field\n3,4\n")
    df = read_csv(
        spark, str(p), schema="a int, b int", header=True, mode="DROPMALFORMED"
    )
    assert sorted((r["a"], r["b"]) for r in df.collect() if r["a"] is not None) == [(1, 2), (3, 4)]
