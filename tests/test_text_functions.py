"""Text-analysis function semantics on crafted inputs (lang-ID accuracy
on real sentences, token-count edge cases, quality ordering,
fingerprint stability)."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.functions.text import (
    bpe_ish_token_count,
    bpe_ish_token_count_udf,
    lang_id,
    quality_score,
    rolling_fingerprint,
    token_count,
)

SENTENCES = [
    ("en", "the cat sat on the mat and it is warm in that corner of the house"),
    ("de", "der hund und die katze sind nicht mit dem ball in das haus gegangen"),
    ("fr", "le chat est sur la table et les enfants mangent des pommes que nous aimons"),
    ("es", "el perro come la comida que los gatos dejaron por una ventana abierta"),
    ("zh", "我 的 猫 是 在 家 里 有 很多 玩具 和 不 少 朋友"),
]


def test_lang_id_real_sentences(spark):
    df = spark.createDataFrame(SENTENCES, "expected string, text string")
    rows = df.select("expected", lang_id("text").alias("got")).collect()
    assert all(r["expected"] == r["got"] for r in rows)


def test_lang_id_undetermined(spark):
    df = spark.createDataFrame([("zzz qqq xxx",)], "text string")
    assert df.select(lang_id("text").alias("g")).collect()[0]["g"] == "und"


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("", 0), ("   ", 0), ("one", 1), ("a  b\t c\nd", 4)], "t string, expected int"
    )
    rows = df.select("expected", token_count("t").alias("n")).collect()
    assert all(r["expected"] == r["n"] for r in rows)


def test_bpe_ish_splits_boundaries(spark):
    df = spark.createDataFrame([("don't-stop2023",)], "t string")
    n = df.select(bpe_ish_token_count("t").alias("n")).collect()[0]["n"]
    # don | ' | t | - | stop | 2023
    assert n == 6


def test_bpe_udf_matches_native(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    udf = bpe_ish_token_count_udf()
    rows = docs.select(
        bpe_ish_token_count("text").alias("native"), udf("text").alias("py")
    ).collect()
    assert all(r["native"] == r["py"] for r in rows)


def test_quality_ordering(spark):
    texts = [
        ("good", "This is a perfectly reasonable paragraph of clean prose with many words."),
        ("punct", "!!! ??? ;;; ::: ,,, ... !!! ??? ;;; ::: ,,, ..."),
        ("short", "hi"),
    ]
    df = spark.createDataFrame(texts, "k string, text string")
    q = {r["k"]: r["q"] for r in df.select("k", quality_score("text").alias("q")).collect()}
    assert q["good"] > q["punct"]
    assert q["good"] > q["short"]
    assert 0 <= min(q.values()) and max(q.values()) <= 1


def test_rolling_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"), (3, "a b c d e f g h i K")],
        "id long, t string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", rolling_fingerprint("t").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_stack_is_deterministic_across_runs(spark):
    df = spark.createDataFrame([("x y z",)], "t string")
    a = df.select(rolling_fingerprint("t").alias("f")).collect()[0]["f"]
    b = df.select(rolling_fingerprint("t").alias("f")).collect()[0]["f"]
    assert a == b


def test_quality_score_null_safe(spark):
    df = spark.createDataFrame([(None,)], "text string")
    # must not throw; null in -> null out
    assert df.select(quality_score("text").alias("q")).collect()[0]["q"] is None
