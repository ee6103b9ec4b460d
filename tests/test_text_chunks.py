"""Edge cases for the chunking / repetition / contamination text ops
(happy paths are oracle-checked by the driver against DuckDB)."""

from pyspark.sql import functions as F


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_ngram_list_short_text_is_empty(spark):
    from big_data_co2_emission_analysis_spark.functions.text import ngram_list

    got = _one(spark, "only two").select(ngram_list("text", 3).alias("g")).first()["g"]
    assert got == []


def test_ngram_list_keeps_duplicates(spark):
    from big_data_co2_emission_analysis_spark.functions.text import ngram_list

    got = _one(spark, "a b a b a b").select(ngram_list("text", 3).alias("g")).first()["g"]
    assert got == ["a b a", "b a b", "a b a", "b a b"]


def test_repeated_ngram_ratio_degenerate_loop(spark):
    from big_data_co2_emission_analysis_spark.functions.text import repeated_ngram_ratio

    # 8 tokens of pure loop -> 6 trigrams, 2 distinct -> ratio 4/6
    df = _one(spark, "x y x y x y x y").select(repeated_ngram_ratio("text", 3).alias("r"))
    assert abs(df.first()["r"] - 4 / 6) < 1e-6


def test_repeated_ngram_ratio_null_for_short(spark):
    from big_data_co2_emission_analysis_spark.functions.text import repeated_ngram_ratio

    assert _one(spark, "hi").select(repeated_ngram_ratio("text", 3).alias("r")).first()["r"] is None


def test_token_chunks_cover_and_overlap(spark):
    from big_data_co2_emission_analysis_spark.functions.text import token_chunks

    text = " ".join(f"t{i}" for i in range(10))
    rows = (
        _one(spark, text)
        .select(F.explode(token_chunks("text", 4, 3)).alias("c"))
        .select("c.*")
        .collect()
    )
    # starts 1,4,7,10; window 4 truncated at the tail
    assert [r["chunk_start"] for r in rows] == [1, 4, 7, 10]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[-1]["chunk_text"] == "t9"
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]
    # every token appears in at least one chunk
    seen = set(" ".join(r["chunk_text"] for r in rows).split())
    assert seen == set(text.split())


def test_token_chunks_single_token(spark):
    from big_data_co2_emission_analysis_spark.functions.text import token_chunks

    rows = (
        _one(spark, "solo")
        .select(F.explode(token_chunks("text", 64, 48)).alias("c"))
        .select("c.*")
        .collect()
    )
    assert len(rows) == 1 and rows[0]["chunk_text"] == "solo" and rows[0]["n_tokens"] == 1
