"""Unit tests for the Spark 4 Python DataSource (sources/pydatasource.py)."""

import pytest
from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from big_data_co2_emission_analysis_spark.sources.pydatasource import (
    SyntheticCorpusReader,
    register_synthetic_corpus,
    synth_doc,
)


@pytest.fixture()
def corpus(spark):
    register_synthetic_corpus(spark)

    def make(n_docs=300, n_partitions=4):
        return (
            spark.read.format("synthetic_corpus")
            .option("n_docs", n_docs)
            .option("n_partitions", n_partitions)
            .load()
        )

    return make


def test_row_count_schema_and_parallelism(corpus):
    df = corpus(300, 4)
    assert df.count() == 300
    assert df.columns == ["doc_id", "text", "n_tokens"]
    assert df.rdd.getNumPartitions() == 4


def test_content_is_pure_function_of_doc_id(corpus):
    rows = {r["doc_id"]: tuple(r) for r in corpus(50, 3).collect()}
    for i in range(50):
        assert rows[i] == synth_doc(i)


def test_partition_count_invariance(corpus):
    a = sorted(map(tuple, corpus(200, 1).collect()))
    b = sorted(map(tuple, corpus(200, 7).collect()))
    assert a == b


def test_filter_pushdown_narrows_planned_partitions():
    r = SyntheticCorpusReader({"n_docs": "500", "n_partitions": "4"})
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 490), LessThan(("doc_id",), 495)]
        )
    )
    # absorbed filters are still returned (re-checked by Spark, harmless)
    assert len(leftover) == 2
    spans = [(p.start, p.end) for p in r.partitions()]
    assert spans[0][0] == 490 and spans[-1][1] == 495
    assert sum(e - s for s, e in spans) == 5


def test_pushdown_end_to_end_filter_correct(corpus):
    df = corpus(500, 4)
    got = sorted(r["doc_id"] for r in df.filter("doc_id >= 490 AND doc_id < 495").collect())
    assert got == [490, 491, 492, 493, 494]
    [row] = df.filter("doc_id = 123").collect()
    assert tuple(row) == synth_doc(123)
