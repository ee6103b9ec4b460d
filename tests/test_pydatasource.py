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


def test_stream_source_consumes_all_rows_deterministically(spark, tmp_path):
    import time

    from big_data_co2_emission_analysis_spark.sources.pydatasource import (
        register_synthetic_corpus_stream,
    )

    register_synthetic_corpus_stream(spark)
    stream = (
        spark.readStream.format("synthetic_corpus_stream")
        .option("rows_per_batch", 40)
        .option("max_rows", 100)
        .load()
    )
    seen = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: seen.extend(map(tuple, df.collect()))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    t0 = time.time()
    while len(seen) < 100 and time.time() - t0 < 120:
        time.sleep(0.5)
    q.stop()
    assert sorted(seen) == [synth_doc(i) for i in range(100)]


def test_stream_replay_reproduces_batch_bit_for_bit():
    from big_data_co2_emission_analysis_spark.sources.pydatasource import (
        SyntheticEventStreamReader,
    )

    r = SyntheticEventStreamReader({"rows_per_batch": "30", "max_rows": "90"})
    start = r.initialOffset()
    rows1, end = r.read(start)
    live = list(rows1)
    # crash recovery path: replaying [start, end) must reproduce the batch
    assert list(r.readBetweenOffsets(start, end)) == live
    assert end == {"pos": 30}
    # stream is exhausted at max_rows
    rows2, end2 = r.read({"pos": 60})
    assert len(list(rows2)) == 30 and end2 == {"pos": 90}
    rows3, end3 = r.read(end2)
    assert list(rows3) == [] and end3 == {"pos": 90}
