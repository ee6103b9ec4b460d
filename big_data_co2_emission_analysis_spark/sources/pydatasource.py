"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic text corpus with real partition planning and
source-level filter pushdown.

Why this exists: a training-data pipeline constantly needs corpus-shaped
input that does not come from files -- load generators, API-backed
catalogs, fixture factories.  Spark 4's Python DataSource API is the
sanctioned way to plug those in: the source declares its own
``partitions()`` (so parallelism is planned, not inherited from a file
listing) and can absorb predicates in ``pushFilters`` (so a ``doc_id``
range scan never materializes rows outside the range -- the same
pruning story a parquet scan gets from row-group stats).

Determinism: every row is a pure function of ``doc_id`` (an LCG seeded
by id drives word choices), so content is identical across partition
counts, retries, and cluster sizes -- the property that makes the
source usable in tests and resumable pipelines.

Register once per session, then it is a normal reader format::

    spark.dataSource.register(SyntheticCorpusDataSource)
    spark.read.format("synthetic_corpus").option("n_docs", 10_000).load()

Scale note: rows are generated IN Python (that is the point of the
API); throughput is one Python worker per partition, so size
``n_partitions`` to the cluster.  For bulk numeric generation prefer
``spark.range`` + Catalyst expressions, which stay JVM-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

_VOCAB = (
    "data spark table row column join filter scan shuffle batch stream "
    "window agg key value hash sort merge broadcast partition bucket "
    "token text corpus model train sample epoch loss grad"
).split()

_SCHEMA = "doc_id bigint, text string, n_tokens bigint"


def _lcg(x: int) -> int:
    return (x * 6364136223846793005 + 1442695040888963407) & 0x7FFFFFFFFFFFFFFF


def synth_doc(doc_id: int) -> tuple[int, str, int]:
    """The deterministic row function: doc_id -> (doc_id, text, n_tokens)."""
    x = _lcg(doc_id + 1)
    n_words = 5 + x % 60
    words = []
    for _ in range(n_words):
        x = _lcg(x)
        words.append(_VOCAB[x % len(_VOCAB)])
    return doc_id, " ".join(words), n_words


@dataclass
class _IdRange(InputPartition):
    start: int
    end: int


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.lo = 0
        self.hi = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def pushFilters(self, filters):
        """Absorb doc_id range/point predicates by narrowing [lo, hi);
        everything else is returned for Spark to evaluate post-scan.
        Absorbed filters are also returned (re-checking a range bound is
        free and keeps this logic trivially safe)."""
        for f in filters:
            if getattr(f, "attribute", None) == ("doc_id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
            yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.n_partitions, hi - lo or 1))
        step = (hi - lo + n - 1) // n if hi > lo else 1
        return [
            _IdRange(s, min(s + step, hi)) for s in range(lo, hi, step)
        ] or [_IdRange(lo, lo)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield synth_doc(i)


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return SyntheticCorpusReader(self.options)


def register_synthetic_corpus(spark) -> None:
    """Idempotent session registration.  Also enables Python-source
    filter pushdown (a runtime-settable conf, off by default in Spark
    4.1) so ``pushFilters`` is honored on ANY session, including a
    vanilla driver session that didn't go through ``get_session``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticCorpusDataSource)


# -- streaming variant ------------------------------------------------------


class SyntheticEventStreamReader(SimpleDataSourceStreamReader):
    """Offset-based synthetic event stream: each microbatch advances a
    monotone row counter by ``rows_per_batch``; rows are the same pure
    function of their index every time, so ``readBetweenOffsets`` (the
    recovery path Spark uses when replaying a batch from the offset log
    after a crash) reproduces a batch bit-for-bit -- the property that
    makes the source exactly-once-compatible downstream."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 10_000))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter([synth_doc(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_doc(i) for i in range(start["pos"], end["pos"])])


class SyntheticEventStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus_stream"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema):
        return SyntheticEventStreamReader(self.options)


def register_synthetic_corpus_stream(spark) -> None:
    spark.dataSource.register(SyntheticEventStreamDataSource)
