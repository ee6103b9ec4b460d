"""Named-query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md section 2 gets a named entry:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string over the
same parquet tables.  The driver hash-compares the two at sf0.01.

Determinism rules every query here follows:

- Sums over ``double`` columns are computed in DECIMAL and cast back to
  double (`see _exact.py`) -- float addition is not associative, so a
  32-partition Spark sum and a single-threaded DuckDB sum would differ
  in the last bits otherwise.
- Averages are derived as exact-decimal-sum / count in double division.
- Timestamps/dates in outputs are formatted to strings (Spark session
  TZ is pinned UTC) so naive-vs-aware comparison artifacts can't bite.
- Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    """Import all query modules and return the registry."""
    # Imports deferred so registration happens exactly once on first use.
    from . import (  # noqa: F401
        advanced,
        co2_shaped,
        mlops,
        multimodal_queries,
        profiling_queries,
        relational,
        streaming_queries,
        text_queries,
        timeseries_queries,
        tpch_shapes,
        tpch_suite,
        vector_queries,
    )

    return dict(_REGISTRY)
