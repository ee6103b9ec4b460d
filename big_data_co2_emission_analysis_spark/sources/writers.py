"""Sinks (reference SURVEY.md section 2.1, S4-S8 + the Parquet writer the
reference lacks).

The reference's only outputs are ``show()`` / ``printSchema()`` /
``toPandas()`` / matplotlib PNGs -- no ``df.write`` anywhere.  At scale
the checkpointable sink is Parquet (optionally partitioned); console and
pandas sinks remain for interactive use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink.  ``partition_by`` yields partition-pruned reads for
    downstream consumers; ``max_records_per_file`` caps file size so a
    1000-executor read parallelizes."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def to_pandas_cached(df: DataFrame):
    """Arrow-backed collect for the pandas/plot tail.

    The reference calls ``toPandas()`` twice back-to-back with no cache,
    re-running the whole lineage (reference project-co2.py:123-124).
    Callers that collect more than once should ``df.cache()`` first;
    this helper simply documents the contract and keeps Arrow on.
    """
    return df.toPandas()
