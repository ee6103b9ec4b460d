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
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Parquet sink.  ``partition_by`` yields partition-pruned reads for
    downstream consumers; ``max_records_per_file`` caps file size so a
    1000-executor read parallelizes; ``sort_within_partitions``
    clusters rows so parquet row-group min/max statistics become
    selective -- point/range reads on the sort key then skip whole row
    groups (a no-shuffle local sort, the poor man's Z-order)."""
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-partitioned into
    ``num_buckets`` files by ``bucket_cols`` at WRITE time, so a join
    or aggregation on those keys later runs with NO shuffle exchange
    (both sides arrive pre-partitioned; sort_cols additionally
    pre-sorts for sort-merge joins).

    This is the pay-once-shuffle-many-times primitive for a 100 TB
    fact table joined repeatedly on the same key.  Plan proof:
    tests/test_sinks.py asserts the bucketed-join plan has no
    Exchange.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def to_pandas_cached(df: DataFrame):
    """Arrow-backed collect for the pandas/plot tail.

    The reference calls ``toPandas()`` twice back-to-back with no cache,
    re-running the whole lineage (reference project-co2.py:123-124).
    Callers that collect more than once should ``df.cache()`` first;
    this helper simply documents the contract and keeps Arrow on.
    """
    return df.toPandas()


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes``-sized files (the long-running-pipeline
    housekeeping job -- streaming sinks and per-batch appends strew
    thousands of tiny files, and at 100 TB the resulting file-listing +
    task-scheduling overhead dominates reads).

    Sizing uses the CURRENT on-disk bytes, so compression ratio carries
    over; ``sort_cols`` re-clusters rows during the rewrite so row-group
    min/max statistics become selective again.  The rewrite lands in a
    sibling directory and swaps in with two renames (crash before the
    final rename leaves the original intact).

    Returns {files_before, files_after, bytes, rows}.
    """
    import math
    import os
    import shutil

    def _stats(p: str) -> tuple[int, int]:
        n = b = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b

    files_before, total_bytes = _stats(path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    rows = df.count()
    out = df.repartition(n_out)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp, old = path.rstrip("/") + ".compacting", path.rstrip("/") + ".old"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after, _ = _stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
        "rows": rows,
    }


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink -- same layout levers as :func:`write_parquet` (ORC
    keeps stripe-level min/max indexes, so ``partition_by`` plus sorted
    input gives the same pruning story as parquet row groups)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = "gzip",
    escape: str | None = None,
) -> None:
    """CSV sink -- the write twin of the reference's CSV-centric input
    surface (sources/readers.py read_csv; the reference itself never
    writes).  For interchange/export only: CSV carries no schema, no
    column statistics, and no predicate pushdown, so anything read back
    for analytics belongs in parquet.  ``escape`` mirrors the
    reference's ``escape="@"`` read option (SURVEY.md S2)."""
    writer = df.write.mode(mode).option("header", str(header).lower())
    if compression:
        writer = writer.option("compression", compression)
    if escape:
        writer = writer.option("escape", escape)
    writer.csv(path)


def write_xml(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    row_tag: str = "row",
    root_tag: str = "rows",
) -> None:
    """XML sink (Spark 4 built-in).  Interchange-only, like CSV: no
    schema, no statistics, no pushdown on re-read -- exists because
    enterprise feeds still speak XML, not because anything analytical
    should."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-lines sink (write twin of read_jsonl): one JSON object per
    line, the interchange format of LLM-corpus tooling.  Nested
    structs/arrays/maps serialize naturally -- the reason to prefer it
    over CSV for document exports."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
