"""Physical-plan inspection utilities: the scale guardrails.

A query that is correct at sf0.01 but loses its filter pushdown or
broadcasts the wrong side is a 100x regression at 100 TB.  These
helpers parse ``explain("formatted")`` output so tests can assert the
plan *shape*, not just the results (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every parquet scan in the plan --
    the columns that actually hit storage (column pruning check)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in explain_formatted(df).splitlines()
        if "ReadSchema:" in line
    ]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan (predicate pushdown check)."""
    out = []
    for line in explain_formatted(df).splitlines():
        if "PushedFilters:" in line:
            out.append(line.split("PushedFilters:", 1)[1].strip())
    return out


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Assert some scan received a pushed filter containing fragment."""
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"filter fragment {fragment!r} not pushed to any scan; pushed: {filters}"
    )


def assert_columns_pruned(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """Assert the scan whose schema mentions ``table_hint`` reads at
    most ``max_cols`` columns."""
    for schema in scan_read_schemas(df):
        if table_hint in schema:
            n = schema.count(":")
            assert n <= max_cols, f"scan reads {n} cols (> {max_cols}): {schema}"
            return
    raise AssertionError(f"no scan matching {table_hint!r}; schemas: {scan_read_schemas(df)}")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges) --
    the metric to minimize; every one is a full network/disk cycle at
    cluster scale."""
    plan = explain_formatted(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") is False
        and "Exchange" in line
        and "BroadcastExchange" not in line
        and line.strip().startswith(("+-", ":-", "Exchange"))
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def has_take_ordered(df: DataFrame) -> bool:
    """True when orderBy+limit planned as TakeOrderedAndProject (heap
    per partition + driver merge) instead of a global sort."""
    return "TakeOrderedAndProject" in explain_formatted(df)


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of whole-stage-codegen spans (wider is better: more of
    the plan runs as fused JVM loops).  Under AQE the codegen ids only
    appear in the *final* adaptive plan, so by default this triggers
    execution first."""
    if execute:
        # collect THIS DataFrame: count() would build a separate query
        # execution and leave this adaptive plan unfinalized
        df.collect()
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators carry a "*(N)" stage prefix in the plan tree
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
