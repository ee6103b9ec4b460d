"""Exact (order-independent) aggregation helpers.

Float addition is not associative: Spark sums a double column across 32
shuffle partitions in nondeterministic order, DuckDB sums it in one
thread -- the results differ in the last ULPs, which breaks value-hash
comparison against the oracle AND makes production runs nonreproducible
across cluster sizes.  Fix: accumulate in DECIMAL (exact), cast the
final value back to double.  At 100 TB this also removes run-to-run
jitter in financial-style rollups.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast to an exact decimal for associative accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """SUM in decimal space, surfaced as double (order-independent)."""
    return F.sum(dec(col, scale, precision)).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact-sum / count in double division (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale, precision)).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
