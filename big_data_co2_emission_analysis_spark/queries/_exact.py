"""Exact (order-independent) aggregation helpers.

Float addition is not associative: Spark sums a double column across 32
shuffle partitions in nondeterministic order, DuckDB sums it in one
thread -- the results differ in the last ULPs, which breaks value-hash
comparison against the oracle AND makes production runs nonreproducible
across cluster sizes.  Fix: accumulate in DECIMAL (exact), cast the
final value back to double.  At 100 TB this also removes run-to-run
jitter in financial-style rollups.

QUANTIZATION CAVEAT: the decimal cast happens on each INPUT value, so
every value is rounded to ``scale`` decimal places BEFORE summing --
the result is the exact sum of rounded inputs, not the rounded exact
sum (worst-case drift 0.5 * 10^-scale per row).  For price-like TPC-H
columns (2 genuine decimal digits) scale=2 is lossless.  For generic
double columns (e.g. ``events.value``) the default is scale=6, which
bounds drift at 5e-7 per row; pass an explicit ``scale`` to tune the
trade (higher scale = less quantization, fewer integer digits before
overflow: precision 24 / scale 6 leaves 18 integer digits of headroom
-- ample for 1e12-row sums of 1e6-sized values).  The SQL mirrors must
use the SAME (precision, scale) or the oracle comparison breaks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default accumulation type: generic doubles (see module docstring)
PRECISION, SCALE = 24, 6


def dec(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """Cast to an exact decimal for associative accumulation (rounds
    the value to ``scale`` decimal places -- see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """SUM in decimal space, surfaced as double (order-independent;
    inputs quantized to ``scale`` dp)."""
    return F.sum(dec(col, scale, precision)).cast("double")


def davg(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """Exact-sum / count in double division (deterministic; inputs
    quantized to ``scale`` dp)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale, precision)).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
