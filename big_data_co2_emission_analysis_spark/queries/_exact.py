"""Exact (order-independent) aggregation helpers.

Float addition is not associative: Spark sums a double column across 32
shuffle partitions in nondeterministic order, DuckDB sums it in one
thread -- the results differ in the last ULPs, which breaks value-hash
comparison against the oracle AND makes production runs nonreproducible
across cluster sizes.  Fix: quantize each value to ``scale`` decimal
places as a 64-bit integer ("micro-units"), sum the integers (exact,
associative, codegen-friendly), and divide back to double at the end.

This fixed-point path replaced the round-1 DECIMAL(24,6) accumulation:
a BigDecimal add per row made decimal sums ~6x slower than double sums
at sf0.1 (measured: 1.7 s vs 0.28 s for a 600k-row 5-aggregate
groupBy), while a long sum runs at whole-stage-codegen speed and is
equally exact.

QUANTIZATION CAVEAT (same as the decimal path): each INPUT value is
rounded half-away-from-zero to ``scale`` decimal places BEFORE summing,
so the result is the exact sum of rounded inputs, not the rounded exact
sum (worst-case drift 0.5 * 10^-scale per row).  For price-like TPC-H
columns (2 genuine decimal digits) any scale >= 2 is lossless; for
generic double columns the default scale=6 bounds drift at 5e-7 per
row.  The SQL mirror must use the SAME scale or the oracle comparison
breaks.

OVERFLOW BOUND: the micro-unit sum must fit in int64, i.e.
|sum| < 2^63 / 10^scale  (9.2e12 at scale 6, 9.2e16 at scale 2).
Spark runs ANSI mode, so exceeding it raises ARITHMETIC_OVERFLOW
rather than wrapping -- a loud failure, never a wrong answer.  For
rollups beyond that bound (e.g. planetary-scale revenue in micro-units)
use :func:`dsum_decimal`, the retained BigDecimal path, which trades
the 6x hot-loop cost for 38 digits of headroom.  Past 2^53 micro-units
the final long->double cast rounds, but both engines round the same
IEEE-754 way, so cross-engine determinism survives.

Cross-engine rounding: both sides compute the SAME double expression
``x * 10^scale``, nudge it half away from zero, and truncate toward
zero -- Spark via ANSI ``CAST(.. AS LONG)``, DuckDB via
``CAST(TRUNC(..) AS BIGINT)`` (DuckDB's bare double->BIGINT cast
*rounds*, so the explicit TRUNC is load-bearing).  Identical IEEE ops
on identical inputs give identical integers on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default scale: generic doubles (see module docstring)
PRECISION, SCALE = 24, 6


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- fixed-point building blocks -------------------------------------------


def fx(col: Column | str, scale: int = SCALE) -> Column:
    """Quantize a double to micro-units: round(x * 10^scale) half away
    from zero, as a 64-bit long (ANSI cast truncates toward zero)."""
    scaled = _as_col(col) * F.lit(float(10**scale))
    return (scaled + F.signum(scaled) * F.lit(0.5)).cast("long")


def unfx(col: Column, scale: int = SCALE) -> Column:
    """Micro-unit long sum back to double units."""
    return col.cast("double") / F.lit(float(10**scale))


def sql_fx(expr: str, scale: int = SCALE) -> str:
    """DuckDB-side mirror of :func:`fx` (TRUNC is load-bearing: DuckDB's
    double->BIGINT cast rounds, Spark's ANSI cast truncates)."""
    s = f"1e{scale}"
    return f"CAST(TRUNC(({expr}) * {s} + SIGN(({expr}) * {s}) * 0.5) AS BIGINT)"


def spark_sql_fx(expr: str, scale: int = SCALE) -> str:
    """Spark-SQL-text mirror of :func:`fx` for queries written as
    ``spark.sql(...)`` strings (Spark's TRUNC is date-only; the bare
    ANSI CAST truncates numerics toward zero)."""
    s = f"1e{scale}"
    return f"CAST(({expr}) * {s} + SIGN(({expr}) * {s}) * 0.5 AS LONG)"


# -- aggregate helpers ------------------------------------------------------


def dsum(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """SUM in fixed-point int64 space, surfaced as double
    (order-independent; inputs quantized to ``scale`` dp; ``precision``
    kept for API compatibility, unused on the fixed-point path)."""
    return unfx(F.sum(fx(col, scale)), scale)


def davg(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """Exact fixed-point sum / count in double division (deterministic;
    inputs quantized to ``scale`` dp)."""
    c = _as_col(col)
    return unfx(F.sum(fx(c, scale)), scale) / F.count(c)


def sql_dsum(expr: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    """DuckDB-side mirror of :func:`dsum`.  Parenthesized so the result
    composes safely inside larger expressions (``sql_dsum(a) /
    sql_dsum(b)`` must not chain-divide by ``1e{scale}`` twice)."""
    return f"(CAST(SUM({sql_fx(expr, scale)}) AS DOUBLE) / 1e{scale})"


def sql_davg(expr: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    """DuckDB-side mirror of :func:`davg` (parenthesized, same reason
    as :func:`sql_dsum`)."""
    return f"(CAST(SUM({sql_fx(expr, scale)}) AS DOUBLE) / 1e{scale} / COUNT({expr}))"


# -- decimal fallback (ultra-scale headroom) --------------------------------


def dec(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """Cast to an exact decimal for associative accumulation (rounds
    the value to ``scale`` decimal places).  The BigDecimal path: ~6x
    slower per row than :func:`fx`, but 38 digits of headroom."""
    return _as_col(col).cast(f"decimal({precision},{scale})")


def dsum_decimal(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """SUM in decimal space, surfaced as double -- use when the
    micro-unit sum could exceed 2^63 (see module docstring)."""
    return F.sum(dec(col, scale, precision)).cast("double")


def sql_dsum_decimal(expr: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    """DuckDB-side mirror of :func:`dsum_decimal`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
