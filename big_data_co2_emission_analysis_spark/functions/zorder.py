"""Z-order (Morton) clustering keys: multi-dimensional data skipping
for parquet row-group statistics.

``sortWithinPartitions(col)`` clusters ONE column; a scan filtered on a
different column skips nothing.  Interleaving the bits of N normalized
columns into one sort key clusters ALL of them at once: rows close in
z-key are close in every dimension, so per-file / per-row-group min-max
ranges shrink in each dimension and a filter on ANY of the z-ordered
columns prunes.  This is the classic space-filling-curve layout
(Morton order, as popularized by lakehouse OPTIMIZE ZORDER BY), built
here from plain Catalyst bit expressions -- no UDF, fully codegen.

Recipe: ``zorder_write(df, path, cols)`` -- or compose by hand:
``add_zorder_key`` -> ``repartitionByRange("__zkey")`` ->
``sortWithinPartitions("__zkey")`` -> write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of N non-negative integer
    columns into one long: column i contributes its bit b at output
    position ``b * N + i``.  Pure static expression tree (N * bits
    shift/mask/or terms), whole-stage-codegen friendly."""
    n = len(cols)
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long")), b * n + i)
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(lambda a, x: a.bitwiseOR(x), terms)


def _rank(c: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Min-max normalize a numeric column into [0, 2^bits)."""
    span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
    scaled = ((c.cast("double") - mn) / span) * ((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def add_zorder_key(df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "__zkey") -> DataFrame:
    """Append the Morton key over ``cols``: per-column min/max comes
    from one lazy aggregate (broadcast back via crossJoin -- a scalar
    row, no driver collect), each column min-max-normalizes to ``bits``
    bits, and the bits interleave."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    ranks = [
        _rank(F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits) for c in cols
    ]
    out = with_bounds.withColumn(key_col, interleave_bits(ranks, bits))
    return out.drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the Morton key over ``cols``:
    range-partitioned (so files tile the curve, not hash-scatter it)
    and sorted within partitions (so row groups tile it too).  A later
    scan filtering on any of ``cols`` skips files/row-groups by their
    parquet min-max statistics."""
    keyed = add_zorder_key(df, cols, bits)
    parts = keyed.repartitionByRange(num_files, "__zkey") if num_files else keyed.repartitionByRange("__zkey")
    parts.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)
