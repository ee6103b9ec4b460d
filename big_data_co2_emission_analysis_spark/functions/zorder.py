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


def _depth_rank(df: DataFrame, col: str, bits: int, rel_err: float = 0.001) -> Column:
    """Equi-depth rank in [0, 2^bits) from an ``approxQuantile`` probe
    (bounded control plane, skew-robust -- min-max normalization
    collapses when one hot value owns most of the range).  The rank is
    a fold over the boundary literals: O(2^bits) per row, so pair it
    with a small ``bits`` (64 buckets is plenty for file skipping)."""
    n = 1 << bits
    qs = df.stat.approxQuantile(col, [i / n for i in range(1, n)], rel_err)
    boundaries = F.array(*[F.lit(float(q)) for q in qs])
    v = F.col(col).cast("double")
    return F.aggregate(
        boundaries,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
    )


def add_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_col: str = "__zkey",
    method: str = "minmax",
) -> DataFrame:
    """Append the Morton key over ``cols``.  ``method='minmax'``
    (default): per-column min/max from one lazy aggregate (broadcast
    back via crossJoin -- a scalar row, no driver collect), each column
    min-max-normalizes to ``bits`` bits.  ``method='depth'``: equi-depth
    ranks from an approxQuantile probe per column (skew-robust; use
    small ``bits``, see ``_depth_rank``)."""
    if method == "depth":
        ranks = [_depth_rank(df, c, bits) for c in cols]
        return df.withColumn(key_col, interleave_bits(ranks, bits))
    if method != "minmax":
        raise ValueError(f"unknown zorder rank method: {method!r}")
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
    method: str = "minmax",
) -> None:
    """Write ``df`` clustered on the Morton key over ``cols``:
    range-partitioned (so files tile the curve, not hash-scatter it)
    and sorted within partitions (so row groups tile it too).  A later
    scan filtering on any of ``cols`` skips files/row-groups by their
    parquet min-max statistics."""
    keyed = add_zorder_key(df, cols, bits, method=method)
    parts = keyed.repartitionByRange(num_files, "__zkey") if num_files else keyed.repartitionByRange("__zkey")
    parts.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)


def candidate_files(path: str, box: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(files a box predicate must open, total files) from parquet
    footer min/max statistics -- the same pruning decision a
    stats-aware reader (Spark's parquet row-group filter, lakehouse
    file skipping) makes.  A file is a candidate iff EVERY predicate
    column's [min, max] intersects its interval; a column without
    footer stats cannot be pruned on (treated as intersecting)."""
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, e)
        for e in os.listdir(path)
        if e.endswith(".parquet") and not e.startswith(("_", "."))
    )
    n_candidates = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo: dict[str, float] = {}
        hi: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                name = c.path_in_schema
                if name in box and c.statistics is not None:
                    lo[name] = min(lo.get(name, float("inf")), c.statistics.min)
                    hi[name] = max(hi.get(name, float("-inf")), c.statistics.max)
        if all(
            name not in lo or not (hi[name] < b_lo or lo[name] > b_hi)
            for name, (b_lo, b_hi) in box.items()
        ):
            n_candidates += 1
    return n_candidates, len(files)
