"""Z-order (Morton-curve) data layout: multi-dimensional file skipping.

A single sort key gives tight per-file min/max statistics for ONE
column; range predicates on any other column must open every file.
Z-ordering interleaves the bits of several columns' bucket ranks so
rows close in the multi-dimensional space land in the same files --
per-file min/max footers then stay tight on EVERY participating
column, and a box predicate prunes most files at planning/reader time
(parquet row-group stats).  This is the lakehouse layout optimization
(Delta OPTIMIZE ZORDER BY, Iceberg sort orders) re-expressed with
stock DataFrame ops.

Scale shape: one bounded control-plane pass per column (global min/max
aggregate, or an ``approxQuantile`` probe for equi-depth buckets), then
a single ``repartitionByRange`` exchange on the z-value and a
partition-local sort -- no driver data movement, no extra shuffle
beyond the one any layout rewrite needs.  The z-value itself is pure
native bit arithmetic (shiftleft/shiftright/bitwiseOR), whole-stage
codegen'd, O(bits x dims) per row.

The reference (a 264-row CSV pipeline) has no layout surface; this is
part of the engine's 100 TB extension, alongside the bucketed write
sink (sources/writers.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _width_buckets(df: DataFrame, col: str, bits: int) -> Column:
    """Uniform-width bucket rank in [0, 2**bits): O(1) per row from a
    single global min/max control-plane aggregate."""
    n = 2**bits
    row = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None or hi <= lo:
        return F.lit(0)
    scaled = (F.col(col).cast("double") - F.lit(lo)) / F.lit(hi - lo)
    return F.least(
        F.lit(n - 1), F.greatest(F.lit(0), F.floor(scaled * n).cast("int"))
    )


def _depth_buckets(df: DataFrame, col: str, bits: int, rel_err: float = 0.001) -> Column:
    """Equi-depth bucket rank in [0, 2**bits) from an ``approxQuantile``
    probe (bounded k-quantile control plane; robust to skew, which
    uniform-width buckets are not).  The rank is computed with a fold
    over the boundary array -- O(2**bits) per row, so keep ``bits``
    small (the default 6 = 64 buckets is plenty for file skipping)."""
    n = 2**bits
    qs = df.stat.approxQuantile(col, [i / n for i in range(1, n)], rel_err)
    boundaries = F.array(*[F.lit(float(q)) for q in qs])
    v = F.col(col).cast("double")
    return F.aggregate(
        boundaries,
        F.lit(0),
        lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
    )


def zvalue(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each bucket rank into one
    Morton code (dimension 0 owns the least-significant interleaved
    bit).  Native shift/and/or only -- no UDF."""
    ndims = len(bucket_cols)
    out: Column = F.lit(0).cast("long")
    for i in range(bits):
        for d, b in enumerate(bucket_cols):
            bit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * ndims + d))
    return out


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 32,
    bits: int = 6,
    method: str = "depth",
) -> None:
    """Rewrite ``df`` to ``path`` as ``n_files`` parquet files laid out
    along the Z-curve of ``cols``.  ``method='depth'`` (default) buckets
    each column equi-depth via an approxQuantile probe -- skew-robust;
    ``'width'`` uses uniform-width buckets from a min/max aggregate
    (O(1) per row, fine for ~uniform keys).  The data itself is
    untouched (layout-only; round-trip equality is oracle-checked by
    ``zorder_lineitem_roundtrip``)."""
    if method == "depth":
        buckets = [_depth_buckets(df, c, bits) for c in cols]
    elif method == "width":
        buckets = [_width_buckets(df, c, bits) for c in cols]
    else:
        raise ValueError(f"unknown bucket method: {method!r}")
    (
        df.withColumn("__z", zvalue(buckets, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def candidate_files(path: str, box: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(files the box predicate must open, total files) from parquet
    footer min/max statistics -- the same pruning decision a stats-aware
    reader (Spark's parquet row-group filter, Delta/Iceberg file
    skipping) makes.  A file is a candidate iff EVERY predicate
    column's [min, max] intersects its interval."""
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
        # a column without footer stats cannot be pruned on -- the file
        # must be opened (treat as intersecting)
        if all(
            name not in lo or not (hi[name] < b_lo or lo[name] > b_hi)
            for name, (b_lo, b_hi) in box.items()
        ):
            n_candidates += 1
    return n_candidates, len(files)
