"""Snapshot reconciliation: keyed diff of two table versions.

Pipelines that re-materialize a table every run (dim refresh, backfill,
re-crawl) need to answer "what changed?" without hand-written SQL: rows
added, rows removed, rows whose compared columns changed, rows
untouched.  This is one FULL OUTER join on the key -- a single shuffle,
co-partitioned on both sides, no driver-side state -- so it scales to
any table Spark can join.

Null semantics: compared columns use null-safe equality (``<=>``), so
NULL -> NULL is *unchanged* while NULL -> value is *changed* -- the
semantics a CDC consumer expects.  Keys are assumed non-null and unique
per snapshot (the usual primary-key contract; duplicate keys make
"changed" ill-defined in any diff tool).

The reference never compares snapshots (it reads one CSV once); this is
engine extension surface for the 100 TB pipeline loop, and the
read-side complement of the SCD2 writer in ``operators/scd2.py`` --
``snapshot_diff``'s added/changed/removed rows are exactly an SCD2
update batch.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff: one row per key present in either snapshot, with
    ``diff_status`` in {'added', 'removed', 'changed', 'unchanged'},
    the key columns, and ``<col>_old`` / ``<col>_new`` for each compared
    column.  ``compare_cols`` defaults to all shared non-key columns."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"_ko_{k}") == F.col(f"_kn_{k}") for k in key_cols],
    )
    same = (
        reduce(
            lambda x, y: x & y,
            [F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")) for c in compare_cols],
        )
        if compare_cols
        else F.lit(True)
    )
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return (
        o.join(n, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
                for k in key_cols
            ],
            status.alias("diff_status"),
            *[c for pair in compare_cols for c in (f"{pair}_old", f"{pair}_new")],
        )
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate of :func:`snapshot_diff`: row counts per
    ``diff_status`` -- the one-line healthcheck a pipeline logs per run
    (map-side combine collapses the diff before the final tiny shuffle)."""
    return (
        snapshot_diff(old, new, key_cols, compare_cols)
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("diff_status")
    )
