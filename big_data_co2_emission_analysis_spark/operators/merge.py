"""MERGE INTO semantics (Delta/Iceberg-style upsert) as a pure
DataFrame transform: one full-outer shuffle join on the merge keys,
then a row-wise CASE choosing update / insert / delete / keep.

The reference has no mutation surface at all (its pipeline is
read-only, SURVEY.md section 0: "no write-to-file data sink anywhere"),
but any table-maintenance pipeline needs MERGE; this is the batch
building block under the streaming CDC->SCD2 path (operators/scd2.py
keeps history; merge_upsert produces the flattened current-state
table).

Scale shape: ONE shuffle of each side on the merge keys (at 100 TB,
bucket the target on the keys and the exchange disappears on that
side); the per-row resolution is a codegen'd projection.  Duplicate
source keys are the classic silent-corruption hazard (Delta raises
`DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW`): policy 'error'
plants a distributed raise_error() guard -- no driver-side count
action -- and 'first' keeps one deterministic winner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DUP_POLICIES = ("error", "first", "assume_unique")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched_update: bool = True,
    when_not_matched_insert: bool = True,
    when_matched_delete: Column | None = None,
    on_duplicate_source: str = "error",
    order_dups_by: list[str] | None = None,
    null_safe_keys: bool = False,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``; returns the new
    target (same schema as ``target``).

    - matched + ``when_matched_delete`` true  -> row dropped;
    - matched (and ``when_matched_update``)   -> source values win;
    - source-only (and ``when_not_matched_insert``) -> row inserted;
    - target-only                             -> row kept unchanged.

    ``on_duplicate_source='error'`` fails the job if two source rows
    share a key (ambiguous merge -- the Delta behavior);
    ``'first'`` keeps the first by ``order_dups_by`` (required then,
    so the winner is deterministic, not partition-order luck);
    ``'assume_unique'`` skips the guard entirely -- the exchange-minimal
    scale path when uniqueness is guaranteed upstream (the guard embeds
    raise_error in the key column, which hides the key from alias
    tracking and costs one extra source-side exchange before the join).

    ``null_safe_keys=False`` (default) follows SQL/Delta MERGE: a NULL
    key never matches, so NULL-key source rows insert and NULL-key
    target rows persist.  ``True`` treats NULL as one joinable entity
    (entity-resolution merges) -- at the cost of an extra source-side
    exchange, because the null-safe join hashes ``coalesce``-wrapped
    keys and cannot reuse the dup-guard window's partitioning.
    """
    if on_duplicate_source not in DUP_POLICIES:
        raise ValueError(f"on_duplicate_source must be one of {DUP_POLICIES}")
    cols = target.columns
    if source.columns != cols:
        raise ValueError(
            f"source columns {source.columns} must match target columns {cols}"
        )

    if on_duplicate_source == "error":
        # the guard must live INSIDE a kept column -- a dropped helper
        # column would be pruned by Catalyst and never fire.  The first
        # key column is rewritten to raise when its key appears twice.
        wc = Window.partitionBy(*keys)
        k0 = keys[0]
        k0_type = dict(source.dtypes)[k0]
        guard_msg = F.concat(
            F.lit("merge_upsert: multiple source rows for key ("),
            F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
            F.lit(")"),
        )
        dup_cond = F.col("__dup") > 1
        if not null_safe_keys:
            # Under SQL/Delta semantics a NULL key never matches a
            # target row, so duplicate NULL-key source rows are NOT
            # ambiguous -- each simply inserts.  (Delta's error fires
            # only when multiple source rows match the same TARGET
            # row.)  Only all-non-null keys can match, so only they
            # arm the guard; with null_safe_keys=True NULL is a
            # joinable entity and stays guarded.
            non_null_keys = F.lit(True)
            for k in keys:
                non_null_keys = non_null_keys & F.col(k).isNotNull()
            dup_cond = dup_cond & non_null_keys
        src = source.withColumn("__dup", F.count("*").over(wc)).select(
            *[
                (
                    F.when(dup_cond, F.raise_error(guard_msg).cast(k0_type))
                    .otherwise(F.col(k0))
                    .alias(k0)
                    if c == k0
                    else F.col(c)
                )
                for c in cols
            ]
        )
    elif on_duplicate_source == "assume_unique":
        src = source
    else:
        if not order_dups_by:
            raise ValueError("on_duplicate_source='first' requires order_dups_by")
        wo = Window.partitionBy(*keys).orderBy(*order_dups_by)
        src = (
            source.withColumn("__rn", F.row_number().over(wo))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    t = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in cols],
        F.lit(True).alias("__in_t"),
    )
    s = src.select(
        *[F.col(c).alias(f"__s_{c}") for c in cols],
        F.lit(True).alias("__in_s"),
    )
    if null_safe_keys:
        cond = [t[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"]) for k in keys]
    else:
        cond = [t[f"__t_{k}"] == s[f"__s_{k}"] for k in keys]
    j = t.join(s, cond, "full_outer")

    in_t = F.coalesce(F.col("__in_t"), F.lit(False))
    in_s = F.coalesce(F.col("__in_s"), F.lit(False))
    matched = in_t & in_s

    # delete predicate evaluates over SOURCE values (the incoming
    # fact); build it with merge_source_col()
    if when_matched_delete is not None:
        keep = ~(matched & F.coalesce(when_matched_delete, F.lit(False)))
    else:
        keep = F.lit(True)

    use_source = (matched & F.lit(when_matched_update)) | (
        ~in_t & F.lit(when_not_matched_insert)
    )
    drop_unmatched_source = ~in_t & F.lit(not when_not_matched_insert)

    out_cols = [
        F.when(use_source, F.col(f"__s_{c}")).otherwise(F.col(f"__t_{c}")).alias(c)
        for c in cols
    ]
    return j.filter(keep & ~drop_unmatched_source).select(*out_cols)


def merge_source_col(name: str) -> Column:
    """Reference a SOURCE column inside a ``when_matched_delete``
    predicate (e.g. ``merge_source_col('status') == 'CANCELLED'``)."""
    return F.col(f"__s_{name}")
