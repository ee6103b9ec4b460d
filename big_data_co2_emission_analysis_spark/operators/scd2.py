"""Slowly-changing-dimension type 2 (CDC history) without Delta's
MERGE INTO: anti-join + union + window, per the classic emulation
(pyspark guide "Common OLAP patterns": CDC/SCD2).

Model: a versioned dimension row is (keys..., attrs..., valid_from,
valid_to) with ``valid_to IS NULL`` marking the current version.

Scale shape: one window shuffle on the dimension key per operation;
closed history rows pass through untouched (no rewrite of cold
partitions).  With multiple updates per key in one batch, all of them
become versions chained in timestamp order -- same as replaying them
one at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Build a full SCD2 history from a change stream: each change
    becomes a version valid from its timestamp until the key's next
    change (lead window); the last version per key stays open
    (valid_to NULL).

    ``order_cols`` break timestamp ties deterministically (e.g. a
    change-sequence id); ties left unbroken make version order -- and
    therefore valid_to chaining -- nondeterministic.
    """
    order_by = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order_by)
    return changes.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead("valid_from").over(w)
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC update batch to an existing SCD2 dimension.

    Closed versions (valid_to set) pass through untouched; open
    versions union with the updates and re-chain per key, which both
    closes superseded versions and opens the new current ones.
    Replay-consistent: build(prefix) then apply(suffix) equals
    build(everything) -- asserted by the registry query's oracle.

    ``updates`` carries the same key/attr columns plus ``ts_col``
    (no valid_from/valid_to).
    """
    closed = dim.filter(F.col("valid_to").isNotNull())
    open_rows = dim.filter(F.col("valid_to").isNull()).drop("valid_from", "valid_to")
    combined = open_rows.unionByName(updates)
    return closed.unionByName(scd2_build(combined, key_cols, ts_col, order_cols))


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current snapshot: one open row per key."""
    return dim.filter(F.col("valid_to").isNull())
