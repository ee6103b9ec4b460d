"""Incremental aggregate maintenance: merge a delta into a
materialized rollup instead of recomputing from scratch.

At 100 TB the daily-report query cannot re-scan all of history; the
standard fix is a materialized partial aggregate that each new
partition MERGES into.  That works exactly when the aggregate state is
a commutative monoid -- counts and sums add, mins/maxes combine, and
avg is carried as (sum, count) and finalized at read time.  This module
implements that contract with plain DataFrame ops:

- ``partial_agg``: fold raw rows into mergeable state (one shuffle).
- ``merge_partials``: combine any number of state tables (union + one
  re-aggregation shuffle over the -- tiny -- state rows, never the raw
  data).
- ``finalize``: derive non-mergeable outputs (avg) from state.

Associativity + commutativity give the load-bearing property
``merge(partial(A), partial(B)) == partial(A union B)`` for ANY split
of the data -- the registry query's oracle pins exactly that, and the
hypothesis test replays random splits.

The reference recomputes everything per run (its dataset is 264 rows);
this is engine extension surface for the pipeline loop, the batch
mirror of what Structured Streaming's stateful aggregation does with
its state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries._exact import fx, unfx

#: state columns appended per measure m: m__cnt, m__sum (micro-units),
#: m__min, m__max
_STATE_SUFFIXES = ("__cnt", "__sum", "__min", "__max")


def partial_agg(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Fold raw rows into per-key mergeable state.  Sums are fixed-point
    int64 (exact, associative -- see queries/_exact.py), so merging in
    any order yields identical state."""
    aggs = []
    for m in measures:
        aggs += [
            F.count(m).alias(f"{m}__cnt"),
            F.sum(fx(m)).alias(f"{m}__sum"),
            F.min(m).alias(f"{m}__min"),
            F.max(m).alias(f"{m}__max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Combine state tables: counts/sums add, mins/maxes combine.  The
    shuffle is over state rows (|keys| cardinality), not raw data."""
    if not states:
        raise ValueError("need at least one state table")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    state_cols = [c for c in merged.columns if c not in keys]
    aggs = []
    for c in state_cols:
        if c.endswith("__cnt") or c.endswith("__sum"):
            aggs.append(F.sum(c).alias(c))
        elif c.endswith("__min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("__max"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"not a mergeable state column: {c}")
    return merged.groupBy(*keys).agg(*aggs)


def finalize(state: DataFrame, measures: list[str]) -> DataFrame:
    """Read-time outputs from state: count, exact sum, min, max, and
    avg = sum/count (well-defined only here, never merged directly)."""
    cols = [c for c in state.columns if not any(c.endswith(s) for s in _STATE_SUFFIXES)]
    out = []
    for m in measures:
        s = unfx(F.col(f"{m}__sum"))
        n = F.col(f"{m}__cnt")
        out += [
            n.alias(f"{m}_count"),
            s.alias(f"{m}_sum"),
            F.col(f"{m}__min").alias(f"{m}_min"),
            F.col(f"{m}__max").alias(f"{m}_max"),
            (s / n).alias(f"{m}_avg"),
        ]
    return state.select(*cols, *out)
