"""Column-pruning pins: expressions that keep named columns alive in a
plan branch so sibling subtrees canonicalize identically and AQE stage
reuse can fire.

The problem (first hit in operators/substrings.py, see SCALING.md
round-8): a stream with two consumers -- e.g. an aggregate and a join
probe over the same explicitly-repartitioned frame -- only shares ONE
exchange when both subtrees canonicalize equal.  Column pruning
narrows the aggregate branch to its grouping keys (``count(1)``
references nothing else), the subtrees diverge, and the corpus-sized
exchange (plus everything below it: scan, tokenize, explode) is paid
once per consumer.

``pinned_count(cols)`` is ``count(*)`` that REFERENCES the given
columns through an always-true-but-unprovable predicate, so pruning
cannot drop them:

    count(CASE WHEN pmod(xxhash64(cols...), 1) = 0 THEN 1 END)

``xxhash64`` is never null (null inputs hash to the seed), ``pmod(x,
1)`` is always 0, so the CASE yields 1 for every row -- exactly
``count(*)`` -- but Catalyst has no rule proving ``pmod(x, 1) = 0``,
so the hash's inputs stay referenced.  A plain non-nullable argument
does NOT survive (Catalyst rewrites ``count(<non-null expr>)`` back to
``count(1)`` and prunes).  Cost: one hash per row, noise next to the
exchange it deduplicates.

Cross-engine note: oracles replay this as plain ``COUNT(*)`` -- the
pin changes the plan, never the value.

Spark-version dependency: verified against Spark 4.1.2.  The pin works
only while Catalyst has no simplification rule for ``pmod(x, 1) = 0``;
an upgrade that adds one silently re-splits the sibling subtrees (values
stay correct, the exchange-reuse perf win vanishes).
``tests/test_plans.py::test_pinned_count_survives_optimizer`` is the
direct canary -- if it fails after a Spark upgrade, this module is the
cause.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _probe(cols: list[Column | str]) -> Column:
    if not cols:
        raise ValueError("pinning needs at least one column to pin")
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*exprs), F.lit(1))


def pinned_count(cols: list[Column | str]) -> Column:
    """``count(*)`` that keeps ``cols`` referenced in this branch (see
    module docstring).  ``cols`` must be non-empty."""
    return F.count(F.when(_probe(cols) == 0, F.lit(1)))


def pinned_filter(cols: list[Column | str]) -> Column:
    """An always-true filter predicate that keeps ``cols`` referenced.

    Use on a branch that consumes only SOME of a shared frame's columns
    (e.g. a global aggregate over one column of a shared aggregate's
    output): without the pin, column pruning rewrites the shared parent
    for just this consumer and the subtrees stop canonicalizing equal."""
    return _probe(cols) == 0
