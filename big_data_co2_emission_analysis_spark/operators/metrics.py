"""Pipeline observability via ``Dataset.observe``: named metrics
collected DURING an action, for free -- no second scan, no extra job.

At 100 TB a separate ``df.count()`` / null-audit pass costs another
full read; ``observe`` computes the aggregates inside the same
whole-stage-codegen pass that produces the output, and ships them to
the driver on action completion.  This is the production pattern for
row-count reconciliation, null-rate alerts, and freshness gauges on
write jobs (batch here; the streaming twin surfaces through
``StreamingQueryProgress.observedMetrics``).

No oracle entry: metrics are an action side-channel, not a result
DataFrame -- semantics are pinned by tests/test_metrics.py, which
asserts the observed values equal an independent aggregate of the same
input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_metrics(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation | None]:
    """Attach named aggregate ``metrics`` to ``df``'s next action.

    Batch: returns (df, observation); read ``observation.get`` AFTER
    an action on the returned DataFrame completes (it blocks until
    then).  Streaming: ``Observation`` objects are batch-only, so the
    metrics attach under the string ``name`` and the returned
    observation is None -- read them per microbatch from
    ``StreamingQueryProgress.observedMetrics[name]``.
    """
    if not metrics:
        raise ValueError("metrics must be non-empty")
    cols = [c.alias(n) for n, c in metrics.items()]
    if df.isStreaming:
        return df.observe(name, *cols), None
    obs = Observation(name)
    return df.observe(obs, *cols), obs


def observe_row_health(
    df: DataFrame, name: str = "row_health", columns: list[str] | None = None
) -> tuple[DataFrame, Observation | None]:
    """The standard write-job health block: total row count plus a
    null count per column (all computed inside the action's own scan).

    ``columns`` defaults to every top-level column of ``df``.  On a
    streaming DataFrame the observation is None (read the metrics from
    StreamingQueryProgress.observedMetrics -- see
    :func:`observe_metrics`).
    """
    cols = columns if columns is not None else df.columns
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in cols:
        metrics[f"n_null_{c}"] = F.sum(F.col(c).isNull().cast("long"))
    return observe_metrics(df, name, metrics)
