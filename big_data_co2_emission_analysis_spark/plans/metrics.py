"""Executed-plan metrics: the quantitative feedback loop behind the
wall-clock numbers in bench.py.

``collect_metrics`` executes a DataFrame and walks the final adaptive
plan's SQL metrics, aggregating the ones that decide scale behavior:
rows/bytes scanned (is pruning working?), shuffle bytes written (is
the plan shuffling more than the data requires?), and spill bytes
(are partitions sized to memory?).  Use when tuning an operator:

    from big_data_co2_emission_analysis_spark.plans.metrics import collect_metrics
    m = collect_metrics(df)
    # {'output_rows_scan': ..., 'bytes_scanned': ...,
    #  'shuffle_bytes_written': ..., 'shuffle_bytes_read': ...,
    #  'spill_bytes': ..., 'n_rows': ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: metric-name fragments -> aggregate key
_METRIC_KEYS = {
    "number of output rows": "output_rows_total",
    # file-scan bytes ("size of files read" on Scan nodes) kept strictly
    # separate from shuffle-read traffic ("remote/local bytes read" on
    # shuffle readers): bytes_scanned answers "is pruning working?",
    # shuffle_bytes_read answers "is the plan moving too much?"
    "size of files read": "bytes_scanned",
    "bytes read": "shuffle_bytes_read",
    "shuffle bytes written": "shuffle_bytes_written",
    "spill size": "spill_bytes",
}


def _walk(node, out: dict) -> None:
    name = node.nodeName()
    metrics = node.metrics()
    it = metrics.iterator()
    while it.hasNext():
        kv = it.next()
        metric = kv._2()
        label = metric.name().toString() if hasattr(metric.name(), "toString") else str(metric.name())
        for frag, key in _METRIC_KEYS.items():
            if frag not in label:
                continue
            if key == "bytes_scanned" and "Scan" not in name:
                continue
            out[key] = out.get(key, 0) + metric.value()
            if key == "output_rows_total" and "Scan" in name:
                out["output_rows_scan"] = out.get("output_rows_scan", 0) + metric.value()
    # children, or -- for leaf-looking AQE wrappers whose subtree hides
    # behind an accessor (AdaptiveSparkPlan.executedPlan,
    # QueryStageExec.plan) -- the unwrapped plan.  Unwrapping only when
    # children() is empty keeps the walk acyclic and single-visit.
    ch = node.children()
    if ch.size() > 0:
        it = ch.iterator()
        while it.hasNext():
            _walk(it.next(), out)
        return
    for method in ("executedPlan", "plan"):
        if hasattr(node, method):
            try:
                _walk(getattr(node, method)(), out)
                return
            except Exception:
                pass


def collect_metrics(df: DataFrame) -> dict:
    """Execute ``df`` and return aggregated runtime metrics."""
    rows = df.collect()
    out: dict = {"n_rows": len(rows)}
    plan = df._jdf.queryExecution().executedPlan()
    _walk(plan, out)
    return out


def observe_quality(
    df: DataFrame, name: str = "quality", **metric_exprs
) -> tuple[DataFrame, "ObservationHandle"]:
    """In-flight data-quality metrics via ``df.observe``: the metric
    expressions (any aggregate over the observed node's rows) are
    computed DURING the job that consumes ``df`` -- zero extra jobs,
    zero extra scans, unlike a separate ``df.agg(...).collect()`` which
    re-executes lineage.  This is the production pattern for pipeline
    health counters (null rates, row counts, value bounds) on a 100 TB
    run where a second pass is unaffordable.

    Returns ``(observed_df, handle)``; run any action on a descendant
    of ``observed_df``, then read ``handle.get()``.

    Example::

        df2, h = observe_quality(df, rows=F.count(F.lit(1)),
                                 null_keys=F.count_if(F.col("k").isNull()))
        df2.write.format("noop").mode("overwrite").save()
        h.get()  # {'rows': ..., 'null_keys': ...}
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[expr.alias(k) for k, expr in metric_exprs.items()])
    return observed, ObservationHandle(obs)


class ObservationHandle:
    """Thin wrapper so callers don't import pyspark's Observation."""

    def __init__(self, obs) -> None:
        self._obs = obs

    def get(self) -> dict:
        """Blocks until the observed job finishes; returns the metrics."""
        return dict(self._obs.get)
