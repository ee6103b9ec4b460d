"""Time-series resampling operators (the "hypertable rollup" family):
bucketed rollup, distributed gap-fill, LOCF / linear interpolation, and
time-weighted averages.

The reference has no time dimension at all (its years are column
NAMES, SURVEY.md section 1), but a training-data/metrics pipeline over
an events table needs the continuous-aggregate surface TimescaleDB-like
systems provide.  Everything here is expressed with native DataFrame
ops so Catalyst sees through it:

- the gap-fill SPINE (one row per key per bucket between that key's
  first and last observation) is ``sequence() + explode`` -- generated
  distributively next to each key's aggregate row, never a driver-side
  calendar loop;
- fills are per-key windows (``last(..., ignorenulls)`` /
  ``first(..., ignorenulls)``), which shuffle once on the key and scan
  sorted runs -- no self-joins, no per-gap subqueries;
- the interpolation arithmetic is plain column math (whole-stage
  codegen), bit-identical to the DuckDB oracle's.

Scale shape at 100 TB: one shuffle for the per-(key, bucket) rollup,
one for the per-key fill windows.  A single key's full bucket range
sorts within one task -- fine for realistic series (a decade of hourly
buckets is ~90k rows); for adversarially long single series, split the
fill window by (key, year) and stitch boundaries, documented in
SCALING.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FILL_METHODS = ("none", "locf", "linear")


def bucket_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    width: str,
    aggs: list[Column],
) -> DataFrame:
    """One row per (keys..., bucket) with ``aggs`` applied; ``bucket``
    is the truncated-to-``width`` timestamp (width: any
    ``date_trunc`` unit -- 'hour', 'day', 'week', ...)."""
    return (
        df.withColumn("bucket", F.date_trunc(width, F.col(ts_col)))
        .groupBy(*key_cols, "bucket")
        .agg(*aggs)
    )


def gap_fill(
    bucketed: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    step: str,
    value_col: str,
    method: str = "locf",
) -> DataFrame:
    """Densify a bucketed series: emit one row per key per ``step``
    between that key's first and last bucket, carrying ``value_col``
    from the observed rows and filling the generated gaps.

    - ``none``   -- gaps keep NULL (the densified spine itself);
    - ``locf``   -- last observation carried forward (leading gap NULL);
    - ``linear`` -- linear interpolation between the bracketing
      observations; gaps before the first / after the last observation
      stay NULL (every observed bucket keeps its exact value).

    Adds ``filled`` (the fill result) and ``observed`` (bool).  The
    spine generation is distributed: sequence()/explode over each
    key's [min, max] bucket range, no driver-side calendar.
    """
    if method not in FILL_METHODS:
        raise ValueError(f"method must be one of {FILL_METHODS}, got {method!r}")

    spine = (
        bucketed.groupBy(*key_cols)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
            ).alias(bucket_col),
        )
    )
    joined = spine.join(
        bucketed.select(*key_cols, bucket_col, F.col(value_col).alias("__v")),
        on=[*key_cols, bucket_col],
        how="left",
    ).withColumn("observed", F.col("__v").isNotNull())

    if method == "none":
        return joined.select(
            *key_cols, bucket_col, F.col("__v").alias("filled"), "observed"
        )

    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if method == "locf":
        return joined.select(
            *key_cols,
            bucket_col,
            F.last("__v", ignorenulls=True).over(w_prev).alias("filled"),
            "observed",
        )

    # linear: bracketing observation (value, bucket) on each side
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("observed"), F.col(bucket_col))
    prev_v = F.last("__v", ignorenulls=True).over(w_prev)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_prev)
    next_v = F.first("__v", ignorenulls=True).over(w_next)
    next_t = F.first(obs_ts, ignorenulls=True).over(w_next)
    frac = (
        F.unix_timestamp(F.col(bucket_col)) - F.unix_timestamp(prev_t)
    ).cast("double") / (
        F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    ).cast("double")
    filled = (
        F.when(F.col("observed"), F.col("__v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return joined.select(*key_cols, bucket_col, filled.alias("filled"), "observed")


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    sum_agg=F.sum,
) -> DataFrame:
    """LOCF time-weighted average per key over [first_ts, last_ts]:
    integral of the step function (each observation holds until the
    next) divided by the observation span.  Keys with fewer than two
    observations have no span and are dropped.  One window (lead) +
    one aggregate -- both shuffle on the key only.  ``sum_agg`` lets
    callers swap the area sum for an order-independent fixed-point
    aggregate (queries pass ``dsum`` for oracle-exact parity)."""
    # ties on ts break on value (mirrored in the oracle) so the lead
    # pairing is deterministic; the window is built over the renamed
    # projection below
    w = Window.partitionBy(*key_cols).orderBy("__t", "__v")
    # microsecond epoch, not unix_timestamp (which truncates to whole
    # seconds and would disagree with an epoch()-based oracle); the
    # cast to TIMESTAMP is a no-op under the pinned-UTC session but
    # keeps unix_micros happy if the source surfaces TIMESTAMP_NTZ
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp")).cast("double")  # noqa: E731
    seg = df.select(
        *key_cols,
        F.col(ts_col).alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    ).withColumn("__t_next", F.lead("__t").over(w))
    return (
        seg.groupBy(*key_cols)
        .agg(
            sum_agg(F.col("__v") * (us("__t_next") - us("__t")) / F.lit(1e6)).alias(
                "__area"
            ),
            ((F.max(us("__t")) - F.min(us("__t"))) / F.lit(1e6)).alias("__span"),
            F.count("*").alias("n_obs"),
        )
        .filter(F.col("__span") > 0)
        .select(
            *key_cols,
            (F.col("__area") / F.col("__span")).alias("twa"),
            "n_obs",
        )
    )
