"""Time-series resampling queries (operators/timeseries.py): per-key
gap-fill with LOCF and linear interpolation, and LOCF time-weighted
averages -- the continuous-aggregate / "hypertable rollup" surface over
the events table.

Oracle notes: the fill arithmetic is plain IEEE-double column math with
the SAME operation order in Spark and DuckDB (prev + (next - prev) *
frac, frac an integer-seconds ratio), so results are bit-identical
without rounding; sums use the fixed-point ``dsum`` family like every
other float aggregate in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import bucket_rollup, gap_fill, time_weighted_avg
from ..sources.readers import read_events
from ._exact import dsum, sql_dsum
from .registry import register

_LOCF_ORACLE = f"""
WITH b AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         {sql_dsum('value')} AS day_value
  FROM events GROUP BY 1, 2
),
rng AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1),
s AS (
  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
  FROM rng
),
j AS (
  SELECT s.user_id, s.bucket, b.day_value,
         b.day_value IS NOT NULL AS observed
  FROM s LEFT JOIN b ON s.user_id = b.user_id AND s.bucket = b.bucket
)
SELECT user_id, STRFTIME(bucket, '%Y-%m-%d') AS day,
       LAST_VALUE(day_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       observed
FROM j ORDER BY user_id, day
"""


@register("user_daily_gap_locf", oracle=_LOCF_ORACLE, tags=("timeseries", "gapfill"))
def user_daily_gap_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rollup densified to every day between that user's
    first and last event, gaps filled last-observation-carried-forward.
    Spine = sequence()+explode per key (distributed); fill = one per-key
    window -- two key-shuffles total, no driver calendar."""
    ev = read_events(spark, sf_dir)
    daily = bucket_rollup(ev, ["user_id"], "ts", "day", [dsum("value").alias("day_value")])
    filled = gap_fill(daily, ["user_id"], "bucket", "1 DAY", "day_value", method="locf")
    return filled.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "filled",
        "observed",
    ).orderBy("user_id", "day")


_LINEAR_ORACLE = f"""
WITH b AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         {sql_dsum('value')} AS day_value
  FROM events GROUP BY 1, 2
),
rng AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1),
s AS (
  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
  FROM rng
),
j AS (
  SELECT s.user_id, s.bucket, b.day_value,
         b.day_value IS NOT NULL AS observed
  FROM s LEFT JOIN b ON s.user_id = b.user_id AND s.bucket = b.bucket
),
br AS (
  SELECT user_id, bucket, day_value, observed,
         LAST_VALUE(day_value IGNORE NULLS) OVER wprev AS prev_v,
         LAST_VALUE(CASE WHEN observed THEN bucket END IGNORE NULLS) OVER wprev AS prev_t,
         FIRST_VALUE(day_value IGNORE NULLS) OVER wnext AS next_v,
         FIRST_VALUE(CASE WHEN observed THEN bucket END IGNORE NULLS) OVER wnext AS next_t
  FROM j
  WINDOW wprev AS (PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wnext AS (PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, STRFTIME(bucket, '%Y-%m-%d') AS day,
       CASE WHEN observed THEN day_value
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
              prev_v + (next_v - prev_v) *
                (CAST(epoch(bucket) - epoch(prev_t) AS DOUBLE) /
                 CAST(epoch(next_t) - epoch(prev_t) AS DOUBLE))
            ELSE NULL END AS filled,
       observed
FROM br ORDER BY user_id, day
"""


@register("user_daily_gap_linear", oracle=_LINEAR_ORACLE, tags=("timeseries", "gapfill"))
def user_daily_gap_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rollup with interior gaps linearly interpolated
    between the bracketing observed days (edges stay NULL); observed
    days keep their exact value."""
    ev = read_events(spark, sf_dir)
    daily = bucket_rollup(ev, ["user_id"], "ts", "day", [dsum("value").alias("day_value")])
    filled = gap_fill(daily, ["user_id"], "bucket", "1 DAY", "day_value", method="linear")
    return filled.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "filled",
        "observed",
    ).orderBy("user_id", "day")


_TWA_ORACLE = f"""
WITH seg AS (
  SELECT user_id, value,
         epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, value) AS t_next
  FROM events
),
agg AS (
  SELECT user_id,
         {sql_dsum('value * (t_next - t) / 1e6')} AS area,
         (CAST(MAX(t) - MIN(t) AS DOUBLE) / 1e6) AS span,
         COUNT(*) AS n_obs
  FROM seg GROUP BY user_id
)
SELECT user_id, area / span AS twa, n_obs
FROM agg WHERE span > 0
ORDER BY user_id
"""


@register("user_value_twa", oracle=_TWA_ORACLE, tags=("timeseries", "agg"))
def user_value_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of `value` per user over each user's
    observation span (TimescaleDB `time_weight('locf', ...)` shape).
    The area sum runs in fixed-point (dsum) so the 32-partition Spark
    aggregation and the sequential DuckDB one agree exactly."""
    ev = read_events(spark, sf_dir)
    return time_weighted_avg(
        ev, ["user_id"], "ts", "value", sum_agg=dsum
    ).orderBy("user_id")
