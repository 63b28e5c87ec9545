"""Time-series gap filling: dense bucket grid + LOCF + linear interpolation.

The hypertable-style rollup surface (reference: the realtime headway
marts, `dbt_project/models/marts/fct_headways.sql` aggregates into
time buckets but leaves empty buckets absent). Dashboards and
downstream ML featurization need *dense* series: every (key, bucket)
cell present, counts zero-filled, values carried forward (LOCF) or
linearly interpolated — the `time_bucket_gapfill` / `locf` /
`interpolate` triple from the timeseries-DB world, re-expressed as a
Spark plan.

Plan shape (scale posture):
- bucket aggregation: one hash-agg shuffle on (key, bucket) — partial
  aggregation map-side, fixed-width keys.
- grid: |keys| × |buckets| rows built from a `sequence()` explode of
  the global [min, max] span crossed with the distinct-key dim. Both
  inputs are tiny relative to the events table (keys is a dim; span is
  one row), and the grid itself is OUTPUT-sized — the dense series IS
  the result, so no work here is avoidable.
- fill: left join grid ← buckets on (key, bucket), then two window
  passes partitioned by key. The join and the windows share the key
  in their partitioning; AQE coalesces the small exchanges. Nothing
  touches the raw events again after the first aggregation.

At 100 TB the only care is bucket granularity: |buckets| grows with
span/width, not with data volume, so a year of 1-minute buckets is
~0.5 M cells per key — window state per key stays bounded and the
grid never approaches the raw row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Dense per-key bucket series with zero-filled counts, LOCF and
    linear interpolation of the bucket-avg value.

    Output: (key, bucket, n_events, was_gap, avg_value, avg_value_locf,
    avg_value_interp) — one row per key per `unit` bucket across the
    GLOBAL [min, max] span, so all series are aligned (the dashboard
    contract). `avg_value` is null in gap buckets; `_locf` carries the
    last observed average forward (leading-edge gaps stay null);
    `_interp` linearly interpolates between the neighbouring observed
    buckets (edges stay null, the timeseries-DB `interpolate`
    semantics).
    """
    interval = F.expr(f"interval 1 {unit}")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")

    agg = df.groupBy(F.col(key_col).alias("key"), bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg(value_col).alias("avg_value"),
    )

    span = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("tmin"),
        F.date_trunc(unit, F.max(ts_col)).alias("tmax"),
    )
    keys = df.select(F.col(key_col).alias("key")).distinct()
    grid = keys.crossJoin(F.broadcast(span)).select(
        "key",
        F.explode(F.sequence(F.col("tmin"), F.col("tmax"), interval)).alias("bucket"),
    )

    dense = grid.join(agg, ["key", "bucket"], "left")

    w_past = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_future = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    observed_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    prev_val = F.last("avg_value", ignorenulls=True).over(w_past)
    prev_b = F.last(observed_bucket, ignorenulls=True).over(w_past)
    next_val = F.first("avg_value", ignorenulls=True).over(w_future)
    next_b = F.first(observed_bucket, ignorenulls=True).over(w_future)

    # Linear interpolation in epoch-seconds space; exact at observed
    # buckets (falls through to the observed value).
    frac = (
        F.unix_timestamp("bucket") - F.unix_timestamp(prev_b)
    ).cast("double") / (
        F.unix_timestamp(next_b) - F.unix_timestamp(prev_b)
    ).cast("double")
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            prev_val.isNotNull() & next_val.isNotNull(),
            prev_val + (next_val - prev_val) * frac,
        )
        .otherwise(F.lit(None).cast("double"))
    )

    return dense.select(
        "key",
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("avg_value").isNull().alias("was_gap"),
        "avg_value",
        prev_val.alias("avg_value_locf"),
        interp.alias("avg_value_interp"),
    )
