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

    Dirty-data note: the grid is keys × the GLOBAL [min, max] span, so
    one poison far-future timestamp inflates it for every key.
    `F.sequence` fails LOUDLY past its element cap rather than
    silently materializing the blowup; pipelines with untrusted
    timestamps should bound the span upstream (the staging cast
    contract's try_cast + range DQ check is the engine's own guard)
    or use the streaming twin, whose `max_gap_buckets` truncates gap
    runs explicitly (`streaming/gapfill.py`).
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


def counter_rate(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    unit: str = "hour",
    unit_seconds: int = 3600,
) -> DataFrame:
    """Per-key per-bucket rate of a monotonically-increasing counter
    with reset handling (the PromQL ``rate()``/``increase()`` semantics,
    re-expressed as one window pass + one aggregation).

    A sample's increase is ``value - lag(value)`` when non-negative; a
    negative delta means the counter restarted (process crash), so the
    post-reset absolute value IS the increase — exactly Prometheus's
    extrapolation-free rule. Increases sum per (key, bucket) as exact
    DECIMAL (order-free), and the rate divides by the bucket span.

    Plan: one window shuffle on the key (lag), one hash agg on
    (key, bucket) — partial map-side. At 100 TB both stages key on the
    series id; skewed series fall to AQE. First sample per key has no
    lag and contributes nothing (no baseline to diff against).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    delta = F.col(value_col) - F.lag(value_col).over(w)
    # Explicit null-first branch: a NULL delta (series head) would
    # otherwise fall through `when(delta >= 0, ...)` into the reset
    # branch — CASE treats a NULL condition as not-matched, not false.
    increase = (
        F.when(delta.isNull(), F.lit(None).cast("double"))
        .when(delta >= 0, delta)
        .otherwise(F.col(value_col))
    )
    per_sample = df.select(
        F.col(key_col).alias("key"),
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        increase.alias("_inc"),
    ).where(F.col("_inc").isNotNull())
    return per_sample.groupBy("key", "bucket").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.sum(F.col("_inc").cast("decimal(27,12)")).cast("double"), 6).alias(
            "increase"
        ),
        F.round(
            (
                F.sum(F.col("_inc").cast("decimal(27,12)")).cast("double")
                / F.lit(float(unit_seconds))
            ),
            6,
        ).alias("rate_per_sec"),
    )


def ewma_smooth(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
    lookback: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average over the per-key bucket
    series with α = 1/2 — the dashboard smoothing pass.

    Determinism across engines is engineered, not assumed: bucket
    totals are exact DECIMAL sums; the EWMA weights 2^-j are exact
    binary64 values, so each product is a single correctly-rounded IEEE
    operation; and the weighted sum is written as one fixed
    left-to-right chain (identical expression tree in the SQL oracle),
    so both engines round identically at every step. Missing history at
    a series head renormalizes over the observed lags (standard
    adjusted-EWMA). One agg shuffle + one window pass on the key.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    agg = df.groupBy(F.col(key_col).alias("key"), bucket).agg(
        F.sum(F.col(value_col).cast("decimal(27,12)")).alias("_s")
    )
    w = Window.partitionBy("key").orderBy("bucket")
    x = F.col("_s").cast("double")
    num = x  # j = 0 term; weight 1
    den = F.lit(1.0)
    for j in range(1, lookback):
        lj = F.lag(x, j).over(w)
        wt = F.lit(2.0 ** (-j))
        num = num + F.coalesce(lj * wt, F.lit(0.0))
        den = den + F.when(lj.isNotNull(), wt).otherwise(F.lit(0.0))
    return agg.select(
        "key",
        "bucket",
        F.round(x, 6).alias("bucket_sum"),
        F.round(num / den, 6).alias("ewma"),
    )


def rolling_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
    history: int = 24,
    min_history: int = 12,
    z2_threshold: float = 9.0,
) -> DataFrame:
    """Rolling z-score anomaly flag on the per-key bucket series: a
    bucket is anomalous when (x − μ)² > t·σ² against the preceding
    ``history`` buckets' mean/variance (z² > t, t = 9 ⇒ |z| > 3).

    The flag is made exactly cross-engine-deterministic by comparing in
    integer-like algebra instead of dividing: with S1 = Σxᵢ, S2 = Σxᵢ²
    over n history rows,   (x·n − S1)² > t·(n·S2 − S1²)   ⟺  z² > t.
    S1/S2 are exact DECIMAL sums (order-free); the final products run
    in binary64 with the SAME expression tree on both engines, so every
    intermediate rounds identically. Plan: one agg shuffle, one window
    pass; history state is O(history) per series.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    agg = df.groupBy(F.col(key_col).alias("key"), bucket).agg(
        F.sum(F.col(value_col).cast("decimal(27,12)")).alias("_sd")
    )
    x = F.col("_sd").cast("double")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-history, -1)
    )
    # x² staged per row (single IEEE multiply), then exact decimal sums.
    staged = agg.select(
        "key", "bucket", "_sd", (x * x).cast("decimal(38,6)").alias("_sq")
    )
    s1 = F.sum(F.col("_sd").cast("decimal(38,6)")).over(w)
    s2 = F.sum("_sq").over(w)
    n = F.count(F.lit(1)).over(w)
    s1d, s2d, nd = s1.cast("double"), s2.cast("double"), n.cast("double")
    lhs = (x * nd - s1d) * (x * nd - s1d)
    rhs = F.lit(float(z2_threshold)) * (nd * s2d - s1d * s1d)
    return staged.select(
        "key",
        "bucket",
        F.round(x, 6).alias("bucket_sum"),
        n.cast("int").alias("n_hist"),
        F.when(n >= min_history, (lhs > rhs).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("is_anomaly"),
    )
