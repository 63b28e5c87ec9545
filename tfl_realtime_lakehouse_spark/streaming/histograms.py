"""Streaming histogram sketch — the realtime twin of
``operators/sketches.histogram_sketch`` (mergeable equi-width value
histograms) as a watermarked windowed aggregation.

Why this is the right streaming shape: the sketch IS a groupBy counter
table, so Structured Streaming's windowed aggregation gives it
incremental maintenance for free — state is bounded at
windows_in_flight × bins counters per group (the watermark expires old
windows), each micro-batch folds map-side before touching state, and
the emitted per-window sketches merge downstream by counter addition
exactly like their batch siblings (shards, days, regions — same
algebra). Quantile estimates then come from
``operators.sketches.histogram_quantiles`` applied to the sink table —
the batch and streaming paths share the estimator code.

Determinism: FLOOR bucketing over fixed [lo, hi), integer counters —
no hashing, no floats in state — so a finalized window's sketch equals
the batch operator's over the same rows (pytest-pinned; streaming
aggregation itself is exact, unlike the order-dependent MG sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_histogram(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 100,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-(event-time window, group, bucket) histogram counters with
    out-of-range clipping — identical bucket arithmetic to the batch
    ``histogram_sketch``."""
    group_cols = group_cols or []
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            *group_cols,
            bucket.alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("win_start"), *group_cols, "bucket", "cnt"
        )
    )
