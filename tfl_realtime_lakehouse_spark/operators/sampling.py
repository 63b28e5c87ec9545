"""Sampling operators for training-data pipelines.

- ``hash_split``: deterministic content-addressed train/val/test split —
  the split is a pure function of the row key (md5-derived bucket), so
  it is reproducible across runs, engines, and corpus re-partitions,
  and rows never migrate between splits as the corpus grows. This is
  the correct split primitive at 100 TB (random sampling with a seed is
  partitioning-dependent).
- ``stratified_sample``: per-stratum Bernoulli sampling via ``sampleBy``
  (seeded; approximate fractions) for class-balanced subsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): parse the first 8 hex chars
    of md5(key) — stable everywhere (any engine can reproduce it)."""
    col = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by key-hash bucket.

    ``splits`` maps name → percentage (must sum to 100); default
    90/5/5 train/val/test.
    """
    splits = splits or {"train": 90, "val": 5, "test": 5}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = hash_bucket(key_col)
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (approximate fractions, seeded)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    buckets: int = 10000,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic domain-mixture sampling: keep a row iff its
    content-addressed hash bucket falls under the stratum's target rate
    — the "mix 50% web, 25% code, ..." step of training-corpus assembly.

    Unlike ``sampleBy`` (seeded Bernoulli), membership is a pure
    function of the row key: reproducible across engines, runs,
    repartitions, and corpus growth (adding documents never flips an
    existing row's decision). Rates are converted to integer bucket
    thresholds driver-side, so the executor-side predicate is an exact
    integer comparison — no float-truncation edge at rate boundaries.
    A stratum absent from ``rates`` gets ``default_rate``.
    """
    thresholds = {k: int(round(v * buckets)) for k, v in rates.items()}
    default_thresh = int(round(default_rate * buckets))
    bucket = hash_bucket(key_col, buckets)
    thresh = None
    for name, t in thresholds.items():
        cond = F.col(strata_col) == name
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        thresh.otherwise(default_thresh) if thresh is not None else F.lit(default_thresh)
    )
    return df.where(bucket < thresh)
