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
