"""Skew-mitigation operators for hot keys at scale.

AQE's skew-join splitting (enabled in the session factory) covers
sort-merge joins; these cover the two cases AQE does not:

- ``salted_aggregate``: two-phase aggregation for heavy-hitter GROUP BY
  keys — partial-aggregate on (keys + salt), then final-aggregate on
  keys. Only algebraic aggregates (reassociable merge) are accepted.
- ``salted_broadcast_replicate_join``: replicate the small side per
  salt bucket and salt the big side deterministically, so one hot join
  key spreads over ``salt`` reducers instead of one.

Salt assignment is ``xxhash64 % salt`` over caller-chosen distribution
columns — deterministic (replay-safe, test-stable), uniform enough for
shuffle spreading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge function per algebraic aggregate: how partials combine.
_ALGEBRAIC = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def _salt_col(dist_cols: list[str], salt: int) -> F.Column:
    return F.pmod(F.xxhash64(*dist_cols), F.lit(salt))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
    dist_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column → (fn, input column) with fn in
    sum/count/min/max. ``dist_cols`` (default: all non-key columns)
    drive the deterministic salt.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_ALGEBRAIC)
    if unknown:
        raise ValueError(f"non-algebraic aggregates not salt-safe: {unknown}")
    dist_cols = dist_cols or [c for c in df.columns if c not in keys]

    partial_aggs = []
    for out, (fn, col) in aggs.items():
        first = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        partial_aggs.append(first.alias(f"__p_{out}"))
    partial = df.withColumn("__salt", _salt_col(dist_cols, salt)).groupBy(
        *keys, "__salt"
    ).agg(*partial_aggs)

    final_aggs = [
        _ALGEBRAIC[fn](f"__p_{out}").alias(out) for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_replicate_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    dist_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join where ``big`` has hot keys and ``small`` is
    modest: replicate ``small`` once per salt bucket, salt ``big``
    deterministically, and join on (key, salt). Each hot key's rows
    spread across ``salt`` partitions.

    (When ``small`` fits in a broadcast, Catalyst broadcasts the
    replicated side and no shuffle happens at all; otherwise the
    shuffle is salt-spread, which is the point.)
    """
    dist_cols = dist_cols or [c for c in big.columns if c != key]
    big_salted = big.withColumn("__salt", _salt_col(dist_cols, salt))
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_salted.join(small_rep, [key, "__salt"]).drop("__salt")
