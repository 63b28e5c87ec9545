"""Type-2 slowly-changing dimension builder.

The reference's dbt models materialize full-refresh snapshots; the
warehouse-native history mechanism that implies is SCD2 — every key
keeps a row per VALUE EPISODE with a validity interval, so point-in-time
joins ("what was this entity's status when the order shipped?") work
without replaying the mutation log.

Spark-first shape: one shuffle on the key. Change detection (lag) and
interval construction (lead) share the same (key, ts) window
partitioning, so Catalyst reuses a single exchange for both window
operators — the same single-shuffle property PLANS.md documents for
fct_headways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    mutations: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a mutation log into SCD2 validity intervals.

    Steps (classic warehouse semantics):

    1. **Change detection**: drop mutations whose ``attr_col`` equals the
       key's previous value — repeated writes of the same value extend
       the current episode instead of opening a new one.
    2. **Intervals**: ``valid_from`` = the change's timestamp,
       ``valid_to`` = the NEXT change's timestamp (null for the open
       episode), ``is_current`` = 1 on the open episode.

    ``tiebreak_col`` makes the per-key order total when timestamps tie
    (the registry determinism contract for window queries). Null
    attribute values are treated as a distinct state: null → value and
    value → null both count as changes (null-safe inequality).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        mutations.withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_first", F.lag(ts_col).over(w).isNull())
        # null-safe "differs from previous": eqNullSafe negated, plus the
        # partition head (prev row absent) always opens an episode
        .where(F.col("_first") | ~F.col(attr_col).eqNullSafe(F.col("_prev")))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.col(attr_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().cast("int").alias("is_current"),
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Apply a CDC change feed (upserts + delete tombstones) to a base
    snapshot — the batch MERGE kernel behind every lakehouse table
    format's `MERGE INTO`, as a two-shuffle DataFrame plan.

    Semantics (Debezium/Delta change-feed compaction):
    - per key, the LATEST change by (ts, tiebreak) wins — earlier
      changes in the same batch are superseded, never applied;
    - latest op == 'D' → the key is absent from the result (tombstone
      beats both the base row and earlier upserts);
    - latest op != 'D' → the key carries the change's payload;
    - keys with no change keep their base payload.

    Scale shape: one window (row_number over the key) compacts the
    feed — shuffle keyed by ``key_col``, map-side nothing to combine
    but AQE skew-split applies — then one left-anti join (base vs
    touched keys) reusing the same key partitioning, and a
    by-name union. No broadcast of anything data-sized; the feed and
    the base stream through.

    Columns out: ``key_col``, ``payload_cols``, ``ts_col`` (the base's
    ts for untouched keys, the winning change's for touched ones), and
    ``src`` ('base' | 'cdc').
    """
    w = Window.partitionBy(key_col).orderBy(
        F.desc(ts_col), F.desc(tiebreak_col)
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    out_cols = [key_col, *payload_cols, ts_col]
    survivors = latest.where(F.col(op_col) != F.lit("D")).select(
        *out_cols, F.lit("cdc").alias("src")
    )
    untouched = base.join(
        latest.select(key_col), key_col, "left_anti"
    ).select(*out_cols, F.lit("base").alias("src"))
    return untouched.unionByName(survivors)
