"""As-of (temporal) join — match each left row to the most recent right
row at or before its timestamp, per key (SURVEY §2.3: "as-of/range joins
... natural for this domain: match arrival events to schedule windows").

Strategy: union the two sides with a side tag, then a single
partition-by-key window computes ``last(right_payload ignoring nulls)``
over rows ordered by (ts, side). This is the scale-correct plan — ONE
hash exchange on the key and an in-partition sort, identical in shape to
any windowed aggregation, with none of the O(n·m) blow-up a range-
predicate join produces. Right-side payload columns are struct-packed so
the carried values always come from one physical right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_alias: str = "asof_ts",
    right_values: list[str] | None = None,
    allow_exact_match: bool = True,
) -> DataFrame:
    """Backward as-of join.

    Returns ``left`` plus:
      - ``value_alias``: the matched right row's timestamp (NULL if no
        right row at/before the left timestamp exists for the key);
      - each column in ``right_values`` carried from that same right row.
    """
    right_values = right_values or []

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_values]
    )
    # side ordering at equal ts: right first (0) if exact matches count,
    # else right sorts after left so equal-ts rows are not visible.
    right_side = 0 if allow_exact_match else 2

    left_cols = left.columns
    l2 = left.select(
        *left_cols,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__payload"),
    )
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("__evt_ts"),
        F.lit(right_side).alias("__side"),
        payload.alias("__payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c != on
        ],
    ).select(
        *left_cols, "__evt_ts", "__side", "__payload"
    )

    w = (
        Window.partitionBy(on)
        .orderBy("__evt_ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = matched.select(
        *left_cols,
        F.col("__m.__ts").alias(value_alias),
        *[F.col(f"__m.{c}").alias(c) for c in right_values],
    )
    return out
