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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join in three directions.

    - ``backward`` (default): most recent right row at/before the left
      timestamp — the classic as-of.
    - ``forward``: earliest right row at/after the left timestamp
      (e.g. "the next click after each error").
    - ``nearest``: whichever of the two is closer in absolute time,
      ties resolved backward.

    Returns ``left`` plus:
      - ``value_alias``: the matched right row's timestamp (NULL if no
        matching right row exists for the key in the given direction);
      - each column in ``right_values`` carried from that same right row.

    All directions keep the single-exchange plan: the union is hashed
    once on the key and each window is an in-partition sort frame.
    ``tolerance_seconds`` (pandas ``merge_asof`` tolerance): a match
    farther than the bound in the join direction is nulled out — a pure
    post-projection on the matched struct, so the single-exchange plan
    is unchanged. ``nearest`` unions the right side twice (one copy
    visible to the backward frame, one to the forward frame) — 2× the
    right rows through the one shuffle, still no range-join blow-up. Equal-ts
    visibility is encoded purely in the (ts, side) sort: a right copy
    sorted before left at the same ts is inside the backward frame and
    outside the forward frame, and vice versa. If several right rows
    share one (key, ts), which one's payload is carried is unspecified —
    pre-aggregate the right side to make it unique.
    """
    right_values = right_values or []
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_values]
    )
    ptype = right.select(payload.alias("p")).schema["p"].dataType
    null_p = F.lit(None).cast(ptype)
    # side ordering at equal ts (left is always 1): a right copy at side
    # 0 sorts before left — visible to backward frames, invisible to
    # forward frames; side 2 is the mirror. allow_exact_match=False
    # swaps the sides, hiding equal-ts rows from their own direction.
    back_side = 0 if allow_exact_match else 2
    fwd_side = 2 if allow_exact_match else 0

    left_cols = left.columns
    l_pad = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left_cols
        if c != on
    ]

    def _right(side: int, pb, pf) -> DataFrame:
        return right.select(
            F.col(on),
            F.col(right_ts).alias("__evt_ts"),
            F.lit(side).alias("__side"),
            pb.alias("__pb"),
            pf.alias("__pf"),
            *l_pad,
        ).select(*left_cols, "__evt_ts", "__side", "__pb", "__pf")

    l2 = left.select(
        *left_cols,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__side"),
        null_p.alias("__pb"),
        null_p.alias("__pf"),
    )
    parts = [l2]
    if direction in ("backward", "nearest"):
        parts.append(_right(back_side, payload, null_p))
    if direction in ("forward", "nearest"):
        parts.append(_right(fwd_side, null_p, payload))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    base = Window.partitionBy(on).orderBy("__evt_ts", "__side")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    m = u
    if direction in ("backward", "nearest"):
        m = m.withColumn("__b", F.last("__pb", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        m = m.withColumn("__f", F.first("__pf", ignorenulls=True).over(wf))
    m = m.filter(F.col("__side") == 1)

    if direction == "backward":
        m = m.withColumn("__m", F.col("__b"))
    elif direction == "forward":
        m = m.withColumn("__m", F.col("__f"))
    else:
        is_ts = left.schema[left_ts].dataType.typeName().startswith("timestamp")

        def _us(c):
            return F.unix_micros(c) if is_ts else c.cast("long")

        db = _us(F.col("__evt_ts")) - _us(F.col("__b.__ts"))
        df_ = _us(F.col("__f.__ts")) - _us(F.col("__evt_ts"))
        pick_b = F.col("__f").isNull() | (F.col("__b").isNotNull() & (db <= df_))
        m = m.withColumn("__m", F.when(pick_b, F.col("__b")).otherwise(F.col("__f")))

    if tolerance_seconds is not None:
        is_ts = left.schema[left_ts].dataType.typeName().startswith("timestamp")

        def _us_t(c):
            return F.unix_micros(c) if is_ts else c.cast("long")

        scale = 1_000_000 if is_ts else 1
        gap = F.abs(_us_t(F.col("__evt_ts")) - _us_t(F.col("__m.__ts")))
        m = m.withColumn(
            "__m",
            F.when(gap <= F.lit(int(tolerance_seconds * scale)), F.col("__m")),
        )

    return m.select(
        *left_cols,
        F.col("__m.__ts").alias(value_alias),
        *[F.col(f"__m.{c}").alias(c) for c in right_values],
    )
