"""Streaming joins + streaming dedup — the Structured-Streaming twins of
the batch as-of/interval-join family (SURVEY §2.3) and of the ingest-side
order-preserving dedup (S-rows; reference ``tfl_ingest_dag.py:16-23``).

- :func:`dedup_stream_within_watermark` — exactly-once-per-key ingest
  semantics under at-least-once delivery: ``dropDuplicatesWithinWatermark``
  keeps per-key state only until the watermark passes, so state is
  bounded by the lateness budget instead of growing with the stream
  (the unbounded-state failure mode of a plain ``dropDuplicates`` on an
  infinite stream).

- :func:`stream_interval_join` — stream-stream INNER equi-join with an
  event-time interval predicate (the "error followed by a click within
  N minutes" shape). Both sides carry watermarks, so each side's join
  state is pruned once the other side's watermark guarantees no more
  matches — the textbook bounded-state stream-stream join. Semantics
  equal the batch range join over the same data once both watermarks
  pass (pinned by test with the availableNow + restart pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once → exactly-once-per-key within the lateness budget.

    State holds one entry per key seen in the last ``watermark`` of
    event time; a replayed or duplicated record with the same key
    arriving inside that horizon is dropped, later ones are new keys by
    contract (the upstream producer's replay window must be ≤ the
    watermark — same contract as any idempotence-by-dedup sink).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap_minutes: int = 60,
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: same key, right event in
    ``(left_ts, left_ts + max_gap_minutes]``. Watermarks on BOTH sides
    bound the join state (Spark prunes a side's buffered rows once the
    opposite watermark passes the interval's reach).

    ``how="leftOuter"`` emits unmatched left rows with a null right
    timestamp once the watermark proves no match can still arrive —
    the streaming abandonment/timeout detector ("click with no
    purchase within the hour"), state-bounded by the same watermark
    arithmetic as the inner join."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"interval {max_gap_minutes} minutes")
        )
    )
    return (
        lw.alias("l")
        .join(rw.alias("r"), cond, how)
        .select(
            F.col(f"l.{key}").alias(key),
            F.col(f"l.{left_ts}").alias(left_ts),
            F.col(f"r.{right_ts}").alias(right_ts),
        )
    )


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream–static dimension enrichment: the streaming fact joined to
    a batch dimension table. Spark re-plans the static side every
    micro-batch (a file-backed dimension picks up replaced files), and
    with a small dim Catalyst broadcasts it — no state, no watermark,
    no shuffle of the stream. This is the streaming twin of the batch
    broadcast-dim chain (plans/align.py, SURVEY J1): same semantics,
    verified batch-equivalent per micro-batch.

    Left join by default so a late/unknown key never drops a fact row
    (the dimension columns ride as nulls until the dim catches up)."""
    return stream.join(F.broadcast(dim), key, how)
