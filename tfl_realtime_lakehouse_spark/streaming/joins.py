"""Stream-stream joins: watermarked interval join between two live
streams.

The reference has no streaming engine at all — its analogue is the
batch hop-join of aligned snapshots (`dbt` models joining staged tables
per run). A real-time lakehouse needs the streaming form: e.g. enrich
each arrivals event with the line-status messages posted shortly before
it, while BOTH sides are unbounded.

Spark-first mechanics (SS-05 in the Structured Streaming docs): a
stream-stream join buffers both sides in state; without bounds that
state grows forever. Two things bound it:

- **watermarks on both inputs** — rows older than the watermark are
  evicted from the buffer;
- **a time-range join condition** — tells the engine exactly how long a
  row can still find partners, so eviction is tight: left rows are held
  ``lookback`` past their event time, right rows until the left
  watermark passes them.

At scale the join shuffles both streams on the equi-key (state is
co-partitioned by key), so state per task stays
O(key-rate × (watermark + lookback)) — independent of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "15 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each left event to the right events with the same ``key``
    whose timestamp falls in ``[left_ts - lookback, left_ts]``.

    Works identically on streaming and batch DataFrames (watermarks are
    a no-op in batch) — the property the batch-equivalence test pins:
    running the streaming plan with availableNow over a finite input
    must equal the batch join of the same data.

    The right ``key`` column is dropped from the output (it equals the
    left one); all other column names must be distinct between sides.
    """
    lw = (
        left.withWatermark(left_ts, watermark) if left.isStreaming else left
    ).alias("l")
    rw = (
        right.withWatermark(right_ts, watermark) if right.isStreaming else right
    ).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key}"
        f" AND r.{right_ts} >= l.{left_ts} - INTERVAL {lookback}"
        f" AND r.{right_ts} <= l.{left_ts}"
    )
    out = lw.join(rw, cond, how)
    keep_right = [c for c in right.columns if c != key]
    return out.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in keep_right],
    )
