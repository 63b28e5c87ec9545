"""Streaming counter rates — the realtime twin of
``operators/timeseries.counter_rate`` (PromQL ``rate()``/``increase()``
semantics as a Structured Streaming stateful operator).

Batch ``counter_rate`` takes the per-series delta with ``lag``; lag is
not streamable, so per-key state keeps the last (timestamp, value) and
each micro-batch emits one increase per sample:

- non-negative delta → the delta;
- negative delta → the post-reset absolute value (counter restart);
- series head (no state yet) → NULL (no baseline to diff against).

Within a batch samples are processed in (ts, tiebreak) order. A sample
OLDER than the state's timestamp emits NULL rather than a bogus
negative/reset increase (same documented divergence-and-bound as the
streaming headway operator: cross-batch disorder is bounded by the
source's watermark; single-batch replay is exactly the batch ``lag``).

State is one (long, double) per series — O(distinct keys) memory at any
throughput. Downstream, the per-bucket rate is the standard windowed
aggregation of the emitted increases (watermark + tumbling window),
which is exactly the batch operator's groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_RATE_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("increase", T.DoubleType()),
    ]
)

# state: last sample per series — (epoch micros, counter value)
_RATE_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _rate_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (series_key,) = key
    last_us, last_value = (state.get if state.exists else (None, None))
    out_ts: list = []
    out_inc: list = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            if pd.isna(ts) or pd.isna(value):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            value = float(value)
            if last_us is None or us < last_us:
                inc = None  # series head, or out-of-order vs state
            else:
                delta = value - last_value
                inc = delta if delta >= 0 else value
            out_ts.append(ts)
            out_inc.append(inc)
            if last_us is None or us >= last_us:
                last_us, last_value = us, value
    if last_us is not None:
        state.update((last_us, last_value))
    yield pd.DataFrame({"key": series_key, "ts": out_ts, "increase": out_inc})


def streaming_counter_increases(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-sample counter increases as a stream (state: last sample per
    series). Feed the output to :func:`streaming_rate_per_hour` for the
    windowed rate, or consume the raw increases directly."""
    return (
        events.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            F.col(tiebreak_col).alias("event_id"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _rate_state_fn,
            outputStructType=_RATE_OUTPUT,
            stateStructType=_RATE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_rate_per_hour(
    increases: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-hour rate over the emitted increases: watermark-bounded
    event-time window, decimal-exact sum — the streaming equivalent of
    the batch operator's (key, bucket) groupBy."""
    return (
        increases.filter(F.col("increase").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(
                F.sum(F.col("increase").cast("decimal(27,12)")).cast("double"), 6
            ).alias("increase"),
            F.round(
                F.sum(F.col("increase").cast("decimal(27,12)")).cast("double")
                / F.lit(3600.0),
                6,
            ).alias("rate_per_sec"),
        )
        .select(F.col("w.start").alias("bucket"), "key", "n_samples", "increase", "rate_per_sec")
    )
