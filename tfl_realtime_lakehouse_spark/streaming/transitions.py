"""Streaming event-transition extraction — the realtime twin of the
batch ``events_markov_transitions`` lead-window pair extraction (X65).

``lead()`` is not streamable; the streaming form keeps one
(last_ts_us, last_event_id, last_type) per user in
``applyInPandasWithState`` and emits a (from_type, to_type) pair per
event. Within a batch events process in (ts, event_id) order — exactly
the batch window's total order. A sample OLDER than the state's
timestamp emits a NULL ``from_type`` (no valid predecessor) and leaves
the state alone — the same documented divergence-and-bound as the
streaming headway/rate operators: cross-batch disorder is bounded by
the source watermark, and an in-order replay equals the batch lead.

State is three scalars per user — O(distinct users) at any throughput.
Downstream, the transition-matrix normalization is the same bounded
(from_type-partitioned) aggregation the batch query runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TRANS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
    ]
)

_TRANS_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _trans_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_us, last_eid, last_type = (
        state.get if state.exists else (None, None, None)
    )
    out_ts, out_from, out_to = [], [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            newer = last_us is None or (us, int(eid)) >= (last_us, last_eid or 0)
            out_ts.append(ts)
            out_from.append(last_type if (last_us is not None and newer) else None)
            out_to.append(etype)
            if newer:
                last_us, last_eid, last_type = us, int(eid), etype
    if last_us is not None:
        state.update((last_us, last_eid, last_type))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_ts),
            "ts": out_ts,
            "from_type": out_from,
            "to_type": out_to,
        }
    )


def streaming_transitions(events: DataFrame) -> DataFrame:
    """Per-event (from_type → to_type) pairs as a stream; state is one
    (ts, event_id, type) triple per user."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _trans_state_fn,
            outputStructType=_TRANS_OUTPUT,
            stateStructType=_TRANS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
