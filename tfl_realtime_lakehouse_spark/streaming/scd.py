"""Streaming SCD2 maintenance — the realtime twin of
``operators/scd.py:scd2_build`` (X62 family).

Batch SCD2 rebuilds the full episode history with lag/lead windows; a
stream cannot re-window history, so per-key state carries the OPEN
episode — (attr value, valid_from_us, tiebreak id) — and each
micro-batch emits an episode row the moment it CLOSES (a change
arrives): ``(key, state, valid_from, valid_to, is_current=0)``. The
still-open episode is emitted per batch with ``valid_to`` NULL and
``is_current=1`` (update mode: the latest row per key supersedes).

Within a batch, mutations process in (ts, tiebreak) order — the batch
operator's total order. Same-value writes extend the open episode
(change detection, step 1 of scd2_build). A mutation OLDER than the
open episode's start is DROPPED (the state cannot splice history
without re-opening closed episodes); cross-batch disorder is bounded by
the source watermark — the documented divergence-and-bound contract of
the streaming headway/rate/transition operators. In-order replay makes
closed episodes exactly equal to scd2_build's (pinned by the
batch-equivalence test).

State per key: one (string, long, long) triple — O(distinct keys).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SCD_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
        T.StructField("is_current", T.IntegerType()),
    ]
)

_SCD_STATE = T.StructType(
    [
        T.StructField("cur_value", T.StringType()),
        T.StructField("from_us", T.LongType()),
        T.StructField("tiebreak", T.LongType()),
    ]
)


def _us_to_ts(us: int):
    return pd.Timestamp(us * 1000)


def _scd_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cur_value, from_us, tiebreak = (
        state.get if state.exists else (None, None, None)
    )
    out = {k: [] for k in ("state", "valid_from", "valid_to", "is_current")}

    def emit(value, f_us, t_us, cur):
        out["state"].append(value)
        out["valid_from"].append(_us_to_ts(f_us))
        out["valid_to"].append(_us_to_ts(t_us) if t_us is not None else None)
        out["is_current"].append(cur)

    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid, val in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            if from_us is not None and (us, int(eid)) < (from_us, tiebreak):
                continue  # older than the open episode: bounded disorder, drop
            if cur_value is None:
                cur_value, from_us, tiebreak = val, us, int(eid)
            elif val != cur_value:
                emit(cur_value, from_us, us, 0)  # close the episode
                cur_value, from_us, tiebreak = val, us, int(eid)
            # same value: episode extends, no state change needed
    if cur_value is not None:
        state.update((cur_value, from_us, tiebreak))
        emit(cur_value, from_us, None, 1)  # the open episode, superseded per batch
    yield pd.DataFrame({"user_id": [user_id] * len(out["state"]), **out})


def streaming_scd2(events: DataFrame) -> DataFrame:
    """SCD2 episode stream: closed episodes exactly-once as they close,
    plus the open episode per key per batch (update semantics)."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _scd_state_fn,
            outputStructType=_SCD_OUTPUT,
            stateStructType=_SCD_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
