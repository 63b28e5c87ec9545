"""Event-time STATE-TIMEOUT sessionization — the last streaming API
surface in the engine: ``GroupStateTimeout.EventTimeTimeout``.

The other stateful operators (headways, rates, KMV, SCD2, anomaly,
transitions) never expire state; session finalization is the workload
that NEEDS expiry — a session is only known complete once the
WATERMARK passes its last event + the inactivity gap, and the natural
implementation is "set a timeout at last_ts + gap; emit the session
when the timeout FIRES rather than when a new event happens to arrive".
That emit-on-timeout path is what distinguishes this from the batch
gap sessionization (lag/cumsum windows) and from a keyed-state operator
that only reacts to data: an idle user's final session still flushes,
with no poison-pill event required.

Semantics (mirrors the batch 30-min-gap operator per session):

- Events for a key fold into the open session: extend if
  ``ts − last_ts ≤ gap``, otherwise the open session CLOSES (emitted
  immediately — its successor event proves it ended) and a new one
  opens.
- When no further events arrive, the open session is emitted by the
  EVENT-TIME TIMEOUT once the watermark exceeds ``last_ts + gap``.
- Bounded disorder: an event older than the open session's last_ts but
  within the gap still extends the session (count only); older than
  the session start it is dropped (watermark-bounded, the family's
  documented contract).

State per key: (start_us, last_us, n_events) — three scalars.

The batch-equivalence test pins: closed-by-successor sessions ≡ batch
sessionization, AND the final idle sessions arrive via the timeout
path (no trailing event for those keys in any batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SESS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # 'successor' | 'timeout'
    ]
)

_SESS_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

GAP_SECONDS = 1800  # default inactivity gap (the batch operator's 30 min)


def _session_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int = GAP_SECONDS,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = gap_seconds * 1_000_000
    out = {k: [] for k in ("session_start", "session_end", "n_events", "closed_by")}

    def emit(s_us, e_us, n, how):
        out["session_start"].append(pd.Timestamp(s_us * 1000))
        out["session_end"].append(pd.Timestamp(e_us * 1000))
        out["n_events"].append(n)
        out["closed_by"].append(how)

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        emit(start_us, last_us, n, "timeout")
        state.remove()
    else:
        start_us, last_us, n = (state.get if state.exists else (None, None, 0))
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                if pd.isna(ts):
                    continue
                us = int(pd.Timestamp(ts).value // 1000)
                if start_us is None:
                    start_us, last_us, n = us, us, 1
                elif us < start_us:
                    continue  # pre-session straggler: watermark-bounded drop
                elif us - last_us <= gap_us:
                    last_us = max(last_us, us)
                    n += 1
                else:
                    emit(start_us, last_us, n, "successor")
                    start_us, last_us, n = us, us, 1
        if start_us is not None:
            state.update((start_us, last_us, n))
            # fire once the event-time watermark passes last event + gap
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)
    yield pd.DataFrame({"user_id": [user_id] * len(out["session_start"]), **out})


def streaming_sessions_with_timeout(
    events: DataFrame,
    watermark: str = "0 seconds",
    gap_seconds: int = GAP_SECONDS,
) -> DataFrame:
    """Finalized sessions as a stream; idle sessions flush via
    EventTimeTimeout when the watermark passes last_ts + gap."""

    def fn(key, pdfs, state):
        return _session_state_fn(key, pdfs, state, gap_seconds=gap_seconds)

    return (
        events.select("user_id", "ts", "event_id")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESS_OUTPUT,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
