"""Streaming last-touch attribution — the realtime twin of
`events_last_touch_attribution` (as-of backward join with a lookback
tolerance, which is unstreamable as a join: the right side grows
without bound).

Per-user state is ONE long — the latest click's epoch-µs — because
last-touch only ever needs the most recent click at or before each
purchase. Within a batch, rows process in (ts, event_id) order so a
click and a purchase arriving in the same micro-batch attribute exactly
as the batch as-of join would. A purchase OLDER than the state's latest
click is disorder (the stream cannot recover the click that preceded
it — that's a full as-of index, not O(1) state): it emits with
``attributed = NULL``, the bounded-disorder contract of the streaming
family. In-order replay ≡ the batch query, pinned by the equivalence
test.

State per key: one long — O(users) total, unbounded time horizon.
(A TTL equal to the lookback window would bound it further; omitted so
the twin matches the batch query's unbounded click retention.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_ATTR_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("purchase_ts", T.TimestampType()),
        T.StructField("attr_click_ts", T.TimestampType()),
        T.StructField("attributed", T.IntegerType()),
        T.StructField("hours_to_convert", T.DoubleType()),
    ]
)

_ATTR_STATE = T.StructType([T.StructField("last_click_us", T.LongType())])


def _attr_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    lookback_us: int = 7 * 86_400_000_000,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    (last_click_us,) = state.get if state.exists else (None,)
    out = {k: [] for k in ("event_id", "pts", "cts", "attributed", "hours")}
    for pdf in pdfs:
        # Clicks must process before purchases sharing the exact same
        # timestamp ("click" < "purchase" lexically), mirroring the batch
        # as-of join's allow_exact_match (click_ts <= purchase_ts);
        # event_id last for determinism among same-type ties.
        pdf = pdf.sort_values(["ts", "event_type", "event_id"])
        for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            if etype == "click":
                if last_click_us is None or us > last_click_us:
                    last_click_us = us
                continue
            if etype != "purchase":
                continue
            if last_click_us is not None and last_click_us > us:
                # disorder: a later click already consumed the state
                out["event_id"].append(int(eid))
                out["pts"].append(ts)
                out["cts"].append(None)
                out["attributed"].append(None)
                out["hours"].append(None)
                continue
            hit = (
                last_click_us is not None
                and us - last_click_us <= lookback_us
            )
            out["event_id"].append(int(eid))
            out["pts"].append(ts)
            out["cts"].append(
                pd.Timestamp(last_click_us * 1000) if hit else None
            )
            out["attributed"].append(1 if hit else 0)
            out["hours"].append(
                float(us - last_click_us) / 3_600_000_000.0 if hit else None
            )
    state.update((last_click_us,))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out["event_id"]),
            "event_id": pd.array(out["event_id"], dtype="Int64"),
            "purchase_ts": out["pts"],
            "attr_click_ts": out["cts"],
            "attributed": pd.array(out["attributed"], dtype="Int32"),
            "hours_to_convert": pd.array(out["hours"], dtype="float64"),
        }
    )


def streaming_last_touch_attribution(
    events: DataFrame, lookback_us: int = 7 * 86_400_000_000
) -> DataFrame:
    """Attributed purchases as a stream over (user_id, event_id, ts,
    event_type) rows; clicks update state, purchases emit."""

    def fn(key, pdfs, state):
        return _attr_state_fn(key, pdfs, state, lookback_us=lookback_us)

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_ATTR_OUTPUT,
            stateStructType=_ATTR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
