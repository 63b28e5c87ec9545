"""Streaming linear multi-touch attribution — the realtime twin of
`events_linear_attribution` (equal-share credit to every click in the
7-day lookback before a purchase).

Unlike last-touch (state = one long), linear attribution needs the
FULL click window: per-user state is the list of (click_id, click_us)
still inside the trailing lookback of the high-watermark — bounded by
the per-user click density in one lookback window (O(1) under the
fixture's constant per-user rate; never the full history, because
clicks older than hw − lookback can never touch an in-order purchase
and are pruned on every update).

Within a batch, rows process in (ts, event_type, event_id) order, so a
click and a purchase sharing a timestamp attribute exactly as the batch
interval join (click_ts <= purchase_ts) would. A purchase OLDER than
the high-watermark is disorder — its lookback may dip below the prune
floor, so it emits one row with ``n_touches = NULL`` (the bounded-
disorder contract of the streaming family). In-order replay ≡ the
batch query, pinned by the equivalence test; credit uses the same
HALF_UP 6-dp rounding as the batch query's ROUND.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_LINEAR_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_id", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("n_touches", T.LongType()),
        T.StructField("credit", T.DoubleType()),
    ]
)

_LINEAR_STATE = T.StructType(
    [
        T.StructField("click_ids", T.ArrayType(T.LongType())),
        T.StructField("click_us", T.ArrayType(T.LongType())),
        T.StructField("hw_us", T.LongType()),
    ]
)

_Q6 = Decimal("1e-6")


def _round6(x: float) -> float:
    # Spark's ROUND is HALF_UP on the exact binary value of the double;
    # Decimal(x) is that exact value, so this matches bit-for-bit.
    return float(Decimal(x).quantize(_Q6, rounding=ROUND_HALF_UP))


def _linear_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    lookback_us: int = 7 * 86_400_000_000,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        click_ids, click_us, hw = state.get
        clicks = list(zip(click_ids, click_us))
    else:
        clicks, hw = [], None
    out = {k: [] for k in ("purchase_id", "click_id", "n_touches", "credit")}
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_type", "event_id"])
        for ts, eid, etype, value in zip(
            pdf["ts"], pdf["event_id"], pdf["event_type"], pdf["value"]
        ):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            if etype == "click":
                clicks.append((int(eid), us))
                if hw is None or us > hw:
                    hw = us
                    clicks = [c for c in clicks if c[1] >= hw - lookback_us]
                continue
            if etype != "purchase":
                continue
            if hw is not None and us < hw:
                # disorder: the lookback may reach below the prune floor
                out["purchase_id"].append(int(eid))
                out["click_id"].append(None)
                out["n_touches"].append(None)
                out["credit"].append(None)
                continue
            hw = us if hw is None else max(hw, us)
            clicks = [c for c in clicks if c[1] >= hw - lookback_us]
            touches = [c for c in clicks if us - lookback_us <= c[1] <= us]
            n = len(touches)
            if n == 0:
                out["purchase_id"].append(int(eid))
                out["click_id"].append(None)
                out["n_touches"].append(0)
                out["credit"].append(_round6(float(value) / 1.0))
                continue
            credit = _round6(float(value) / float(n))
            for cid, _ in touches:
                out["purchase_id"].append(int(eid))
                out["click_id"].append(cid)
                out["n_touches"].append(n)
                out["credit"].append(credit)
    state.update(
        ([c[0] for c in clicks], [c[1] for c in clicks], hw)
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out["purchase_id"]),
            "purchase_id": pd.array(out["purchase_id"], dtype="Int64"),
            "click_id": pd.array(out["click_id"], dtype="Int64"),
            "n_touches": pd.array(out["n_touches"], dtype="Int64"),
            "credit": pd.array(out["credit"], dtype="float64"),
        }
    )


def streaming_linear_attribution(
    events: DataFrame, lookback_us: int = 7 * 86_400_000_000
) -> DataFrame:
    """Per-touch credit rows as a stream over (user_id, event_id, ts,
    event_type, value) rows; clicks extend the window, purchases emit
    one row per touching click (or one direct row)."""

    def fn(key, pdfs, state):
        return _linear_state_fn(key, pdfs, state, lookback_us=lookback_us)

    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_LINEAR_OUTPUT,
            stateStructType=_LINEAR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
