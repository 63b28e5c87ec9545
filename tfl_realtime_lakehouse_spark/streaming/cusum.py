"""Streaming online CUSUM (Page's test) — the realtime twin of
`events_online_cusum`, running the IDENTICAL recurrence as per-key
state: warm-up buffer of the first ``warm`` closed buckets pins the
reference mean/σ with the same left-associated chains the batch fold
and its oracle evaluate, then g⁺ = max(0, g⁺ + (x − μ − 0.5σ)) /
g⁻ analog with h = 5σ and restart-after-alarm.

Unlike the offline `events_changepoint_cusum` (which needs the series
TOTAL and is therefore batch-only), Page's test is the change detector
that deploys on a stream by construction — each step needs only the
carried (g⁺, g⁻). In-order replay equals the batch fold exactly (same
binary64 ops in the same order — pinned by the equivalence test); a
bucket at or before the state's newest is disorder and emits with
``alarm = NULL``, the streaming family's bounded-disorder contract.

State per key: ≤ warm doubles during warm-up, then 6 scalars —
O(keys), independent of stream length.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_CUSUM_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("k", T.LongType()),
        T.StructField("g_pos", T.DoubleType()),
        T.StructField("g_neg", T.DoubleType()),
        T.StructField("alarm", T.IntegerType()),
    ]
)

_CUSUM_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("warm_vals", T.ArrayType(T.DoubleType())),
        T.StructField("mu", T.DoubleType()),
        T.StructField("sig", T.DoubleType()),
        T.StructField("gp", T.DoubleType()),
        T.StructField("gn", T.DoubleType()),
        T.StructField("k", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("first_alarm", T.LongType()),
    ]
)


def _warmup_stats(vals: list) -> tuple:
    """The batch fold's init chains, verbatim: left-associated sum /
    left-associated squared deviations — binary64, same order."""
    n = len(vals)
    mu_c = vals[0]
    for i in range(1, n):
        mu_c = mu_c + vals[i]
    mu = mu_c / float(n)
    var_c = (vals[0] - mu) * (vals[0] - mu)
    for i in range(1, n):
        var_c = var_c + (vals[i] - mu) * (vals[i] - mu)
    # math.sqrt, not **0.5: IEEE guarantees correct rounding for sqrt
    # only; the oracle's SQRT() must replay bit-exactly.
    sig = math.sqrt(var_c / float(n))
    return mu, sig


def _cusum_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    warm: int = 24,
) -> Iterator[pd.DataFrame]:
    (series_key,) = key
    if state.exists:
        last_us, warm_vals, mu, sig, gp, gn, k, n_alarms, first_alarm = state.get
        warm_vals = list(warm_vals)
    else:
        last_us, warm_vals, mu, sig = None, [], None, None
        gp = gn = 0.0
        k = n_alarms = first_alarm = 0
    out = {c: [] for c in ("bucket", "k", "g_pos", "g_neg", "alarm")}
    for pdf in pdfs:
        pdf = pdf.sort_values("bucket")
        for ts, x in zip(pdf["bucket"], pdf["y"]):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and us <= last_us:
                out["bucket"].append(ts)
                out["k"].append(None)
                out["g_pos"].append(None)
                out["g_neg"].append(None)
                out["alarm"].append(None)  # disorder
                continue
            last_us = us
            x = float(x)
            if mu is None:
                warm_vals.append(x)
                if len(warm_vals) == warm:
                    mu, sig = _warmup_stats(warm_vals)
                    warm_vals = []
                out["bucket"].append(ts)
                out["k"].append(0)
                out["g_pos"].append(None)
                out["g_neg"].append(None)
                out["alarm"].append(0)
                continue
            gpn = max(0.0, gp + (x - mu - 0.5 * sig))
            gnn = max(0.0, gn + (mu - x - 0.5 * sig))
            k += 1
            if gpn > 5.0 * sig or gnn > 5.0 * sig:
                if first_alarm == 0:
                    first_alarm = k
                n_alarms += 1
                gp = gn = 0.0
                alarm = 1
                emit_gp, emit_gn = gpn, gnn
            else:
                gp, gn = gpn, gnn
                alarm = 0
                emit_gp, emit_gn = gp, gn
            out["bucket"].append(ts)
            out["k"].append(k)
            out["g_pos"].append(emit_gp)
            out["g_neg"].append(emit_gn)
            out["alarm"].append(alarm)
    state.update(
        (last_us, warm_vals, mu, sig, gp, gn, k, n_alarms, first_alarm)
    )
    yield pd.DataFrame(
        {
            "key": [series_key] * len(out["bucket"]),
            "bucket": out["bucket"],
            "k": pd.array(out["k"], dtype="Int64"),
            "g_pos": pd.array(out["g_pos"], dtype="float64"),
            "g_neg": pd.array(out["g_neg"], dtype="float64"),
            "alarm": pd.array(out["alarm"], dtype="Int32"),
        }
    )


def streaming_online_cusum(buckets: DataFrame, warm: int = 24) -> DataFrame:
    """Alarm stream over closed (key, bucket, y) rows; warm-up rows emit
    k = 0 / alarm = 0, post-warm-up rows carry the recurrence."""

    def fn(key, pdfs, state):
        return _cusum_state_fn(key, pdfs, state, warm=warm)

    return (
        buckets.select("key", "bucket", "y")
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=_CUSUM_OUTPUT,
            stateStructType=_CUSUM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
