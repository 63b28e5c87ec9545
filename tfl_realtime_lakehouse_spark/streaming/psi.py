"""Streaming PSI drift monitor — the periodized realtime counterpart of
`events_psi_drift`.

The batch query splits the timeline once (baseline fortnight vs rest).
A monitor deployed on a stream instead FREEZES the baseline after the
first ``baseline_n`` closed buckets (bin edges = 10 equal-width bins
over the baseline min/max — the same pure-expression binning) and then
emits one PSI row per subsequent PERIOD of ``period_n`` buckets: the
standard drift-dashboard cadence ("PSI of the last day vs launch
baseline"). Same estimator: proportions clamped at 1e-4, terms
(p_cur − p_base)·ln(p_cur/p_base) summed per period.

State per key: during warm-up the baseline value buffer (≤ baseline_n
doubles); after freeze, 10 baseline proportions + 10 running period
counts + 3 scalars — O(keys), stream-length-independent. Out-of-order
buckets emit nothing and leave state untouched (disorder contract;
upstream window aggregations emit closed buckets in order).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_PSI_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("period_end", T.TimestampType()),
        T.StructField("period_idx", T.LongType()),
        T.StructField("psi", T.DoubleType()),
        T.StructField("n_drifted_bins", T.IntegerType()),
    ]
)

_PSI_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("baseline_vals", T.ArrayType(T.DoubleType())),
        T.StructField("base_props", T.ArrayType(T.DoubleType())),
        T.StructField("lo", T.DoubleType()),
        T.StructField("hi", T.DoubleType()),
        T.StructField("cur_counts", T.ArrayType(T.LongType())),
        T.StructField("cur_n", T.LongType()),
        T.StructField("period_idx", T.LongType()),
    ]
)


def _bin_of(x: float, lo: float, hi: float) -> int:
    if hi == lo:
        # Degenerate baseline span (constant warm-up — e.g. a zero-filled
        # monitored metric): every value maps to bin 0 instead of raising
        # ZeroDivisionError at freeze time, which would crash the query
        # and (same batch replayed on restart) wedge the key permanently.
        return 0
    b = math.floor((x - lo) / ((hi - lo) / 10.0))
    return min(max(int(b), 0), 9)


def _psi_terms(base_props: list, cur_counts: list, cur_n: int):
    psi = 0.0
    drifted = 0
    for b in range(10):
        pb = max(base_props[b], 0.0001)
        pc = max(float(cur_counts[b]) / float(cur_n), 0.0001)
        term = (pc - pb) * math.log(pc / pb)
        psi += term
        if term > 0.025:
            drifted += 1
    return psi, drifted


def _psi_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    baseline_n: int = 240,
    period_n: int = 24,
) -> Iterator[pd.DataFrame]:
    (series_key,) = key
    if state.exists:
        (last_us, baseline_vals, base_props, lo, hi,
         cur_counts, cur_n, period_idx) = state.get
        baseline_vals = list(baseline_vals)
        base_props = list(base_props) if base_props else None
        cur_counts = list(cur_counts) if cur_counts else [0] * 10
    else:
        last_us, baseline_vals, base_props = None, [], None
        lo = hi = None
        cur_counts, cur_n, period_idx = [0] * 10, 0, 0
    out = {c: [] for c in ("period_end", "period_idx", "psi", "n_drifted_bins")}
    for pdf in pdfs:
        pdf = pdf.sort_values("bucket")
        for ts, x in zip(pdf["bucket"], pdf["y"]):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and us <= last_us:
                continue  # disorder: ignore, state untouched
            last_us = us
            x = float(x)
            if base_props is None:
                baseline_vals.append(x)
                if len(baseline_vals) == baseline_n:
                    lo, hi = min(baseline_vals), max(baseline_vals)
                    counts = [0] * 10
                    for v in baseline_vals:
                        counts[_bin_of(v, lo, hi)] += 1
                    base_props = [c / float(baseline_n) for c in counts]
                    baseline_vals = []
                continue
            cur_counts[_bin_of(x, lo, hi)] += 1
            cur_n += 1
            if cur_n == period_n:
                period_idx += 1
                psi, drifted = _psi_terms(base_props, cur_counts, cur_n)
                out["period_end"].append(ts)
                out["period_idx"].append(period_idx)
                out["psi"].append(psi)
                out["n_drifted_bins"].append(drifted)
                cur_counts, cur_n = [0] * 10, 0
    state.update(
        (
            last_us,
            baseline_vals,
            base_props,
            lo,
            hi,
            cur_counts,
            cur_n,
            period_idx,
        )
    )
    yield pd.DataFrame(
        {
            "key": [series_key] * len(out["period_end"]),
            "period_end": out["period_end"],
            "period_idx": pd.array(out["period_idx"], dtype="Int64"),
            "psi": pd.array(out["psi"], dtype="float64"),
            "n_drifted_bins": pd.array(out["n_drifted_bins"], dtype="Int32"),
        }
    )


def streaming_psi_drift(
    buckets: DataFrame, baseline_n: int = 240, period_n: int = 24
) -> DataFrame:
    """Per-key periodized PSI stream over closed (key, bucket, y) rows."""

    def fn(key, pdfs, state):
        return _psi_state_fn(
            key, pdfs, state, baseline_n=baseline_n, period_n=period_n
        )

    return (
        buckets.select("key", "bucket", "y")
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=_PSI_OUTPUT,
            stateStructType=_PSI_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
