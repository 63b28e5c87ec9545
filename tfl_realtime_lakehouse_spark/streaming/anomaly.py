"""Streaming rolling z-score anomaly — the realtime twin of
``operators/timeseries.rolling_anomaly`` (X41).

The batch operator windows over the preceding ``history`` buckets; a
stream cannot re-window, so per-key state carries exactly those
``history`` buckets as two parallel arrays (epoch-µs, raw sum) — a
bounded ring buffer — and each
incoming CLOSED bucket (the upstream watermarked window aggregation
emits those, e.g. ``streaming_rate_per_hour``'s shape) is flagged
against its predecessors with the SAME division-free algebra:
(x·n − S1)² > t·(n·S2 − S1²) with S1/S2 as exact 6-dp fixed-point sums
(mirroring the batch DECIMAL(38,6) discipline — python ints, half-up
quantization). A bucket OLDER than the newest state entry is flagged
NULL and not inserted (bounded-disorder contract of the streaming
family); in-order replay equals the batch window exactly, which the
batch-equivalence test pins.

State per key: two ≤ ``history``-element arrays — O(keys·history).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_ANOM_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("bucket_sum", T.DoubleType()),
        T.StructField("n_history", T.IntegerType()),
        T.StructField("is_anomaly", T.IntegerType()),
    ]
)

# ring buffer: parallel arrays of bucket epoch-us and raw bucket sums
# (quantized lazily, so S1 uses fp6(x) and S2 uses fp6(x·x) — exactly the
# batch operator's "square in double, then DECIMAL-quantize" staging)
_ANOM_STATE = T.StructType(
    [
        T.StructField("bucket_us", T.ArrayType(T.LongType())),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
    ]
)


def _fp6(x: float) -> int:
    """6-dp fixed-point with HALF_UP — the batch DECIMAL(38,6) cast."""
    return int(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        * 1_000_000
    )


def _anom_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    history: int = 24,
    min_history: int = 12,
    z2_threshold: float = 9.0,
) -> Iterator[pd.DataFrame]:
    (series_key,) = key
    bucket_us, xs = (state.get if state.exists else ([], []))
    bucket_us, xs = list(bucket_us), list(xs)
    out = {k: [] for k in ("bucket", "bucket_sum", "n_history", "is_anomaly")}
    for pdf in pdfs:
        pdf = pdf.sort_values("bucket")
        for ts, x in zip(pdf["bucket"], pdf["bucket_sum"]):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            n = len(bucket_us)
            if bucket_us and us <= bucket_us[-1]:
                flag = None  # disorder vs state: no valid history window
            elif n < min_history:
                flag = None  # insufficient history — batch emits NULL too
            else:
                # exact int sums ≡ the batch DECIMAL(38,6) sums: S1 over
                # fp6(x), S2 over fp6(x·x) (square in double FIRST, like
                # the batch _sq staging). The COMPARE then replays the
                # batch expression tree verbatim in binary64: x stays
                # FULL precision (only S1/S2 are 6-dp-quantized in the
                # batch operator), and each exact-decimal sum is cast to
                # double with a single correctly-rounded conversion
                # (Decimal→float here ≡ the JVM's decimal→double cast),
                # so boundary flags are bit-equal to the batch window
                # for ANY input precision, not just ≤6-dp values.
                s1_int = sum(_fp6(v) for v in xs)  # exact Σ fp6(x),  ×1e6
                s2_int = sum(_fp6(v * v) for v in xs)  # exact Σ fp6(x²), ×1e6
                s1d = float(Decimal(s1_int) / 1_000_000)
                s2d = float(Decimal(s2_int) / 1_000_000)
                xd, nd = float(x), float(n)
                lhs = (xd * nd - s1d) * (xd * nd - s1d)
                rhs = z2_threshold * (nd * s2d - s1d * s1d)
                flag = 1 if lhs > rhs else 0
            out["bucket"].append(ts)
            out["bucket_sum"].append(float(x))
            out["n_history"].append(len(bucket_us))
            out["is_anomaly"].append(flag)
            if not bucket_us or us > bucket_us[-1]:
                bucket_us.append(us)
                xs.append(float(x))
                if len(bucket_us) > history:
                    bucket_us = bucket_us[-history:]
                    xs = xs[-history:]
    state.update((bucket_us, xs))
    yield pd.DataFrame({"key": [series_key] * len(out["bucket"]), **out})


def streaming_rolling_anomaly(
    buckets: DataFrame,
    history: int = 24,
    min_history: int = 12,
    z2_threshold: float = 9.0,
) -> DataFrame:
    """Per-bucket anomaly flags as a stream over (key, bucket,
    bucket_sum) rows; state bounded at ``history`` pairs per key."""

    def fn(key, pdfs, state):
        return _anom_state_fn(
            key, pdfs, state,
            history=history, min_history=min_history,
            z2_threshold=z2_threshold,
        )

    return (
        buckets.select("key", "bucket", "bucket_sum")
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=_ANOM_OUTPUT,
            stateStructType=_ANOM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
