"""Streaming gap-fill + LOCF — the realtime twin of
``operators/timeseries.bucket_gapfill``'s streamable subset.

The batch operator aligns every key to the GLOBAL [min, max] bucket
span and fills three value flavours (null / LOCF / linear interp). A
stream knows neither the global span nor the future, so the streamable
contract is: within each key's [first, last] OBSERVED bucket range,
emit one row per bucket — zero-filled counts and last-observation-
carried-forward values for the gaps, trailing gaps flushing when the
next observation arrives — exactly what the batch operator produces on
that sub-range (pinned by the batch-equivalence test; interpolation needs
the NEXT observation and is therefore batch-only, the same divergence
note as T4 watermarks).

State per key: (last bucket epoch-µs, last avg) plus a far-jump
candidate pair — four scalars, O(keys) total, regardless of throughput
or gap length. OUTPUT per gap is bounded too: a gap run longer than
``max_gap_buckets`` (a poison far-future timestamp would otherwise
emit millions of fill rows) emits only the observed row flagged
``was_gap = 2`` — truncation is loud, never silent (the no-silent-caps
rule) — and the committed state does NOT advance past the last sane
bucket, so one corrupt row cannot wedge the key; a SECOND far bucket
landing near the first confirms a genuine regime change and fill
resumes from there. A bucket at or before
the state's newest is disorder (the upstream windowed agg emits closed
buckets in order); it is emitted flagged ``was_gap = NULL`` and not
inserted — the bounded-disorder contract the anomaly/rates twins use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_GAPFILL_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("was_gap", T.IntegerType()),
        T.StructField("avg_value", T.DoubleType()),
        T.StructField("avg_value_locf", T.DoubleType()),
    ]
)

_GAPFILL_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_avg", T.DoubleType()),
        # far-jump candidate (poison vs regime change disambiguation)
        T.StructField("cand_us", T.LongType()),
        T.StructField("cand_avg", T.DoubleType()),
    ]
)


def _gapfill_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    step_us: int = 3_600_000_000,
    max_gap_buckets: int = 10_000,
) -> Iterator[pd.DataFrame]:
    (series_key,) = key
    last_us, last_avg, cand_us, cand_avg = (
        state.get if state.exists else (None, None, None, None)
    )
    out = {k: [] for k in ("bucket", "n_events", "was_gap", "avg_value", "locf")}

    def emit(us, n, gap, avg, locf):
        out["bucket"].append(pd.Timestamp(us * 1000))
        out["n_events"].append(n)
        out["was_gap"].append(gap)
        out["avg_value"].append(avg)
        out["locf"].append(locf)

    def gaps_between(a, b):
        return (b - a) // step_us - (0 if (b - a) % step_us else 1)

    for pdf in pdfs:
        pdf = pdf.sort_values("bucket")
        for ts, n, avg in zip(pdf["bucket"], pdf["n_events"], pdf["avg_value"]):
            if pd.isna(ts):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and us <= last_us:
                emit(us, int(n), None, float(avg), None)  # disorder
                continue
            if last_us is not None and gaps_between(last_us, us) > max_gap_buckets:
                # Far-jump guard: one corrupt far-future bucket must not
                # emit millions of fill rows, and must not wedge the key
                # either. The observed row emits flagged 2 (truncated —
                # LOUD, not silent) but state does NOT advance: advancing
                # to a poison bucket would classify every later sane
                # bucket (all ≤ poison ts) as disorder forever. Instead
                # the bucket becomes a regime-change CANDIDATE: a second
                # far bucket landing within max_gap_buckets after the
                # candidate confirms the jump is real (clock/backfill
                # regime change), the candidate is adopted as state, and
                # normal fill resumes from it. A sane bucket near the
                # old state instead discards the candidate as corrupt.
                if (
                    cand_us is not None
                    and us > cand_us
                    and gaps_between(cand_us, us) <= max_gap_buckets
                ):
                    last_us, last_avg = cand_us, cand_avg
                    cand_us = cand_avg = None
                    # fall through: normal fill from the adopted state
                else:
                    emit(us, int(n), 2, float(avg), float(avg))
                    cand_us, cand_avg = us, float(avg)
                    continue
            if last_us is not None:
                g = last_us + step_us
                while g < us:
                    emit(g, 0, 1, None, last_avg)
                    g += step_us
            emit(us, int(n), 0, float(avg), float(avg))
            last_us, last_avg = us, float(avg)
            cand_us = cand_avg = None
    state.update((last_us, last_avg, cand_us, cand_avg))
    yield pd.DataFrame(
        {
            "key": [series_key] * len(out["bucket"]),
            "bucket": out["bucket"],
            "n_events": pd.array(out["n_events"], dtype="Int64"),
            "was_gap": pd.array(out["was_gap"], dtype="Int32"),
            "avg_value": pd.array(out["avg_value"], dtype="float64"),
            "avg_value_locf": pd.array(out["locf"], dtype="float64"),
        }
    )


def streaming_gapfill_locf(
    buckets: DataFrame,
    step_us: int = 3_600_000_000,
    max_gap_buckets: int = 10_000,
) -> DataFrame:
    """Dense gap-filled stream over closed (key, bucket, n_events,
    avg_value) rows. In-order replay from each key's first bucket
    equals the batch ``bucket_gapfill`` restricted to that range."""

    def fn(key, pdfs, state):
        return _gapfill_state_fn(
            key, pdfs, state, step_us=step_us, max_gap_buckets=max_gap_buckets
        )

    return (
        buckets.select("key", "bucket", "n_events", "avg_value")
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=_GAPFILL_OUTPUT,
            stateStructType=_GAPFILL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
