"""Streaming KMV (k-minimum-values) distinct sketch — the realtime twin
of the batch ``agg_kmv_sketch`` query.

Exact streaming COUNT(DISTINCT) needs O(distinct) state per key; the
KMV sketch needs exactly k longs. Because k-min sets are mergeable
(min-of-mins), the cross-batch update is: union the batch's distinct
hashes with the stored set, keep the k smallest — the same merge the
batch query demonstrates across groups, applied across TIME. The
estimate after any prefix of batches equals the batch sketch over the
union of those batches' rows (set-union is order-insensitive), which is
what the batch-equivalence test pins.

The 60-bit hash (``md5('kmv:' || user)`` first 15 hex digits, the
cross-engine idiom used throughout) is computed JVM-side BEFORE the
stateful operator, so the python state function only merges longs —
the Arrow batch carries one column, and per-key state is a bounded
``array<long>`` of ≤ k values at any throughput.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KMV_K = 64
_SCALE = float(1 << 60)

_KMV_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_mins", T.IntegerType()),
        T.StructField("est_distinct", T.DoubleType()),
    ]
)

_KMV_STATE = T.StructType([T.StructField("mins", T.ArrayType(T.LongType()))])


def kmv_estimate(mins: list) -> float:
    """(k−1)·2⁶⁰ / m_k for a full sketch; exact |mins| below k."""
    if len(mins) < KMV_K:
        return float(len(mins))
    return (KMV_K - 1) * _SCALE / float(mins[-1])


def _kmv_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (series_key,) = key
    (mins,) = state.get if state.exists else ([],)
    acc = set(mins)
    for pdf in pdfs:
        acc.update(int(h) for h in pdf["hv"] if not pd.isna(h))
    merged = sorted(acc)[:KMV_K]
    state.update((merged,))
    yield pd.DataFrame(
        {
            "key": [series_key],
            "n_mins": [len(merged)],
            "est_distinct": [kmv_estimate(merged)],
        }
    )


def streaming_kmv_distinct(
    events: DataFrame,
    key_col: str = "event_type",
    member_col: str = "user_id",
) -> DataFrame:
    """Per-key approximate distinct-count stream: one (key, n_mins,
    est_distinct) row per key per micro-batch, state bounded at
    ``KMV_K`` longs per key."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col(member_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (
        events.select(F.col(key_col).alias("key"), hv.alias("hv"))
        .groupBy("key")
        .applyInPandasWithState(
            _kmv_state_fn,
            outputStructType=_KMV_OUTPUT,
            stateStructType=_KMV_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Trailing-window twin of `events_kmv_trailing_distinct`

_KMV_TRAIL_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("n_mins", T.IntegerType()),
        T.StructField("est_distinct_7d", T.DoubleType()),
    ]
)

# per key: parallel arrays — day epochs, per-day set sizes, and the
# concatenated k-min values (≤ window_days × KMV_K longs total)
_KMV_TRAIL_STATE = T.StructType(
    [
        T.StructField("days", T.ArrayType(T.LongType())),
        T.StructField("sizes", T.ArrayType(T.IntegerType())),
        T.StructField("mins", T.ArrayType(T.LongType())),
    ]
)

_DAY_US = 86_400_000_000


def _trail_estimate(day_sets: dict, anchor: int, window_days: int) -> tuple:
    lo = anchor - (window_days - 1) * _DAY_US
    union = set()
    for d, s in day_sets.items():
        if lo <= d <= anchor:
            union.update(s)
    merged = sorted(union)[:KMV_K]
    return len(merged), kmv_estimate(merged)


def _kmv_trailing_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    window_days: int = 7,
) -> Iterator[pd.DataFrame]:
    (series_key,) = key
    if state.exists:
        days, sizes, mins = state.get
        day_sets: dict[int, set] = {}
        off = 0
        for d, n in zip(days, sizes):
            day_sets[int(d)] = set(int(v) for v in mins[off : off + n])
            off += n
    else:
        day_sets = {}
    out = {c: [] for c in ("day", "n_mins", "est")}
    open_day = max(day_sets) if day_sets else None
    for pdf in pdfs:
        pdf = pdf.sort_values("day")
        for ts, hv in zip(pdf["day"], pdf["hv"]):
            if pd.isna(ts) or pd.isna(hv):
                continue
            us = int(pd.Timestamp(ts).value // 1000)
            if open_day is not None and us < open_day:
                continue  # disorder: upstream emits closed days in order
            if open_day is not None and us > open_day:
                # the open day just CLOSED — emit its trailing estimate
                n, est = _trail_estimate(day_sets, open_day, window_days)
                out["day"].append(pd.Timestamp(open_day * 1000))
                out["n_mins"].append(n)
                out["est"].append(est)
                # expire days that can never contribute again
                lo = us - (window_days - 1) * _DAY_US
                day_sets = {d: s for d, s in day_sets.items() if d >= lo}
            open_day = us if open_day is None or us > open_day else open_day
            s = day_sets.setdefault(us, set())
            s.add(int(hv))
            if len(s) > KMV_K:
                day_sets[us] = set(sorted(s)[:KMV_K])
    days_out, sizes_out, mins_out = [], [], []
    for d in sorted(day_sets):
        vals = sorted(day_sets[d])[:KMV_K]
        days_out.append(d)
        sizes_out.append(len(vals))
        mins_out.extend(vals)
    state.update((days_out, sizes_out, mins_out))
    yield pd.DataFrame(
        {
            "key": [series_key] * len(out["day"]),
            "day": out["day"],
            "n_mins": pd.array(out["n_mins"], dtype="Int32"),
            "est_distinct_7d": pd.array(out["est"], dtype="float64"),
        }
    )


def streaming_kmv_trailing(
    events: DataFrame,
    key_col: str = "event_type",
    member_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-``window_days`` distinct estimate stream — the realtime
    twin of the batch ``events_kmv_trailing_distinct`` rollup: per key
    the state is one bottom-``KMV_K`` set PER LIVE DAY (≤ window_days
    sets, ≤ window_days × 64 longs — bounded at any throughput, the
    same mergeability the batch query exploits across the day spine).
    A day's trailing estimate emits when the day CLOSES (the first
    event of a later day arrives — the gapfill trailing contract);
    out-of-order days are ignored. In-order replay from the first day
    equals the batch query restricted to closed days (pinned by the
    batch-equivalence test)."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col(member_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")

    def fn(key, pdfs, state):
        return _kmv_trailing_state_fn(key, pdfs, state, window_days=window_days)

    return (
        events.select(
            F.col(key_col).alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            hv.alias("hv"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=_KMV_TRAIL_OUTPUT,
            stateStructType=_KMV_TRAIL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
