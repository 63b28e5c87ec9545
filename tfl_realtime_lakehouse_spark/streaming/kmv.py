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
