"""Streaming near-duplicate suppression: MinHash-LSH band buckets as
keyed state.

Batch near-dedup (operators/dedup.py) sees the whole corpus at once; a
continuous ingest pipeline needs the same decision ONLINE — "has content
like this been ingested before?" — without re-scanning history. The
streaming formulation:

1. **Stateless band codes** — per document, MinHash signatures are
   computed as per-row higher-order functions (``array_min`` over
   ``xxhash64`` of the shingle array, one expression per hash seed) and
   folded into ``bands`` band hashes. No explode→groupBy: a streaming
   stage must not shuffle per shingle, and the per-row formulation keeps
   the map stage stateless (the batch operator uses the exploded plan
   because at rest the corpus is wide, not long; here each row carries
   its own shingles).
2. **Stateful bucket registry** — ``applyInPandasWithState`` keyed on
   (band_id, band_hash): state is ONE long (the first document id that
   occupied the bucket), so state size is O(distinct buckets), bounded
   by corpus content, not throughput. Every (doc, band) row is emitted
   with the bucket owner and an ``is_new`` flag.
3. **Downstream rollup** — a doc is a near-dup CANDIDATE of the bucket
   owner if ANY band collides (standard LSH OR-construction). That
   rollup is a second stateful step, so it belongs to the batch/gold
   side (foreachBatch or a downstream batch query over the sink), same
   medallion split the headway pipeline uses.

Exact duplicates collide on every band; near-duplicates (jaccard s)
collide on a band with probability s^rows_per_band.

Reference parity: extends the reference's batch-only dedup surface
(tfl-realtime-lakehouse `airflow/dags/tfl_ingest_dag.py:16-23` keeps an
order-preserving exact dedup in its ingest loop) to content-similarity
suppression under Structured Streaming semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tfl_realtime_lakehouse_spark.operators.text import shingles

_BAND_OUTPUT = T.StructType(
    [
        T.StructField("band_id", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("is_new", T.BooleanType()),
    ]
)
_BAND_STATE = T.StructType([T.StructField("first_doc", T.LongType())])


def band_codes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Per-row MinHash band hashes in long format (id, band_id,
    band_hash). Pure stateless projection — streaming-safe."""
    if num_hashes % bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    rows_per_band = num_hashes // bands
    sh = shingles(text_col, n)
    band_cols = []
    for b in range(bands):
        mins = [
            F.array_min(
                F.transform(sh, lambda s, seed=i: F.xxhash64(s, F.lit(seed)))
            )
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.xxhash64(*mins).alias("band_hash"))
        )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))


def _bucket_state_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    band_id, band_hash = key
    first = state.get[0] if state.exists else None
    out_doc, out_first, out_new = [], [], []
    docs: list[int] = []
    for pdf in pdfs:
        docs.extend(int(d) for d in pdf["doc_id"])
    # deterministic within-batch winner: the smallest doc id claims a
    # fresh bucket, exactly like the batch operators' min-id convention
    for doc in sorted(docs):
        if first is None:
            first = doc
        out_doc.append(doc)
        out_first.append(first)
        # re-delivery of the owner stays "new" so replays are idempotent
        out_new.append(doc == first)
    if first is not None:
        state.update((first,))
    yield pd.DataFrame(
        {
            "band_id": band_id,
            "band_hash": band_hash,
            "doc_id": out_doc,
            "first_doc": out_first,
            "is_new": out_new,
        }
    )


def streaming_neardup_bands(docs: DataFrame, **band_kwargs) -> DataFrame:
    """Stream of per-(doc, band) novelty decisions against all previously
    ingested content. State per bucket: one long."""
    return (
        band_codes(docs, **band_kwargs)
        .groupBy("band_id", "band_hash")
        .applyInPandasWithState(
            _bucket_state_fn,
            outputStructType=_BAND_OUTPUT,
            stateStructType=_BAND_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rollup_candidates(band_rows: DataFrame) -> DataFrame:
    """Batch rollup of the band stream: per doc, is it a near-dup
    candidate (ANY band already owned by an earlier doc), and of whom.
    Runs on the materialized band sink (the gold side of the split)."""
    return (
        band_rows.groupBy("doc_id")
        .agg(
            F.min(F.when(~F.col("is_new"), F.col("first_doc"))).alias("candidate_of"),
            (~F.min("is_new")).alias("is_candidate"),
        )
        .select("doc_id", "is_candidate", "candidate_of")
    )
