"""Streaming per-source quality scorecard — the realtime twin of the
batch ``docs_source_quality_profile`` query (X190).

The batch query's per-source state decomposes into four MERGEABLE
components:

- volume: a row count (adds);
- mean length / mean quality: a bigint char sum and an EXACT
  decimal(27,12) quality sum (add — decimal addition is associative
  and order-free, the repo's standing exact-sum idiom);
- exact-dup ratio: the set of distinct md5(text) hashes (unions).
  This leg is the one whose state grows with data — O(distinct docs
  per source). That is inherent to an EXACT distinct (same as any
  streaming dedup), and it is what makes the twin bit-identical to
  the batch query; the production swap at 100 TB is the repo's KMV
  sketch (streaming/kmv.py — mergeable k-min state, bounded at k per
  source) at the cost of the estimate being approximate;
- lang-mix entropy: a (lang → count) map, bounded by |langs|.

All features (md5 hash, decimal-cast quality score, char count) are
computed JVM-side with the batch query's exact expression trees before
the stateful operator; Python only merges counters, sets, and Decimals
(the kmv.py discipline). The FLOAT math (ratios, -p·ln p, the final
roundings) runs JVM-side AFTER the stateful operator, expression-tree-
identical to the batch query — so after ANY prefix of micro-batches
the emission equals the batch query over the union, bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# raw mergeable components; ratios/entropy are a JVM post-projection
_RAW = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("sch", T.LongType()),
        T.StructField("sq", T.StringType()),  # exact Decimal, stringified
        T.StructField("lcnts", T.ArrayType(T.LongType())),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("sch", T.LongType()),
        T.StructField("sq", T.StringType()),
        T.StructField("hs", T.ArrayType(T.StringType())),
        T.StructField("langs", T.ArrayType(T.StringType())),
        T.StructField("lcnts", T.ArrayType(T.LongType())),
    ]
)

_NULL_LANG = "\x00null"  # state-internal sentinel: arrays can't hold None keys


def _scorecard_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (source,) = key
    if state.exists:
        n_docs, sch, sq_str, hs, langs, lcnts = state.get
        sq = Decimal(sq_str)
        hset = set(hs)
        lmap = dict(zip(langs, lcnts))
    else:
        n_docs, sch, sq, hset, lmap = 0, 0, Decimal(0), set(), {}
    for pdf in pdfs:
        n_docs += len(pdf)
        # exact bigint accumulation: with nulls present pandas holds
        # n_chars as float64, and dropna().sum() in IEEE doubles can
        # diverge from the batch SUM(BIGINT) past 2^53 chars/source —
        # cast back to int64 per element before summing.
        sch += int(pdf["n_chars"].dropna().astype("int64").sum())
        # decimal(27,12) values arrive as Decimal objects — exact sum
        sq += sum((d for d in pdf["_sq"] if d is not None), Decimal(0))
        hset.update(h for h in pdf["_h"] if h is not None)
        for lang, c in pdf["lang"].value_counts(dropna=False).items():
            k = _NULL_LANG if pd.isna(lang) else str(lang)
            lmap[k] = lmap.get(k, 0) + int(c)
    langs = sorted(lmap)
    state.update(
        (n_docs, sch, str(sq), sorted(hset), langs, [lmap[k] for k in langs])
    )
    yield pd.DataFrame(
        {
            "source": [source],
            "n_docs": [n_docs],
            "n_distinct": [len(hset)],
            "sch": [sch],
            "sq": [str(sq)],
            "lcnts": [[lmap[k] for k in langs]],
        }
    )


def streaming_source_scorecard(docs: DataFrame) -> DataFrame:
    """Per-source streaming scorecard: one full scorecard row per
    source per micro-batch, covering every document seen so far —
    identical columns and values to the batch query over the union."""
    from tfl_realtime_lakehouse_spark.queries.wave6 import _score_col

    base = docs.select(
        "source",
        "n_chars",
        "lang",
        # identical null policy + expression tree to the batch query:
        # null text contributes volume but neither quality nor a hash.
        # Arithmetic null propagation, not WHEN(score) — see the batch
        # query's comment (CSE is disabled inside conditional branches)
        (_score_col() + F.when(F.col("text").isNotNull(), F.lit(0.0)))
        .cast("decimal(27,12)")
        .alias("_sq"),
        F.md5("text").alias("_h"),
    )
    raw = base.groupBy("source").applyInPandasWithState(
        _scorecard_state_fn,
        outputStructType=_RAW,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # JVM post-projection, expression-tree-identical to the batch query.
    # Entropy: exact-decimal fold over the bounded lang-count array —
    # the term tree (-p·ln p → decimal(27,12)) matches the batch agg,
    # and exact addition makes the fold order irrelevant.
    nt = F.aggregate(
        "lcnts", F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    sq_dec = F.col("sq").cast("decimal(38,12)")

    def term(c):
        p = c.cast("double") / F.col("_nt").cast("double")
        return (-p * F.log(p)).cast("decimal(27,12)")

    ent_sum = F.aggregate(
        F.transform("lcnts", term),
        F.lit("0").cast("decimal(38,12)"),
        lambda acc, x: (acc + x).cast("decimal(38,12)"),
    )
    return (
        raw.withColumn("_nt", nt)
        .withColumn(
            "lang_entropy_bits",
            F.round(ent_sum.cast("double") / F.log(F.lit(2.0)), 6),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_ratio"),
            F.round(F.col("sch").cast("double") / F.col("n_docs"), 6).alias(
                "mean_chars"
            ),
            F.round(sq_dec.cast("double") / F.col("n_docs"), 6).alias(
                "mean_quality"
            ),
            "lang_entropy_bits",
        )
    )
