"""Mergeable frequency sketches: Count-Min (Cormode & Muthukrishnan 2005).

Complements the engine's other sketch families (HLL for cardinality,
Misra-Gries for heavy hitters): CMS answers point frequency queries
with a one-sided error guarantee — estimates never undercount, and
overcount by at most εN with probability 1−δ for width = ⌈e/ε⌉ and
depth = ⌈ln 1/δ⌉.

Why this shape at 100 TB: the sketch relation is AT MOST depth×width
rows regardless of corpus size (the groupBy's map-side partial
aggregation collapses each partition to that bound before the
exchange), sketches of disjoint shards MERGE by elementwise counter
addition (one more groupBy-sum), and estimation for a probe set is a
bounded equi-join against the sketch — no full-data rescan.

Hash family: the cross-engine 60-bit md5-prefix hash
(``operators.dedup.md5_prefix_hash``) by default, so the whole sketch —
bucket assignment, counters, min-estimate — is reproducible in ANSI SQL
and hash-checked by a DuckDB oracle; pass ``hash_family="xxhash64"``
for the cheaper JVM-native row-hash when cross-engine replay is not
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.operators.dedup import md5_prefix_hash


def _bucket(key: Column, d: int, width: int, hash_family: str) -> Column:
    if hash_family == "md5":
        # DuckDB replica: ('0x' || SUBSTR(MD5(d || ':' || key), 1, 15))
        #                 ::BIGINT % width   (hash is positive, % is safe)
        return md5_prefix_hash(
            F.concat(F.lit(f"{d}:"), key.cast("string"))
        ) % width
    return F.pmod(F.xxhash64(F.lit(d), key), F.lit(width))


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    hash_family: str = "md5",
) -> DataFrame:
    """Build a Count-Min sketch over ``key_col``: (d, bucket, cnt) with
    at most depth×width rows. One explode (×depth, cheap row clone) +
    one map-side-combined groupBy — the exchange moves ≤ depth×width
    rows per upstream partition, not the data."""
    key = F.col(key_col)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(key, d, width, hash_family).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.d", "c.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches of disjoint shards: elementwise counter sum.
    The defining property of the sketch family — shard-local builds +
    one bounded merge instead of a global pass."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    hash_family: str = "md5",
) -> DataFrame:
    """Point-frequency estimates for a probe key set: est(key) =
    min_d cnt[d, h_d(key)] — never below the true count. The probe
    relation is small by construction, the sketch is ≤ depth×width
    rows; the equi-join is broadcast-sized on both sides."""
    key = F.col(key_col)
    hashed = probes.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(key, d, width, hash_family).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.d", "c.bucket")
    return (
        hashed.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        # a bucket no key ever hit has no sketch row: its counter is 0
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )
