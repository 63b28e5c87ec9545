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


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable equi-width histogram sketch — the quantile member of
    the sketch family (HLL = cardinality, CMS = point frequency,
    Misra-Gries = heavy hitters). Fixed [lo, hi) range, ``bins``
    buckets, out-of-range values clipped into the edge buckets.

    Why this shape at 100 TB: the sketch is AT MOST ``bins`` rows per
    group regardless of corpus size (map-side partial agg collapses
    each partition to that bound before the exchange), shard sketches
    merge by counter addition (:func:`histogram_merge`), and any
    quantile is answered from the bounded sketch with error ≤ one bin
    width — no data rescan, unlike an exact percentile. Integer
    counters and FLOOR bucketing make the whole sketch deterministic
    and ANSI-SQL-reproducible (no probabilistic hashing at all).

    Returns (group_cols..., bucket, cnt).
    """
    group_cols = group_cols or []
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram shards by counter addition (same contract as
    countmin_merge: disjoint shards sum exactly)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, the
    midpoint of the first bucket whose cumulative count reaches
    ⌈q·n⌉ (type-1 selection lifted to buckets — error ≤ width/2 for
    in-range data). One window over the ≤``bins``-row sketch per
    group plus one aggregate; everything downstream of the sketch is
    model-sized. Returns (group_cols..., n, q_<label> per q)."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    width = (hi - lo) / bins
    w = (
        Window.partitionBy(*group_cols).orderBy("bucket")
        if group_cols
        else Window.partitionBy(F.lit(1)).orderBy("bucket")
    )
    wn = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wn)
    )
    outs = [F.max("n").cast("bigint").alias("n")]
    for q in qs:
        label = str(q).replace("0.", "p")
        target = F.ceil(F.lit(q) * F.col("n"))
        hit = F.when(
            F.col("cum") >= target,
            F.lit(lo) + (F.col("bucket") + F.lit(0.5)) * F.lit(width),
        )
        outs.append(F.round(F.min(hit), 6).alias(label))
    return cum.groupBy(*group_cols).agg(*outs)
