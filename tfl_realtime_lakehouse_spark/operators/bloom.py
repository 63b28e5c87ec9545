"""Bloom-filter semi-join pruning — a DataFrame-native runtime filter.

The pattern behind Spark's own runtime row-level filtering (and every
warehouse's "join pruning" feature): before shuffling a huge fact table
into an exact join, knock out the rows that cannot possibly match using
a fixed-size bloom filter built from the dim side's keys.

Spark does not expose ``bloom_filter_agg`` / ``might_contain`` to SQL
users, so the filter here is built from first principles as DATA:

- build: each dim key hashes to ``n_hashes`` bit positions in an
  ``n_bits``-wide bitset; the bitset is a DataFrame of
  ``(word, bits)`` rows — position p lives in word ``p >> 6`` as bit
  ``p & 63`` — aggregated with ``bit_or``. The relation has at most
  ``n_bits / 64`` rows REGARDLESS of dim cardinality: it is a sketch,
  not a copy, so broadcasting it is O(n_bits), never O(|dim|).
- probe: the fact side computes the same ``n_hashes`` words/bits and
  chains one BROADCAST join per hash against the bitmap, keeping rows
  whose bit is set in every probe. All probes are map-side: the fact
  table is never shuffled to be filtered.
- exactness: a bloom filter has no false negatives, so survivors ⊇ true
  matches; the final exact semi-join (now over the pruned survivors
  only) removes false positives. Result is bit-identical to a plain
  ``left_semi`` — the bloom stage only cuts the rows that pay the
  exact join's shuffle.

At 100 TB: the win is (fact rows shuffled) × (1 − selectivity); with
default sizing (2^17 bits, 3 hashes) the false-positive rate at
100k dim keys is ~1.3% — size ``n_bits`` ≈ 10×|dim| bits for ~1% FP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(
    dim: DataFrame, key: str, n_bits: int = 1 << 17, n_hashes: int = 3
) -> DataFrame:
    """Build the bloom bitset for ``dim[key]`` as a ``(word, bits)``
    DataFrame with ≤ ``n_bits / 64`` rows (one shuffle, on the word id)."""
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    return (
        dim.select(F.explode(positions).alias("pos"))
        .select(
            F.shiftrightunsigned(F.col("pos"), 6).alias("word"),
            # SQL shiftleft accepts a column shift count; the DataFrame
            # wrapper requires a Python int, hence the expr.
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_prune(
    fact: DataFrame,
    bitmap: DataFrame,
    key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key passes every bloom probe.

    One broadcast hash join per hash function, all map-side — the fact
    table is filtered in place with zero shuffles. An inner join on the
    word id doubles as the membership test: a word with no bits set has
    no bitmap row, so rows probing it drop out immediately.
    """
    out = fact
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        out = (
            out.withColumn(f"_p{i}", pos)
            .withColumn(f"_w{i}", F.shiftrightunsigned(F.col(f"_p{i}"), 6))
            .withColumn(
                f"_b{i}",
                F.expr(f"shiftleft(cast(1 as bigint), cast(_p{i} % 64 as int))"),
            )
            .drop(f"_p{i}")
            .join(
                F.broadcast(
                    bitmap.select(
                        F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}")
                    )
                ),
                f"_w{i}",
            )
            .filter(F.col(f"_bits{i}").bitwiseAND(F.col(f"_b{i}")) != 0)
            .drop(f"_w{i}", f"_b{i}", f"_bits{i}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Exact ``fact LEFT SEMI JOIN dim ON key`` with a bloom pre-filter:
    identical output to the plain semi-join, but only bloom survivors
    (true matches + ~1% false positives at the default sizing) enter the
    exact join's shuffle."""
    bitmap = bloom_bitmap(dim, key, n_bits, n_hashes)
    pruned = bloom_prune(fact, bitmap, key, n_bits, n_hashes)
    return pruned.join(dim.select(key), key, "left_semi")
