"""Bucketed tables — co-located joins and aggregations without a
shuffle (SURVEY "Partitioning & shuffle": bucketing for co-located
joins).

Writing both sides of a recurring fact-fact join bucketed (and sorted)
by the join key means every future join/aggregation on that key is
exchange-free: Spark's scan reports the bucket hash-partitioning, the
sort-merge join consumes buckets directly. At 100 TB this converts the
most expensive recurring shuffle in the pipeline into a one-time layout
cost at write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tfl_realtime_lakehouse_spark.sources.tables import drop_table_and_location


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table."""
    spark = df.sparkSession
    drop_table_and_location(spark, table_name)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts this plans as a zero-exchange sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Stats-friendly clustered parquet write: range-repartition on the
    cluster key, then sort within each partition before writing.

    Every output file then covers a narrow, non-overlapping key range,
    so its parquet row-group min/max statistics become selective — a
    point or range predicate on the cluster key skips most files/row
    groups at scan time (the open-format stand-in for Z-ordering on a
    single key). At 100 TB this is the difference between a pruned read
    of a few files and a full scan when filtering on a non-partition
    column.
    """
    cols = [df[c] for c in cluster_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
