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
