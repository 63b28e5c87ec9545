"""Sources & sinks: parquet lakehouse IO and the (offline-able) HTTP ingest."""

from tfl_realtime_lakehouse_spark.sources.tables import (
    read_table,
    read_raw_arrivals,
    write_bronze,
)

__all__ = ["read_table", "read_raw_arrivals", "write_bronze"]
