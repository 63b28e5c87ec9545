"""Silver: the staging contract transform.

Re-expresses the reference staging model (``dbt_project/models/staging/
stg_arrivals.sql:18-25``): project + rename + re-type every column, with
try_cast (NULL on malformed) for the event timestamp and a processing-
time audit column. Pure DataFrame function — identical under batch
replay and ``foreachBatch`` streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stg_arrivals(raw: DataFrame) -> DataFrame:
    """bronze arrivals → typed staging rows.

    Column contract (FIXTURES.md §2): line_id, stop_id, platform_name,
    destination_name, time_to_station_s, event_ts, ingested_at. Casts are
    ``try_cast`` so malformed inputs degrade to NULL (the reference's
    only malformed-data handling, stg_arrivals.sql:24).
    """
    return raw.select(
        F.col("lineId").try_cast("string").alias("line_id"),
        F.col("stopId").try_cast("string").alias("stop_id"),
        F.col("platformName").try_cast("string").alias("platform_name"),
        F.col("destinationName").try_cast("string").alias("destination_name"),
        F.col("timeToStation").try_cast("int").alias("time_to_station_s"),
        F.col("timestamp").try_cast("timestamp").alias("event_ts"),
        F.current_timestamp().alias("ingested_at"),
    )
