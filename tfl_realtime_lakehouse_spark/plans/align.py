"""Aligned line snapshot — the reference's CLI one-shot (entry point 3,
SURVEY §3: ``tfl_align.py`` "line name → aligned snapshot parquet")
re-designed Spark-first.

The reference enriches arrivals with stop metadata through a Python
dict lookup during row flattening (tfl_align.py:140-175) — an implicit
hash join (SURVEY J1). Here it is a real **broadcast left join**: the
stop dim is tiny, the arrivals side never shuffles, and the enrichment
scales to any snapshot size. The raw payload column keeps the whole
arrival as JSON (``to_json(struct(*))``), matching the reference's
``raw`` column contract (tfl_align.py:172-174,192-194).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.sources.http import TfLArrivalsClient

# 10-field projection of an arrival row (tfl_align.py:160-175), before
# stop-dim enrichment.
_ARRIVAL_FIELDS = [
    ("naptanId", "string"),
    ("lineId", "string"),
    ("stationName", "string"),
    ("platformName", "string"),
    ("destinationName", "string"),
    ("expectedArrival", "string"),
    ("timeToStation", "long"),
    ("vehicleId", "string"),
]


def align_line_snapshot(
    spark: SparkSession,
    client: TfLArrivalsClient,
    line: str,
    snapshot_ts: datetime | None = None,
) -> DataFrame:
    """line name → enriched, typed snapshot DataFrame.

    Driver-side HTTP (resolve line, stop dim, fan-out arrivals fetch via
    the client's threadpool) ends at ``createDataFrame``; everything
    after is declarative: broadcast enrichment, coalesce fallback,
    timestamp parse (null on malformed), raw JSON serialization.
    """
    snapshot_ts = snapshot_ts or datetime.now(timezone.utc)
    line_id = client.resolve_line_id(line)
    stops = client.get_stoppoints(line_id)
    arrivals = client.fetch_all([s.get("naptanId", "") for s in stops if s.get("naptanId")])

    schema = ", ".join(f"{n} {t}" for n, t in _ARRIVAL_FIELDS)
    arr_df = spark.createDataFrame(
        [{k: r.get(k) for k, _ in _ARRIVAL_FIELDS} for r in arrivals], schema
    )
    stop_dim = spark.createDataFrame(
        [
            {"stop_naptan": s.get("naptanId"), "commonName": s.get("commonName")}
            for s in stops
        ],
        "stop_naptan string, commonName string",
    )

    enriched = arr_df.join(
        F.broadcast(stop_dim), arr_df.naptanId == stop_dim.stop_naptan, "left"
    )
    return enriched.select(
        F.lit(snapshot_ts.isoformat()).alias("snapshot_ts"),
        F.lit(line_id).alias("line_id"),
        F.col("naptanId").alias("stop_id"),
        # J1/P6: arrival-provided name falls back to the stop dim's.
        F.coalesce("stationName", "commonName").alias("station_name"),
        F.col("platformName").alias("platform_name"),
        F.col("destinationName").alias("destination_name"),
        F.col("expectedArrival").alias("expected_arrival"),
        # F7: ISO parse, UTC, coerce-to-null on malformed.
        F.col("expectedArrival").try_cast("timestamp").alias("expected_arrival_ts"),
        F.col("timeToStation").alias("time_to_station_s"),
        F.col("vehicleId").alias("vehicle_id"),
        # F9: whole row preserved as JSON.
        F.to_json(F.struct(*[n for n, _ in _ARRIVAL_FIELDS])).alias("raw"),
    )


def write_snapshot(df: DataFrame, out_dir: str, line_id: str, snapshot_ts: datetime) -> str:
    """Single snapshot parquet, reference naming ``arrivals_{line}_{ts}``
    (tfl_align.py:187-196)."""
    ts = snapshot_ts.strftime("%Y%m%d_%H%M%S")
    path = f"{out_dir}/arrivals_{line_id}_{ts}.parquet"
    df.write.mode("overwrite").parquet(path)
    return path
