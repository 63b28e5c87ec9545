"""Streaming tests: bronze file-stream → silver, watermarked hourly gold,
and the stateful headway operator — each driven with availableNow
triggers + memory sinks, and checked against the batch ground truth."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.plans import stg_arrivals
from tfl_realtime_lakehouse_spark.plans.marts import headway_events
from tfl_realtime_lakehouse_spark.sources.tables import write_bronze
from tfl_realtime_lakehouse_spark.streaming import (
    gold_hourly_stream,
    read_bronze_stream,
    streaming_headways,
)

ROWS = [
    ("S1", "central", "P1", "D", 100, "2025-01-01T10:00:00Z"),
    ("S1", "central", "P1", "D", 90, "2025-01-01T10:04:00Z"),
    ("S1", "central", "P1", "D", 80, "2025-01-01T10:10:00Z"),
    ("S2", "central", "P1", "D", 70, "2025-01-01T10:02:00Z"),
    ("S2", "central", "P1", "D", 60, "2025-01-01T11:07:00Z"),
    ("S1", "victoria", "P2", "D", 50, "2025-01-01T10:03:00Z"),
]


@pytest.fixture(scope="module")
def bronze_dir(spark, tmp_path_factory):
    raw_dir = str(tmp_path_factory.mktemp("stream-bronze"))
    df = spark.createDataFrame(
        ROWS,
        "stopId string, lineId string, platformName string, destinationName string, "
        "timeToStation long, timestamp string",
    ).withColumn("date", F.lit("2025-01-01").cast("date"))
    write_bronze(df, raw_dir)
    return raw_dir


def _run_stream(df, tmp_path, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_silver_stream_matches_batch(spark, bronze_dir, tmp_path):
    stream = stg_arrivals(read_bronze_stream(spark, bronze_dir))
    assert stream.isStreaming
    _run_stream(stream, tmp_path, "silver")
    got = spark.sql("select line_id, stop_id, event_ts from silver").collect()
    assert len(got) == len(ROWS)
    assert all(r.event_ts is not None for r in got)


def test_stateful_streaming_headways_match_batch_lag(spark, bronze_dir, tmp_path):
    raw_batch = spark.read.option("basePath", bronze_dir).parquet(f"{bronze_dir}/date=*")
    batch = {
        (r.line_id, r.stop_id, r.event_ts): r.headway_s
        for r in headway_events(stg_arrivals(raw_batch)).collect()
    }
    stream = streaming_headways(stg_arrivals(read_bronze_stream(spark, bronze_dir)))
    _run_stream(stream, tmp_path, "headways")
    got = {
        (r.line_id, r.stop_id, r.event_ts): r.headway_s
        for r in spark.sql(
            "select * from headways where headway_s is not null"
        ).collect()
    }
    assert got == batch  # single-batch replay ≡ batch lag semantics


def test_gold_hourly_stream_windows(spark, bronze_dir, tmp_path):
    stream = gold_hourly_stream(
        stg_arrivals(read_bronze_stream(spark, bronze_dir)), watermark="2 hours"
    )
    # update mode: append-mode windows would only finalize once a LATER
    # batch advances the watermark past window end (T4 divergence note).
    _run_stream(stream, tmp_path, "gold", mode="update")
    got = {
        (r.line_id, r.stop_id, r.hour.isoformat()): r.n_events
        for r in spark.sql("select * from gold").collect()
    }
    assert got[("central", "S1", "2025-01-01T10:00:00")] == 3
    assert got[("central", "S2", "2025-01-01T10:00:00")] == 1
    assert got[("central", "S2", "2025-01-01T11:00:00")] == 1
    assert got[("victoria", "S1", "2025-01-01T10:00:00")] == 1
