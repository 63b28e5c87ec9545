"""Aligned-snapshot job tests (reference entry point 3): broadcast stop
enrichment, coalesce fallback, malformed-timestamp coercion, raw JSON."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from tfl_realtime_lakehouse_spark.plans.align import align_line_snapshot, write_snapshot
from tfl_realtime_lakehouse_spark.sources.http import TfLArrivalsClient

LINE_META = [{"id": "central", "name": "Central"}]
STOPS = [
    {"naptanId": "S1", "commonName": "Stop One"},
    {"naptanId": "S2", "commonName": "Stop Two"},
    {"commonName": "no-naptan, skipped"},
]
ARRIVALS = {
    "S1": [
        {
            "naptanId": "S1",
            "lineId": "central",
            "stationName": None,  # → falls back to dim commonName
            "platformName": "P1",
            "destinationName": "Epping",
            "expectedArrival": "2025-01-01T10:00:00Z",
            "timeToStation": 60,
            "vehicleId": "V1",
        }
    ],
    "S2": [
        {
            "naptanId": "S2",
            "lineId": "central",
            "stationName": "API Name",  # → wins over dim
            "platformName": "P2",
            "destinationName": "Epping",
            "expectedArrival": "garbage",  # → ts NULL
            "timeToStation": 120,
            "vehicleId": "V2",
        }
    ],
}


def fetcher(url, params):
    if url.endswith("/Line/Central"):
        return 200, LINE_META
    if url.endswith("/StopPoints"):
        return 200, STOPS
    stop = url.split("/StopPoint/")[1].split("/")[0]
    return 200, ARRIVALS.get(stop, [])


def test_align_snapshot_end_to_end(spark, tmp_path):
    client = TfLArrivalsClient(fetcher=fetcher, sleep=lambda s: None)
    ts = datetime(2025, 1, 1, 10, 0, tzinfo=timezone.utc)
    df = align_line_snapshot(spark, client, "Central", snapshot_ts=ts)
    rows = {r.stop_id: r for r in df.collect()}
    assert set(rows) == {"S1", "S2"}
    # J1 enrichment: API name wins, dim name fills the gap
    assert rows["S1"].station_name == "Stop One"
    assert rows["S2"].station_name == "API Name"
    # F7: malformed expectedArrival → NULL, valid one parses
    assert rows["S1"].expected_arrival_ts is not None
    assert rows["S2"].expected_arrival_ts is None
    # F9: raw JSON round-trips
    raw = json.loads(rows["S1"].raw)
    assert raw["naptanId"] == "S1" and raw["timeToStation"] == 60
    assert rows["S1"].line_id == "central" and rows["S1"].snapshot_ts == ts.isoformat()

    path = write_snapshot(df, str(tmp_path), "central", ts)
    assert spark.read.parquet(path).count() == 2
    assert "arrivals_central_20250101_100000" in path


def test_align_uses_broadcast_join(spark):
    client = TfLArrivalsClient(fetcher=fetcher, sleep=lambda s: None)
    df = align_line_snapshot(spark, client, "Central")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
