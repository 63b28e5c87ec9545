"""Model-DAG runner tests: materialization into staging/marts databases,
DQ wiring, lineage-as-data report."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.plans.runner import run_pipeline
from tfl_realtime_lakehouse_spark.sources.tables import write_bronze

ROWS = [
    ("S1", "central", "P1", "D", 100, "2025-01-01T10:00:00Z"),
    ("S1", "central", "P1", "D", 90, "2025-01-01T10:04:00Z"),
    ("S1", "central", "P1", "D", 80, "2025-01-01T10:09:00Z"),
    ("S2", "central", "P1", "D", 70, "2025-01-01T10:02:00Z"),
    ("S2", "central", "P1", "D", 60, "2025-01-01T10:30:00Z"),
]


def test_run_pipeline_report_and_tables(spark, tmp_path):
    raw_dir = str(tmp_path / "bronze")
    df = spark.createDataFrame(
        ROWS,
        "stopId string, lineId string, platformName string, destinationName string, "
        "timeToStation long, timestamp string",
    ).withColumn("date", F.lit("2025-01-01").cast("date"))
    write_bronze(df, raw_dir)

    report = run_pipeline(spark, raw_dir, save=True)
    json.dumps(report)  # must be JSON-serializable (lineage as data)
    assert report["ok"] is True
    assert [m["model"] for m in report["models"]] == ["stg_arrivals", "fct_headways"]
    assert report["models"][0]["rows"] == 5
    assert report["models"][1]["rows"] == 2  # (central,S1,10h), (central,S2,10h)
    assert {(e["from"], e["to"]) for e in report["lineage"]} == {
        (f"parquet://{raw_dir}", "staging.stg_arrivals"),
        ("staging.stg_arrivals", "marts.fct_headways"),
    }
    # materialized tables queryable through the catalog (CTAS parity, S9)
    assert spark.table("staging.stg_arrivals").count() == 5
    assert spark.table("marts.fct_headways").count() == 2
    # all reference checks green on clean data
    assert all(
        c["status"] == "pass"
        for m in report["models"]
        for c in m["checks"]
        if c["severity"] == "error"
    )


def test_run_pipeline_empty_input_skips_checks(spark, tmp_path):
    report = run_pipeline(spark, str(tmp_path / "missing"), save=False)
    assert report["ok"] is True
    assert report["models"][0]["rows"] == 0
    assert all(
        c["status"] == "skipped" for m in report["models"] for c in m["checks"]
    )
