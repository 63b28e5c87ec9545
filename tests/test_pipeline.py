"""Reference-pipeline parity tests: bronze ingest layout, staging
contract (try_cast null-on-malformed, empty-input fallback), fct_headways
end-to-end, partition pruning."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.plans import fct_headways, stg_arrivals
from tfl_realtime_lakehouse_spark.schemas import STG_ARRIVALS_SCHEMA
from tfl_realtime_lakehouse_spark.sources.tables import read_raw_arrivals, write_bronze

RAW_ROWS = [
    # (stopId, lineId, platform, dest, tts, timestamp)
    ("S1", "central", "P1", "Epping", 120, "2025-01-01T10:00:00Z"),
    ("S1", "central", "P1", "Epping", 60, "2025-01-01T10:04:00Z"),
    ("S1", "central", "P1", "Epping", 30, "2025-01-01T10:10:00Z"),
    ("S2", "central", "P2", "Epping", 45, "2025-01-01T10:02:00Z"),
    ("S2", "central", "P2", "Epping", 45, "2025-01-01T10:30:00Z"),
    ("S1", "victoria", None, None, 9999, "2025-01-01T10:05:00Z"),
    # malformed timestamp → event_ts NULL → dropped by headways filter
    ("S1", "central", "P1", "Epping", 10, "not-a-timestamp"),
    ("S1", "central", "P1", None, -5, ""),
]


@pytest.fixture(scope="module")
def bronze_dir(spark, tmp_path_factory):
    raw_dir = str(tmp_path_factory.mktemp("bronze"))
    df = spark.createDataFrame(
        RAW_ROWS,
        "stopId string, lineId string, platformName string, destinationName string, "
        "timeToStation long, timestamp string",
    ).withColumn("date", F.lit("2025-01-01").cast("date"))
    write_bronze(df, raw_dir)
    # second (empty-schema-compatible) partition day
    df2 = df.limit(1).withColumn("date", F.lit("2025-01-02").cast("date"))
    write_bronze(df2, raw_dir)
    return raw_dir


def test_bronze_layout_is_hive_partitioned(bronze_dir):
    import glob

    assert glob.glob(f"{bronze_dir}/date=2025-01-01/*.parquet")
    assert glob.glob(f"{bronze_dir}/date=2025-01-02/*.parquet")


def test_stg_contract_types_and_trycast(spark, bronze_dir):
    stg = stg_arrivals(read_raw_arrivals(spark, bronze_dir))
    assert [f.name for f in stg.schema.fields] == [f.name for f in STG_ARRIVALS_SCHEMA.fields]
    rows = stg.filter(F.col("date") == "2025-01-01").collect() if "date" in stg.columns else stg.collect()
    malformed = [r for r in rows if r.event_ts is None]
    # the two malformed timestamps degrade to NULL, never raise
    assert len(malformed) >= 2
    ok = [r for r in rows if r.event_ts is not None]
    assert all(isinstance(r.event_ts, dt.datetime) for r in ok)


def test_empty_input_fallback_keeps_schema(spark, tmp_path):
    empty = read_raw_arrivals(spark, str(tmp_path / "nothing"))
    stg = stg_arrivals(empty)
    assert stg.count() == 0
    assert [f.name for f in stg.schema.fields] == [f.name for f in STG_ARRIVALS_SCHEMA.fields]
    # downstream mart also survives empty input
    assert fct_headways(stg).count() == 0


def test_fct_headways_end_to_end(spark, bronze_dir):
    stg = stg_arrivals(read_raw_arrivals(spark, bronze_dir)).dropDuplicates(
        ["line_id", "stop_id", "event_ts"]
    )
    out = fct_headways(stg).collect()
    by_key = {(r.line_id, r.stop_id, r.hour.isoformat()): r for r in out}
    # S1/central: arrivals 10:00, 10:04, 10:10 → gaps 240s, 360s
    r = by_key[("central", "S1", "2025-01-01T10:00:00")]
    assert r.avg_headway_s == pytest.approx(300.0)
    assert r.p50_headway_s == pytest.approx(240.0)  # discrete p50 = ceil(.5*2)=1st
    assert r.p90_headway_s == pytest.approx(360.0)
    # S2/central: gaps 1680s only
    r2 = by_key[("central", "S2", "2025-01-01T10:00:00")]
    assert r2.avg_headway_s == pytest.approx(1680.0)
    # victoria has a single arrival → no headway row
    assert not any(k[0] == "victoria" for k in by_key)


def test_partition_pruning_reaches_scan(spark, bronze_dir):
    df = read_raw_arrivals(spark, bronze_dir).filter(F.col("date") == "2025-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2025-01-02" in plan


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    df = read_table(spark, sf_smoke, "lineitem").filter(F.col("l_quantity") < 5).select("l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)]" in plan
    assert "ReadSchema" in plan and "l_extendedprice" not in plan.split("ReadSchema")[1]


def test_jsonl_corrupt_record_isolation(spark, tmp_path):
    """PERMISSIVE JSONL ingest: good lines parse, a malformed line lands
    whole in _corrupt_record with data columns null — never an
    exception, never silent loss."""
    from pyspark.sql import types as T

    from tfl_realtime_lakehouse_spark.sources.tables import read_jsonl

    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"event_id": 1, "kind": "click"}\n'
        'this is not json at all\n'
        '{"event_id": 2, "kind": "error"}\n'
        '{"event_id": "not-a-number", "kind": "weird"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
    rows = read_jsonl(spark, str(p), schema).collect()
    good = {(r["event_id"], r["kind"]) for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {(1, "click"), (2, "error")}
    assert len(bad) == 2  # the non-JSON line AND the type-mismatched one
    assert any("not json" in r["_corrupt_record"] for r in bad)
    assert all(r["event_id"] is None for r in bad)


def test_schema_evolution_merge_read(spark, tmp_path):
    """Files written at different schema versions read as one table:
    later columns are null for older files."""
    from tfl_realtime_lakehouse_spark.sources.tables import read_evolved_parquet

    d = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(d)
    got = {tuple(r) for r in read_evolved_parquet(spark, d).select("id", "v", "score").collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}
