"""ORC source/sink: value-identical roundtrip against the parquet read
path, partitioned layout discovery, and pushdown reaching the ORC scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.sources.tables import (
    read_orc,
    read_table,
    write_orc,
)


def test_orc_roundtrip_matches_parquet(spark, tmp_path, sf_smoke):
    orders = read_table(spark, sf_smoke, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.schema == orders.schema
    a = {tuple(r) for r in orders.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orc_partitioned_write_prunes_and_pushes_down(spark, tmp_path, sf_smoke):
    orders = read_table(spark, sf_smoke, "orders")
    path = str(tmp_path / "orders_orc_part")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    back = read_orc(spark, path)
    filt = back.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)
    )
    plan = filt._jdf.queryExecution().executedPlan().toString()
    # partition pruning on the directory column, pushdown on the data column
    assert "PartitionFilters" in plan
    assert "PushedFilters" in plan and "o_totalprice" in plan
    want = orders.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)
    ).count()
    assert filt.count() == want
