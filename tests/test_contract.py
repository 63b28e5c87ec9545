"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as contract
from tfl_realtime_lakehouse_spark.schemas import CORPUS_TABLES


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    assert df.columns == [
        "line_id",
        "stop_id",
        "hour",
        "avg_headway_s",
        "p50_headway_s",
        "p90_headway_s",
    ]
    assert df.count() > 0


def test_every_query_has_callable_and_oracle_keys_subset(spark):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every oracle is syntactically valid DuckDB against the corpus
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, sql in oracles.items():
        con.sql(f"SELECT * FROM ({sql}) LIMIT 0")


@pytest.mark.parametrize("name", ["fct_headways", "q1_pricing_summary", "topk_orders"])
def test_representative_queries_run_on_smoke_sf(spark, sf_smoke, name):
    df = contract.queries()[name](spark, sf_smoke)
    assert df.count() >= 0
