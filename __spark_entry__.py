"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``tfl_realtime_lakehouse_spark.queries.REGISTRY``: every
implemented operator from SURVEY.md §2 is one registered query with
(where SQL-expressible) a DuckDB oracle; see the registry modules for
the per-query scale/determinism notes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tfl_realtime_lakehouse_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: fct_headways — the
    reference's entire analytical content (lag → epoch gap → hourly
    avg/p50/p90) on the events stream proxy."""
    return REGISTRY["fct_headways"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: rq.fn for name, rq in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query. Queries
    omitted here (LSH candidates, IVF ANN) are approximate-by-design and
    get the driver's rows-only check; their semantics are asserted by
    property tests in tests/."""
    return {name: rq.oracle for name, rq in REGISTRY.items() if rq.oracle is not None}
