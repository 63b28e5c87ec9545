"""Data-quality checks (SURVEY §2.11 Q1-Q7): the reference's dbt
not_null tests + Great Expectations checks re-expressed as single-pass
Spark aggregations with severity semantics."""

from tfl_realtime_lakehouse_spark.dq.checks import (
    Check,
    CheckResult,
    not_null,
    run_checks,
    value_between,
)

__all__ = ["Check", "CheckResult", "not_null", "value_between", "run_checks"]
