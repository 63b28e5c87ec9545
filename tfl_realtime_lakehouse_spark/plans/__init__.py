"""Named transforms (the medallion model DAG): bronze → staging → marts."""

from tfl_realtime_lakehouse_spark.plans.staging import stg_arrivals
from tfl_realtime_lakehouse_spark.plans.marts import fct_headways

__all__ = ["stg_arrivals", "fct_headways"]
