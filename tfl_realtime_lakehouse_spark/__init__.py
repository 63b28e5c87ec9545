"""tfl_realtime_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse pipeline (medallion layout over
realtime arrival-prediction events): bronze parquet ingest, a typed
staging contract, windowed headway facts, data-quality checks, and a
library of relational + large-scale-training-data operators (dedup,
similarity search, text analysis) — all declared through the DataFrame /
Spark SQL API so Catalyst/Tungsten pick the physical strategy.

Design notes (scale-first):
- Everything is a pure ``DataFrame -> DataFrame`` transform so the same
  code runs under ``spark.read`` (batch replay) and ``spark.readStream``.
- No driver-side row loops; Python UDFs only where built-ins genuinely
  cannot express the semantics (Arrow-batched pandas UDFs when so).
- Joins declare broadcast hints for dimension tables; aggregations rely
  on partial (map-side) aggregation; AQE is enabled in the session
  factory for runtime re-planning and skew handling.
"""

from tfl_realtime_lakehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
