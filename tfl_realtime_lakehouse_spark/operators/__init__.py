"""Custom operators Spark lacks natively, built as compositions of
DataFrame ops (preferred) or Arrow-batched pandas UDFs (when built-ins
can't express the semantics): as-of joins, dedup family (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity search,
text analysis, multimodal plumbing.
"""

from tfl_realtime_lakehouse_spark.operators.asof import asof_join

__all__ = ["asof_join"]
