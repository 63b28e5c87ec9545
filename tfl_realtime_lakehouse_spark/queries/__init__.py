"""Query registry: every operator from SURVEY.md §2 as a named query.

Importing this package registers all query modules. ``REGISTRY`` maps
name → RegisteredQuery(fn, oracle, doc); the driver contract
(`__spark_entry__.py`) is a thin view over it.
"""

from tfl_realtime_lakehouse_spark.queries.registry import (
    REGISTRY,
    RegisteredQuery,
    load_views,
    register,
)

# Side-effect imports: each module registers its queries.
from tfl_realtime_lakehouse_spark.queries import (  # noqa: E402,F401
    relational,
    pipeline_queries,
    advanced,
    tpch_extra,
    text_queries,
    vector_queries,
)

__all__ = ["REGISTRY", "RegisteredQuery", "register", "load_views"]
