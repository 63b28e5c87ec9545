"""Registry plumbing for the driver-facing query suite.

Determinism contract (the driver hash-compares Spark vs DuckDB results
order-insensitively, so every query here must be value-deterministic):

- Money/quantity sums aggregate in DECIMAL (exact in both engines) and
  are emitted as ``decimal(18,2)`` — no float reassociation error, no
  rounding-boundary risk.
- Reordered float aggregates (avg, percentile, cosine scores) are
  emitted as ``round(x, N)`` with N chosen so the inter-engine error
  (≤ a few ulps) is many orders of magnitude below the rounding step.
- Window queries order by a key suffix that makes the frame total
  (e.g. ``(o_orderdate, o_orderkey)``), or emit only tie-invariant
  values (rank of the row's own sort key).
- Counts/keys/strings/timestamps are exact — emitted raw.

Dtype rules (pandas-level identity, verified by the vanilla-ANSI
str-identical sweep in the verify skill):
- DuckDB ``SUM`` over integers returns HUGEINT → pandas float64; wrap
  such oracle sums in ``CAST(... AS BIGINT)``.
- No DATE, DECIMAL, float32, or nested-array OUTPUT columns — each
  converts to a different pandas dtype/repr per engine. Use timestamps,
  doubles, and flattened/folded scalars instead.
- Pin ambiguous function result types on both sides (``sign`` → INT,
  ``length``/``extract``/list indexes → INT/BIGINT explicitly).
- NEVER alias a rounded/derived column to the SAME NAME as a raw input
  column in a select whose HIGHER-ORDER-FUNCTION lambdas reference that
  name: inside an ``aggregate``/``transform`` lambda, an outer
  ``F.col("mu")`` binds to a sibling ``round(mu, 6) AS mu`` in the same
  projection (lateral alias wins over the input column there — plain
  non-lambda expressions resolve to the input, which is why the same
  surface pattern elsewhere is safe), silently feeding the fold the
  rounded value. Found via events_online_cusum: bisected to exactly
  mu-rounded-only (sigma's alias didn't collide), a 1-ulp-amplified
  hash mismatch. Round in a LATER select, after every lambda consumer
  of the raw value.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from tfl_realtime_lakehouse_spark.schemas import CORPUS_TABLES
from tfl_realtime_lakehouse_spark.sources.tables import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the suite."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries.

    Idempotent; re-registering repoints the views when sf_dir changes.
    """
    for name in CORPUS_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)
