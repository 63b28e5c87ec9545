"""MERGE adapter tests (parquet backend; the Delta branch is gated on
delta-spark which this environment doesn't ship)."""

from __future__ import annotations

from tfl_realtime_lakehouse_spark.sources.lakehouse import merge_delete, merge_upsert

SCHEMA = "k long, g string, v double"


def _rows(spark, path):
    return {r.k: (r.g, r.v) for r in spark.read.parquet(path).collect()}


def test_merge_upsert_create_replace_append(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_upsert(
        spark, path, spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA), ["k"]
    )
    assert _rows(spark, path) == {1: ("a", 1.0), 2: ("b", 2.0)}
    merge_upsert(
        spark, path, spark.createDataFrame([(2, "b", 20.0), (3, "c", 3.0)], SCHEMA), ["k"]
    )
    assert _rows(spark, path) == {1: ("a", 1.0), 2: ("b", 20.0), 3: ("c", 3.0)}


def test_merge_upsert_delete_keys_clears_stale_rows(spark, tmp_path):
    """A touched key whose recomputation yields zero rows must still lose
    its stale rows — the delete_keys contract the incremental-gold
    stream depends on."""
    path = str(tmp_path / "tbl")
    merge_upsert(
        spark, path, spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA), ["k"]
    )
    empty = spark.createDataFrame([], SCHEMA)
    touched = spark.createDataFrame([(1,)], "k long")
    merge_upsert(spark, path, empty, ["k"], delete_keys=touched)
    assert _rows(spark, path) == {2: ("b", 2.0)}


def test_merge_delete_predicate_null_semantics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_upsert(
        spark,
        path,
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 20.0), (3, "c", None)], SCHEMA),
        ["k"],
    )
    merge_delete(spark, path, "v > 10")  # NULL predicate rows are KEPT
    assert _rows(spark, path) == {1: ("a", 1.0), 3: ("c", None)}
