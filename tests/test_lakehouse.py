"""MERGE adapter tests (parquet backend; the Delta branch is gated on
delta-spark which this environment doesn't ship)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_compact_files_packs_small_files_and_preserves_rows(spark, tmp_path):
    """40 tiny files must compact to the bin-packed count with identical
    content; a second invocation is a no-op (already compact)."""
    from tfl_realtime_lakehouse_spark.sources.lakehouse import compact_files

    path = str(tmp_path / "snap")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.mode("overwrite").parquet(path)

    import glob
    assert len(glob.glob(path + "/*.parquet")) == 40
    stats = compact_files(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == 40 and stats["files_after"] == 1
    assert len(glob.glob(path + "/*.parquet")) == 1
    got = spark.read.parquet(path)
    assert got.count() == 10000
    assert got.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10000))

    again = compact_files(spark, path, target_file_bytes=1 << 30)
    assert again["files_before"] == 1 and again["files_after"] == 1


def test_snapshot_diff_classifies_all_change_kinds(spark, tmp_path):
    """added/removed/changed/unchanged must each be detected, including
    a null→value transition (the null-safe digest must not equate NULL
    with any real value or with the empty string)."""
    from tfl_realtime_lakehouse_spark.sources.lakehouse import snapshot_diff

    old_p = str(tmp_path / "old")
    new_p = str(tmp_path / "new")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "", 4.0)],
        "k long, g string, v double",
    ).write.parquet(old_p)
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (4, "", 4.0), (5, "e", 5.0)],
        "k long, g string, v double",
    ).write.parquet(new_p)

    got = {r.k: r.change for r in snapshot_diff(spark, old_p, new_p, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",   # NULL -> 2.0
        3: "removed",
        4: "unchanged",  # empty string is not NULL
        5: "added",
    }
