"""Strongest correctness gate: vanilla-ANSI driver simulation with
``astype(str)`` equality over EVERY oracle-backed query.

Stricter than tools/parity.py (which coerces dtypes before comparing):
string-rendering both engines' results catches dtype drift the lenient
compare hides — DuckDB SUM(int)→HUGEINT→float64, float32 array reprs,
sign()/extract() result types. Run before every round end; single-query
mode for iteration:

    python tools/str_identity.py [SF_DIR] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tfl_realtime_lakehouse_spark.queries import REGISTRY
from tfl_realtime_lakehouse_spark.schemas import CORPUS_TABLES


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Vanilla session, exactly like the round driver: no engine confs,
    # ANSI defaults (Spark 4 has ANSI on).
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("str-identity-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, rq in REGISTRY.items():
        if only and name not in only:
            continue
        if rq.oracle is None:
            continue
        t0 = time.time()
        try:
            sdf = rq.fn(spark, sf_dir).toPandas()
            odf = con.execute(rq.oracle).df()
            cols = sorted(sdf.columns)
            if cols != sorted(odf.columns):
                raise AssertionError(
                    f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
                )
            a = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
            b = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                raise AssertionError(
                    f"{int(diff.sum())}/{len(a)} rows differ; first:\n"
                    f"spark:  {a[diff].head(2).to_dict('records')}\n"
                    f"oracle: {b[diff].head(2).to_dict('records')}"
                )
            print(f"IDENTICAL {name} ({len(a)} rows, {time.time() - t0:.1f}s)")
        except Exception as exc:
            failures.append(name)
            print(f"FAIL      {name}: {exc}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("ALL STR-IDENTICAL")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
