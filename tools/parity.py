"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle on DuckDB, compare row count + schema-ish
dtypes + order-insensitive values.

Usage:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.schemas import CORPUS_TABLES  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    a, b = normalize(spark_df.copy()), normalize(duck_df.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        # dtype-KIND strictness: an int column on one side and a float on
        # the other stringifies differently ('1000' vs '1000.0') and can
        # fail the driver's schema/value hash even when numerically equal
        # (classic cause: DuckDB SUM(int) → HUGEINT → pandas float64).
        ka, kb = av.dtype.kind, bv.dtype.kind
        if {ka, kb} == {"i", "f"}:
            problems.append(f"col {c}: dtype kind mismatch spark={av.dtype} duck={bv.dtype}")
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
        if neq.any():
            i = neq.idxmax()
            problems.append(
                f"col {c}: {int(neq.sum())}/{len(a)} mismatches, first at row {i}: "
                f"spark={a[c][i]!r} duck={b[c][i]!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    failures = 0
    for name, rq in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = rq.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            failures += 1
            continue
        if rq.oracle is None:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(rq.oracle).df()
        except Exception:
            print(f"FAIL  {name}: duckdb oracle raised\n{traceback.format_exc()}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
