"""Scale-up corpus generator: replicate an sf directory K× with shifted ids.

Usage: python tools/make_scale_corpus.py [SRC] [DST] [COPIES]
       (defaults: /root/testdata/sf0.1 → .scaledata/sf1, 10 copies)

Every id column is shifted by ``copy_index * OFFSET`` with one common
OFFSET, so all intra-copy foreign-key relationships (lineitem→orders→
customer, events.user_id, …) are preserved exactly; cross-copy rows
never join. Text/embedding payloads are NOT perturbed — cross-copy
exact duplicates are a realistic (and stressful) dedup workload.

``events.ts`` is kept as parquet TIMESTAMP(NANOS) (explicit
TIMESTAMP_NS cast) because the engine's read path expects the physical
nanos type (sources/tables.py:read_table).
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 10_000_000  # far above any sf0.1 key

SHIFT_KEYS = {
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}
DIMS = ["region", "nation"]  # fixed-size dims: single copy


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".scaledata/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in SHIFT_KEYS.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()
        cols = []
        for name, typ, *_ in desc:
            if name in keys:
                cols.append(f'"{name}" + i.range * {OFFSET} AS "{name}"')
            elif t == "events" and name == "ts":
                cols.append('CAST("ts" AS TIMESTAMP_NS) AS "ts"')
            else:
                cols.append(f'"{name}"')
        sql = (
            f"COPY (SELECT {', '.join(cols)} "
            f"FROM read_parquet('{src}/{t}.parquet') CROSS JOIN range({copies}) i) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(sql)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
