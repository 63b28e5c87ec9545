"""Benchmark harness: run the registered query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": "..."}

Execution is measured end-to-end per query against the `noop` sink so
the full physical plan runs (scan → shuffle → agg) without collect
overhead; tiny results (<10k rows est.) still reflect real work because
noop consumes every output row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tfl-lakehouse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # engine, not first-call JIT.
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    t_suite = time.time()
    for name, rq in sorted(REGISTRY.items()):
        t0 = time.time()
        try:
            rq.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # keep the suite running; surface the error
            timings[name] = -1.0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)
        # Drop the query's DataFrame graph promptly: localCheckpoint
        # blocks (used by the contraction/self-join operators) are only
        # released by the ContextCleaner once the Python references die,
        # and 100+ queries of retained blocks skew later measurements.
        import gc

        gc.collect()
        # ...and release them NOW rather than whenever the async cleaner
        # runs: accumulated checkpoint/persist blocks were measured to
        # add multi-second noise spikes to later queries in the suite.
        try:
            jsc = spark.sparkContext._jsc.sc()
            retained = jsc.getPersistentRDDs().values().toList()
            for i in range(retained.size()):
                retained.apply(i).unpersist(False)
        except Exception:
            pass
    total = round(time.time() - t_suite, 3)

    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
