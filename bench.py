"""Benchmark harness: run the registered query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": "..."}

Execution is measured end-to-end per query against the `noop` sink so
the full physical plan runs (scan → shuffle → agg) without collect
overhead; tiny results (<10k rows est.) still reflect real work because
noop consumes every output row.

``--repeat N`` runs the whole suite N times and reports the per-query
MEDIAN (plus min/max spread in "spread"): single in-suite timings at
sf0.1 carry ±0.5 s of scheduler/GC noise (measured round 2: simhash
drifted 2.98→3.67 s between identical runs), so deltas between rounds
are only interpretable from medians. The suite wall value stays the
FIRST run's wall clock (what a cold suite costs); per-query medians are
for regression comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def _release_blocks(spark) -> None:
    """Drop each query's DataFrame graph promptly: localCheckpoint
    blocks (used by the contraction/self-join operators) are only
    released by the ContextCleaner once the Python references die, and
    100+ queries of retained blocks were measured to add multi-second
    noise spikes to later suite measurements."""
    import gc

    gc.collect()
    try:
        jsc = spark.sparkContext._jsc.sc()
        retained = jsc.getPersistentRDDs().values().toList()
        for i in range(retained.size()):
            retained.apply(i).unpersist(False)
    except Exception:
        pass


def _session_alive(spark) -> bool:
    try:
        return not spark.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


def _run_suite(spark, sf_dir: str) -> tuple[dict[str, float], float, object]:
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
            if not _session_alive(spark):
                # A fatal executor error (e.g. heap OOM at a large SF)
                # kills the local JVM; without recovery every later
                # query in every later run reports -1 (cost one whole
                # sf5 sweep to learn). Rebuild the session and move on.
                print(f"# session died in {name}; rebuilding", file=sys.stderr)
                try:
                    spark.stop()
                except Exception:
                    pass
                spark = get_spark(app_name="tfl-lakehouse-bench")
                spark.sparkContext.setLogLevel("ERROR")
        _release_blocks(spark)
    return timings, round(time.time() - t_suite, 3), spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    spark = get_spark(app_name="tfl-lakehouse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # engine, not first-call JIT.
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    load_before = os.getloadavg()
    runs = []
    for _ in range(max(1, repeat)):
        timings_i, total_i, spark = _run_suite(spark, sf_dir)
        runs.append((timings_i, total_i))
    timings, total = runs[0]
    out = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        # Contended runs self-identify: a 1-min load far above this
        # process's own 32 threads means concurrent sessions inflated
        # the timings (the r4 driver-tail vs --repeat-median divergence
        # cost a diagnosis cycle). load_before is sampled at suite
        # start, load_after at print time.
        "load_before": [round(v, 2) for v in load_before],
        "load_after": [round(v, 2) for v in os.getloadavg()],
    }
    if len(runs) > 1:
        names = sorted(REGISTRY)
        medians, spread = {}, {}
        for n in names:
            vals = sorted(r[0].get(n, -1.0) for r in runs)
            medians[n] = vals[len(vals) // 2]
            spread[n] = round(vals[-1] - vals[0], 3)
        out["queries"] = medians
        out["spread"] = spread
        out["repeat"] = len(runs)
        out["walls"] = [r[1] for r in runs]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
