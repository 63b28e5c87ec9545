"""Standalone warm-state probe for individual registered queries —
the artifact the r6 verdict asked for (ask #2): suite medians for
`graph_triangle_count` / `embedding_ann_lsh_verified` at sf5 carried
cold-page-cache/GC state (spread > value); this records N back-to-back
warm trials per query in ONE session, load-stamped, so SCALE.md can
point at a committed JSON instead of a prose footnote.

    SPARK_GRAFT_DRIVER_MEM=64g python tools/probe_sf5_warm.py \
        .scaledata/sf5 3 graph_triangle_count embedding_ann_lsh_verified
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def _release_blocks(spark) -> None:
    """bench.py's discipline: drop retained localCheckpoint blocks
    between trials — accumulated blocks GC-thrash the heap and poison
    later timings (r7 measured a 280 s outlier on a 40 s query)."""
    import gc

    gc.collect()
    try:
        jsc = spark.sparkContext._jsc.sc()
        retained = jsc.getPersistentRDDs().values().toList()
        for i in range(retained.size()):
            retained.apply(i).unpersist(False)
    except Exception:
        pass


def main():
    sf_dir = sys.argv[1]
    trials = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark(app_name="sf5-warm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "sf": sf_dir,
        "trials": trials,
        "load_before": [round(v, 2) for v in os.getloadavg()],
        "queries": {},
    }
    for name in names:
        times = []
        for i in range(trials + 1):  # +1: first run is the cold warm-up
            t0 = time.monotonic()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.monotonic() - t0, 2))
            _release_blocks(spark)
        warm = sorted(times[1:])
        out["queries"][name] = {
            "cold_first_touch": times[0],
            "warm_trials": times[1:],
            "warm_median": round(statistics.median(warm), 2),
            "warm_spread": round(warm[-1] - warm[0], 2),
        }
    out["load_after"] = [round(v, 2) for v in os.getloadavg()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
