"""Warm A/B probe: run the named queries N times each in one session
(noop sink, q1 warmup) and print per-query MEDIAN wall + JVM cpu.
Pair two invocations under different env (e.g. AQE floor values) for a
like-for-like warm comparison — single-pass suite runs are cold-biased.

Usage: python tools/ab_warm_probe.py <sf_dir> <repeats> <query> [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfl_realtime_lakehouse_spark import hoststamp  # noqa: E402
from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    repeats = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark(app_name="ab-warm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    floor = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    )
    walls: dict[str, list[float]] = {n: [] for n in names}
    cpus: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            t0 = time.time()
            c0 = hoststamp.jvm_cpu_sec(spark)
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            c1 = hoststamp.jvm_cpu_sec(spark)
            walls[name].append(time.time() - t0)
            cpus[name].append((c1 or 0) - (c0 or 0))
    print(f"floor={floor} repeats={repeats} load={os.getloadavg()}")
    for n in names:
        w, c = sorted(walls[n]), sorted(cpus[n])
        print(
            f"{n:42s} med={w[len(w) // 2]:6.2f} min={w[0]:6.2f} "
            f"max={w[-1]:6.2f} cpu_med={c[len(c) // 2]:7.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
