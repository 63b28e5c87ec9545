"""Quantify the per-task CPU tax of spreading byte-light stages: run the
named queries once (noop sink) and report per-query wall, JVM cpu delta,
GC time, task count and task-time totals from the event log.

Usage: python tools/cpu_tax_probe.py <sf_dir> <query> [query ...]
Honors SPARK_GRAFT_AQE_MIN_PARTITION_SIZE so the same command can be run
with different floors to isolate the AQE-coalescing contribution.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfl_realtime_lakehouse_spark import hoststamp  # noqa: E402
from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    logdir = tempfile.mkdtemp(prefix="sparklog_")
    spark = get_spark(
        app_name="cpu-tax-probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    stats = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.time()
        c0 = hoststamp.jvm_cpu_sec(spark)
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        c1 = hoststamp.jvm_cpu_sec(spark)
        stats[name] = {"wall": time.time() - t0, "cpu": (c1 or 0) - (c0 or 0)}
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    time.sleep(1)

    # per-query task metrics from the event log
    per = {n: {"tasks": 0, "gc_ms": 0.0, "run_ms": 0.0, "cpu_ns": 0.0,
               "deser_ms": 0.0, "stages": 0} for n in names}
    cur = {}
    path = max(
        (os.path.join(logdir, f) for f in os.listdir(logdir)),
        key=os.path.getmtime,
    )
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
        if os.path.isdir(path)
        else [path]
    )
    stage_owner = {}
    for f in files:
        with open(f) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    d = props.get("spark.job.description", "")
                    if d.startswith("Q:"):
                        q = d[2:]
                        for s in ev.get("Stage Infos", []):
                            stage_owner[s["Stage ID"]] = q
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    q = stage_owner.get(si["Stage ID"])
                    if q not in per:
                        continue
                    acc = {
                        a.get("Name"): a.get("Value")
                        for a in si.get("Accumulables", [])
                    }

                    def num(k):
                        try:
                            return float(acc.get(k, 0))
                        except (TypeError, ValueError):
                            return 0.0

                    p = per[q]
                    p["stages"] += 1
                    p["tasks"] += si.get("Number of Tasks", 0)
                    p["gc_ms"] += num("internal.metrics.jvmGCTime")
                    p["run_ms"] += num("internal.metrics.executorRunTime")
                    p["cpu_ns"] += num("internal.metrics.executorCpuTime")
                    p["deser_ms"] += num(
                        "internal.metrics.executorDeserializeTime"
                    )
    floor = os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "16k")
    print(f"floor={floor}")
    print(
        f"{'query':38s} {'wall':>6s} {'jvmcpu':>7s} {'taskcpu':>8s} "
        f"{'gc_s':>6s} {'run_s':>7s} {'deser':>6s} {'tasks':>6s} {'stg':>4s}"
    )
    for n in names:
        s, p = stats[n], per[n]
        print(
            f"{n:38s} {s['wall']:6.2f} {s['cpu']:7.2f} "
            f"{p['cpu_ns'] / 1e9:8.2f} {p['gc_ms'] / 1e3:6.2f} "
            f"{p['run_ms'] / 1e3:7.2f} {p['deser_ms'] / 1e3:6.2f} "
            f"{p['tasks']:6d} {p['stages']:4d}"
        )


if __name__ == "__main__":
    main()
