"""Per-job drill-down for one or more registered queries (guide §1:
measure FIRST — the UI is disabled in this sandbox, so we use the event
log, which carries the same job/stage/task metrics the UI renders).

For each named query: run it once against the noop sink with event
logging on, then parse the event log and print every job (description,
wall, task count, executor CPU, shuffle read/write bytes, peak stage)
sorted by submission. This answers "where do this query's N seconds
go?" at job granularity — the level where checkpoint rounds, Lloyd
iterations and probe passes are visible.

Usage: python tools/profile_jobs.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def _event_lines(path: str):
    # Spark 4 rolling event logs are a directory of events_* files.
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_") or f.startswith("eventLog")
        )
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        if f.endswith(".zstd"):
            import io

            import zstandard

            with open(f, "rb") as raw:
                reader = zstandard.ZstdDecompressor().stream_reader(raw)
                yield from io.TextIOWrapper(reader, encoding="utf-8")
        else:
            with open(f) as fh:
                yield from fh


def parse_eventlog(path: str) -> list[dict]:
    jobs: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = {}
    if True:
        for line in _event_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "job": jid,
                    "desc": props.get("spark.job.description", "")[:90],
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(
                        s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                    ),
                }
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}

                def num(name: str) -> float:
                    v = acc.get(name, 0)
                    try:
                        return float(v)
                    except (TypeError, ValueError):
                        return 0.0

                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except Exception:
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stage_metrics[sid] = {
                    "scopes": ",".join(scopes[:12]),
                    "cpu_ns": num("internal.metrics.executorCpuTime"),
                    "run_ms": num("internal.metrics.executorRunTime"),
                    "sh_read": num("internal.metrics.shuffle.read.remoteBytesRead")
                    + num("internal.metrics.shuffle.read.localBytesRead"),
                    "sh_write": num("internal.metrics.shuffle.write.bytesWritten"),
                    "py_ms": num("internal.metrics.pythonTotalTime") / 1e6,
                    "name": si.get("Stage Name", "")[:60],
                    "wall_ms": (si.get("Completion Time") or 0)
                    - (si.get("Submission Time") or 0),
                }
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        sm = [stage_metrics[s] for s in j["stages"] if s in stage_metrics]
        out.append(
            {
                "job": jid,
                "desc": j["desc"],
                "wall_ms": j["t1"] - j["t0"],
                "ntasks": j["ntasks"],
                "cpu_s": round(sum(s["cpu_ns"] for s in sm) / 1e9, 2),
                "run_s": round(sum(s["run_ms"] for s in sm) / 1e3, 2),
                "sh_rd_mb": round(sum(s["sh_read"] for s in sm) / 1e6, 1),
                "sh_wr_mb": round(sum(s["sh_write"] for s in sm) / 1e6, 1),
                "nstages": len(sm),
                "top_stage": (
                    max(sm, key=lambda s: s["wall_ms"])["scopes"]
                    or max(sm, key=lambda s: s["wall_ms"])["name"]
                )
                if sm
                else "",
            }
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    logdir = tempfile.mkdtemp(prefix="sparklog_")
    spark = get_spark(
        app_name="profile-jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            # No zstandard module in this env: keep the log plain text.
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm codegen/JIT the same way bench.py does.
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    marks = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        marks[name] = (t0, time.time())
        spark.sparkContext.setJobDescription(None)
    spark.stop()  # flush the event log
    time.sleep(1)

    logs = [os.path.join(logdir, f) for f in os.listdir(logdir)]
    jobs = parse_eventlog(max(logs, key=os.path.getmtime))
    for name in names:
        t0, t1 = marks[name]
        print(f"\n=== {name}  wall={t1 - t0:.2f}s ===")
        t0ms, t1ms = t0 * 1000, t1 * 1000
        sel = [j for j in jobs if j["desc"] == f"Q:{name}"]
        if not sel:  # fall back to the wall-clock window
            sel = [j for j in jobs if t0ms - 500 <= j["wall_ms"] and False]
        gap = (t1 - t0) - sum(j["wall_ms"] for j in sel) / 1e3
        print(
            f"{len(sel)} jobs, job-wall {sum(j['wall_ms'] for j in sel) / 1e3:.2f}s, "
            f"driver/planning gap {gap:.2f}s"
        )
        print(
            f"{'job':>5} {'wall_s':>7} {'tasks':>5} {'stg':>3} {'cpu_s':>7} "
            f"{'run_s':>7} {'shrd_MB':>8} {'shwr_MB':>8}  top_stage"
        )
        for j in sel:
            print(
                f"{j['job']:>5} {j['wall_ms'] / 1e3:>7.2f} {j['ntasks']:>5} "
                f"{j['nstages']:>3} {j['cpu_s']:>7.2f} {j['run_s']:>7.2f} "
                f"{j['sh_rd_mb']:>8.1f} {j['sh_wr_mb']:>8.1f}  {j['top_stage']}"
            )


if __name__ == "__main__":
    main()
