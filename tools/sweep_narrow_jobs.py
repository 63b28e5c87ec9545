"""Suite-wide hunt for serialized hot jobs (guide §2.5 skew /
§1 measure-first): run every registered query once with event logging,
then list each job that ran ≥ ``min_wall`` seconds on ≤ ``max_tasks``
tasks — the signature of a compute-dense shuffle AQE coalesced down to
nothing (byte-light HOF folds, quadratic pair scans on few-key joins).

Usage: python tools/sweep_narrow_jobs.py <sf_dir> [min_wall] [max_tasks]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from tools.profile_jobs import parse_eventlog  # noqa: E402

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    max_tasks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    logdir = tempfile.mkdtemp(prefix="sweeplog_")
    spark = get_spark(
        app_name="sweep-narrow",
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

    walls = {}
    for name in sorted(REGISTRY):
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.time()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"# error in {name}: {exc}", file=sys.stderr)
        walls[name] = time.time() - t0
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    time.sleep(1)

    root = max(
        (os.path.join(logdir, f) for f in os.listdir(logdir)),
        key=os.path.getmtime,
    )
    jobs = parse_eventlog(root)
    per_q: dict[str, list[dict]] = {}
    for j in jobs:
        if j["desc"].startswith("Q:"):
            per_q.setdefault(j["desc"][2:], []).append(j)
    print(f"suite wall {sum(walls.values()):.1f}s over {len(walls)} queries\n")
    print("narrow hot jobs (wall >= %.1fs, tasks <= %d):" % (min_wall, max_tasks))
    rows = []
    for name, qjobs in per_q.items():
        for j in qjobs:
            if j["wall_ms"] / 1e3 >= min_wall and j["ntasks"] <= max_tasks:
                rows.append((j["wall_ms"] / 1e3, name, j))
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    print(f"TOTAL narrow-hot wall: {tot:.1f}s in {len(rows)} jobs\n")
    for wall, name, j in rows:
        print(
            f"{wall:7.2f}s {j['ntasks']:>3}t cpu={j['cpu_s']:>6.2f} "
            f"q={name} ({walls.get(name, -1):.1f}s) {j['top_stage'][:45]}"
        )
    # Also surface wait-heavy wide jobs (run >> cpu): Python import
    # waves / fetch waits.
    print("\nwait-heavy wide jobs (run_s > 4x cpu_s + 8, wall >= %.1fs):" % min_wall)
    rows2 = []
    for name, qjobs in per_q.items():
        for j in qjobs:
            if j["wall_ms"] / 1e3 >= min_wall and j["run_s"] > 4 * j["cpu_s"] + 8:
                rows2.append((j["wall_ms"] / 1e3, name, j))
    rows2.sort(reverse=True)
    for wall, name, j in rows2[:40]:
        print(
            f"{wall:7.2f}s {j['ntasks']:>3}t cpu={j['cpu_s']:>6.2f} "
            f"run={j['run_s']:>7.1f} q={name} ({walls.get(name, -1):.1f}s)"
        )


if __name__ == "__main__":
    main()
