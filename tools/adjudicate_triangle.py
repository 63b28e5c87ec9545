"""Adjudicate graph_triangle_count's warm-trial escalation (r10 verdict
ask #1): probe_sf5_warm_r10.json showed four SAME-session warm trials
climbing 46.8 -> 85.5 -> 128.7 -> 183.4 s, which host steal alone does
not explain (the climb was monotone WITHIN one process). Two live
hypotheses:

  H-host:    the box got slower over the probe's wall-clock span
             (steal, page-cache eviction by a neighbor). Prediction:
             FRESH-session probes taken before/between/after the
             same-session runs climb the same way, and per-trial JVM
             cpu_sec climbs in lockstep with wall only if the work is
             real, while steal_trials is non-trivial.
  H-process: the session accumulates state (localCheckpoint blocks,
             shuffle files, heap/GC pressure). Prediction: fresh
             probes stay flat; same-session trials climb; per-trial
             cpu_sec climbs with wall while steal_trials stays ~0.

Protocol (runs each leg as a SEPARATE subprocess so a fresh session is
actually fresh): F1 -> S1(6 warm trials, one session) -> F2 ->
S2(6 warm trials, one session) -> F3, each leg the existing
tools/probe_sf5_warm.py with its per-trial wall/cpu/steal stamps
(landed this round for exactly this adjudication). Legs run strictly
sequentially -- never two JVMs at once.

    python tools/adjudicate_triangle.py .scaledata/sf5 \
        > probe_triangle_adjudication_r11.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _leg(sf_dir: str, trials: int, tag: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="64g")
    t0, s0 = time.monotonic(), _steal()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "probe_sf5_warm.py"),
            sf_dir,
            str(trials),
            "graph_triangle_count",
        ],
        capture_output=True,
        text=True,
        env=env,
    )
    wall = round(time.monotonic() - t0, 1)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        payload = json.loads(line)
    except json.JSONDecodeError:
        payload = {"unparsed_tail": line[-500:]}
    return {
        "tag": tag,
        "rc": proc.returncode,
        "leg_wall": wall,
        "leg_steal_delta": _steal() - s0,
        "probe": payload,
        "stderr_tail": proc.stderr[-300:] if proc.returncode else "",
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/sf5"
    out = {
        "protocol": "F1 -> S1(x6) -> F2 -> S2(x6) -> F3, sequential JVMs",
        "load_start": [round(v, 2) for v in os.getloadavg()],
        "legs": [],
    }
    # fresh legs use trials=1 (cold + one warm) so each contributes a
    # cold AND a first-warm point; same-session legs use trials=6
    for tag, trials in (
        ("fresh-1", 1),
        ("same-session-1", 6),
        ("fresh-2", 1),
        ("same-session-2", 6),
        ("fresh-3", 1),
    ):
        out["legs"].append(_leg(sf_dir, trials, tag))
        print(f"# leg {tag} done", file=sys.stderr, flush=True)
    out["load_end"] = [round(v, 2) for v in os.getloadavg()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
