"""Host-noise stamps for the measurement harnesses (r10 verdict ask #2).

Two counters turn "is this delta a regression or host noise?" from a
bespoke A/B experiment into data carried by every bench artifact:

- ``steal_jiffies()`` — the host's accumulated CPU-steal counter
  (/proc/stat, field 8 of the aggregate ``cpu`` line). A non-trivial
  per-run DELTA means the hypervisor descheduled this VM during the
  window and wall-clock numbers are inflated; r10 measured ±50 %
  same-code swings under 1.89 M accumulated steal jiffies.
- ``jvm_cpu_sec(spark)`` — utime+stime of the local-mode JVM process
  (/proc/<pid>/stat), i.e. CPU actually burned by scan/shuffle/agg/GC.
  Steal time is NOT charged to a process's utime/stime, so per-query
  CPU deltas are the noise-immune comparison metric: when steal is
  non-trivial, quote cpu_sec, not wall.

Both are Linux-proc reads (this engine's measurement boxes are Linux);
callers degrade gracefully to None/-1 elsewhere.
"""

from __future__ import annotations

import os


def steal_jiffies() -> int | None:
    """Accumulated steal jiffies from the aggregate cpu line, or None
    when /proc/stat is unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        return int(parts[8])
    except Exception:
        return None


def _proc_cpu_sec(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/stat") as f:
            # comm can contain spaces/parens; split after the last ')'
            tail = f.read().rsplit(")", 1)[1].split()
        clk = os.sysconf("SC_CLK_TCK")
        return (int(tail[11]) + int(tail[12])) / clk  # utime + stime
    except Exception:
        return None


def jvm_cpu_sec(spark) -> float | None:
    """CPU seconds consumed so far by the session's JVM (all threads —
    in local mode that is driver + every executor thread + GC). None
    when the gateway wasn't launched by this process (e.g. an attached
    external JVM) or /proc is unavailable."""
    try:
        proc = getattr(spark.sparkContext._gateway, "proc", None)
        if proc is None:
            return None
        return _proc_cpu_sec(proc.pid)
    except Exception:
        return None


def self_cpu_sec() -> float:
    """CPU seconds of the Python driver process itself (collect/Arrow
    decode overhead lives here, not in the JVM counter)."""
    t = os.times()
    return t.user + t.system
