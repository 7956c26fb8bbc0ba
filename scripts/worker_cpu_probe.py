#!/usr/bin/env python3
"""Run one crawl-bench sample and attribute CPU (user vs sys) to process
groups: JVM, pyspark.daemon python workers, everything else of ours.

Robust to host interference in a way throughput is not: worker stime is a
direct read of the pathology (mm churn -> kernel time in workers), so an
allocator A/B can be judged on stime/page even when wall-clock numbers are
noisy.

Usage: python scripts/worker_cpu_probe.py CPUS [env KEY=VAL ...]
"""
import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
HZ = os.sysconf("SC_CLK_TCK")


def classify(pid):
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as fh:
            cmd = fh.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return None
    if "pyspark.daemon" in cmd:
        return "pyworker"
    if "java" in cmd.split(" ")[0]:
        return "jvm"
    if "bench.py" in cmd:
        return "driver"
    return None


class Tracker(threading.Thread):
    """Poll /proc; keep the max cumulative (utime, stime) seen per pid so
    totals survive process exit."""

    def __init__(self):
        super().__init__(daemon=True)
        self.stop = threading.Event()
        self.seen = {}  # pid -> (group, ut, st)

    def run(self):
        t0 = time.time()
        while not self.stop.wait(1.0):
            now = round(time.time() - t0, 1)
            for pid in os.listdir("/proc"):
                if not pid.isdigit():
                    continue
                grp = self.seen.get(pid, (None,))[0] or classify(pid)
                if not grp:
                    continue
                try:
                    with open(f"/proc/{pid}/stat") as fh:
                        parts = fh.read().rsplit(")", 1)[1].split()
                except OSError:
                    continue
                ut, st = int(parts[11]) / HZ, int(parts[12]) / HZ
                old = self.seen.get(pid)
                born = old[3] if old else now
                if old is None or ut + st >= old[1] + old[2]:
                    self.seen[pid] = (grp, ut, st, born)

    def totals(self):
        agg = {}
        for grp, ut, st, _born in self.seen.values():
            a = agg.setdefault(grp, [0.0, 0.0, 0])
            a[0] += ut
            a[1] += st
            a[2] += 1
    # totals include pre-existing cpu of long-lived pids; bench pids are
    # fresh per run so this is per-run attribution in practice
        return agg

    def worker_births(self, bucket=10):
        """Histogram of pyworker first-seen times (run-relative seconds) —
        a fork burst mid-run means workers are NOT being reused."""
        hist = {}
        for grp, _ut, _st, born in self.seen.values():
            if grp == "pyworker":
                b = int(born // bucket) * bucket
                hist[b] = hist.get(b, 0) + 1
        return dict(sorted(hist.items()))


def main():
    cpus = int(sys.argv[1])
    extra = dict(a.split("=", 1) for a in sys.argv[2:])
    tr = Tracker()
    tr.start()
    t0 = time.time()
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus), **extra}
    proc = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, str(REPO / "bench.py"),
         "--crawl-only", "--cpus", str(cpus)],
        capture_output=True, text=True, cwd=str(REPO), env=env)
    wall = time.time() - t0
    tr.stop.set()
    tr.join(3)
    try:
        r = json.loads(proc.stdout.strip().splitlines()[-1])
    except (json.JSONDecodeError, IndexError):
        r = {"error": proc.stderr[-400:]}
    out = {"cond": extra or "baseline", "wall_s": round(wall, 1),
           "urls_per_sec": r.get("urls_per_sec"),
           "steal_pct_during": r.get("steal_pct_during"),
           "phase_seconds": r.get("phase_seconds")}
    for grp, (ut, st, n) in sorted(tr.totals().items()):
        out[grp] = {"user_s": round(ut, 1), "sys_s": round(st, 1), "procs": n}
    out["worker_births"] = tr.worker_births()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
