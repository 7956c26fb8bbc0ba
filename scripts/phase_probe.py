#!/usr/bin/env python3
"""One instrumented crawl-bench sample: taskset-pinned, event-logged, with
a /proc/stat per-core utilization sampler running alongside. Prints the
bench JSON line plus a stage-level breakdown (duration, executor CPU, JVM
GC, shuffle write) parsed from the event log, and the mean busy fraction
of the pinned cores during the run — enough to tell "cores idle"
(scheduling gap / serialization) from "cores busy but slow" (work
inflation) when a phase refuses to scale.

Usage: python scripts/phase_probe.py CPUS [env KEY=VAL ...]
"""
import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def read_proc_stat(cpus):
    out = {}
    with open("/proc/stat") as fh:
        for line in fh:
            if line.startswith("cpu") and line[3].isdigit():
                parts = line.split()
                n = int(parts[0][3:])
                if n in cpus:
                    vals = [int(x) for x in parts[1:]]
                    idle = vals[3] + vals[4]
                    out[n] = (sum(vals), idle)
    return out


class Sampler(threading.Thread):
    def __init__(self, cpus):
        super().__init__(daemon=True)
        self.cpus = cpus
        self.samples = []  # (t, busy_frac)
        self.stop = threading.Event()

    def run(self):
        prev = read_proc_stat(self.cpus)
        while not self.stop.wait(2.0):
            cur = read_proc_stat(self.cpus)
            busy = tot = 0
            for n in self.cpus:
                dt = cur[n][0] - prev[n][0]
                didle = cur[n][1] - prev[n][1]
                busy += dt - didle
                tot += dt
            self.samples.append((round(time.time(), 1), round(busy / tot, 3) if tot else 0.0))
            prev = cur


def parse_evlog(evdir):
    stages = []
    py_metrics = {}
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            p = os.path.join(root, f)
            if f.endswith(".zstd") or f.startswith("appstatus"):
                continue
            if f.startswith("events_") or f.startswith("local-") or f == "events.json":
                lines = open(p, errors="replace").read().splitlines()
            else:
                continue
            acc = {}
            for line in lines:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerTaskEnd":
                    sid = e["Stage ID"]
                    tm = e.get("Task Metrics") or {}
                    a = acc.setdefault(sid, {"cpu": 0, "gc": 0, "run": 0, "swrite": 0,
                                             "swtime": 0, "sread": 0, "des": 0, "ser": 0})
                    a["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
                    a["run"] += tm.get("Executor Run Time", 0) / 1e3
                    a["gc"] += tm.get("JVM GC Time", 0) / 1e3
                    a["des"] += tm.get("Executor Deserialize Time", 0) / 1e3
                    a["ser"] += tm.get("Result Serialization Time", 0) / 1e3
                    sw = tm.get("Shuffle Write Metrics") or {}
                    a["swrite"] += sw.get("Shuffle Bytes Written", 0)
                    a["swtime"] += sw.get("Shuffle Write Time", 0) / 1e9
                    sr = tm.get("Shuffle Read Metrics") or {}
                    a["sread"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                elif ev == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    sid = si["Stage ID"]
                    a = acc.get(sid, {})
                    stages.append({
                        "stage": sid,
                        "tasks": si["Number of Tasks"],
                        "wall": round((si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3, 1),
                        "sub_t": si.get("Submission Time", 0) / 1e3,
                        "cpu_s": round(a.get("cpu", 0), 1),
                        "run_s": round(a.get("run", 0), 1),
                        "gc_s": round(a.get("gc", 0), 1),
                        "des_s": round(a.get("des", 0), 1),
                        "shuf_w_mb": round(a.get("swrite", 0) / 1e6, 1),
                        "shuf_wt_s": round(a.get("swtime", 0), 1),
                        "shuf_r_mb": round(a.get("sread", 0) / 1e6, 1),
                        "name": si["Stage Name"].split("\n")[0][:60],
                    })
    return stages, py_metrics


def main():
    cpus = int(sys.argv[1])
    extra = dict(a.split("=", 1) for a in sys.argv[2:])
    evdir = f"/tmp/probe_ev_{cpus}_{int(time.time())}"
    cores = list(range(cpus))
    samp = Sampler(cores)
    samp.start()
    t0 = time.time()
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus),
           "SPARK_GRAFT_EVENTLOG": evdir, **extra}
    proc = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, str(REPO / "bench.py"),
         "--crawl-only", "--cpus", str(cpus)],
        capture_output=True, text=True, cwd=str(REPO), env=env)
    wall = time.time() - t0
    samp.stop.set()
    samp.join(3)
    try:
        r = json.loads(proc.stdout.strip().splitlines()[-1])
    except (json.JSONDecodeError, IndexError):
        r = {"error": proc.stderr[-600:]}
    r["wall_s"] = round(wall, 1)
    print(json.dumps(r))
    stages, _ = parse_evlog(evdir)
    stages.sort(key=lambda s: -s["wall"])
    print(f"--- top stages (of {len(stages)}) ---")
    for s in stages[:14]:
        print(json.dumps(s))
    # busy fraction over time, 10-sample (20 s) buckets
    print("--- pinned-core busy fraction (20s buckets) ---")
    b = samp.samples
    for i in range(0, len(b), 10):
        chunk = [x[1] for x in b[i:i + 10]]
        print(f"t+{i * 2:4d}s: {sum(chunk) / len(chunk):.2f}")


if __name__ == "__main__":
    main()
