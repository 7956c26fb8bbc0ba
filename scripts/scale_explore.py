#!/usr/bin/env python3
"""Round-4 scaling exploration: run the crawl bench at several pinned CPU
levels (fresh JVM each, idle-gated), append per-sample JSON to
BENCH/explore_r4.jsonl. Informs the committed scaling pair (round-3
verdict #2: measure BOTH 1->4 and 2->8 before committing to either).

Usage: python scripts/scale_explore.py [levels...] (default 8 2 4 1)
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "BENCH" / "explore_r4.jsonl"


def idle_gate(max_wait=240, thresh=1.0):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < thresh:
            break
        time.sleep(10)
    return round(os.getloadavg()[0], 2)


def main():
    levels = [int(a) for a in sys.argv[1:]] or [8, 2, 4, 1]
    for c in levels:
        load = idle_gate()
        t0 = time.time()
        proc = subprocess.run(
            ["taskset", "-c", f"0-{c - 1}", sys.executable, str(REPO / "bench.py"),
             "--crawl-only", "--cpus", str(c)],
            capture_output=True, text=True, cwd=str(REPO),
            env={**os.environ, "SPARK_GRAFT_CPUS": str(c)},
        )
        wall = round(time.time() - t0, 1)
        try:
            r = json.loads(proc.stdout.strip().splitlines()[-1])
        except (json.JSONDecodeError, IndexError):
            r = {"cpus": c, "error": proc.stderr[-400:]}
        r["load_1m_before"] = load
        r["wall_s"] = wall
        with open(OUT, "a") as fh:
            fh.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
