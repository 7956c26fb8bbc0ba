#!/usr/bin/env python3
"""Allocator micro-probe: reproduce the python-worker allocation pattern of
the extraction stage (Arrow batch -> pandas Series of ~100 KB strings ->
derived str/bytes temporaries -> free) across N concurrent processes, and
report user/sys CPU per condition.

The round-4/5 phase probes showed python workers burning 12-19 CPU cores of
pure SYSTEM time during the local[32] extraction stage (more sys than user).
Hypothesis: per-batch buffer alloc/free crosses the glibc mmap/trim
thresholds (and jemalloc's dirty-page decay purges), so every batch does
mmap/munmap/madvise -> page faults + TLB shootdown IPIs across 32 cores.
This probe A/Bs the candidate env fixes in seconds instead of 3-minute
full bench samples.

Usage: python scripts/alloc_probe.py [NPROC] [SECONDS]
"""
import os
import resource
import sys
import time
import multiprocessing as mp

# glibc reads MALLOC_* / GLIBC_TUNABLES once at process startup; a fork()ed
# child inherits the parent's already-initialized malloc, so the env must be
# in place before exec -> use spawn, which re-execs the interpreter.
mp.set_start_method("spawn", force=True)
Process, Queue = mp.Process, mp.Queue

NPROC = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0

PAGE = 100 * 1024
BATCH = 256


def worker(q, env_label):
    import pandas as pd

    base = ("<html><body>" + "word " * (PAGE // 5) + "</body></html>").encode()
    t_end = time.time() + SECS
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    n = 0
    while time.time() < t_end:
        # mimic one Arrow batch crossing: bytes col -> decode -> split
        ser = pd.Series([base[: PAGE + (i % 7) * 31] for i in range(BATCH)])
        dec = ser.str.decode("utf-8", errors="replace")
        words = dec.str.split()
        lens = words.str.len()
        n += int(lens.sum())
        del ser, dec, words, lens
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    q.put((r1.ru_utime - r0.ru_utime, r1.ru_stime - r0.ru_stime,
           r1.ru_minflt - r0.ru_minflt, n))


def run_condition(label, env):
    for k, v in env.items():
        os.environ[k] = v
    q = Queue()
    procs = [Process(target=worker, args=(q, label)) for _ in range(NPROC)]
    t0 = time.time()
    for p in procs:
        p.start()
    out = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    ut = sum(o[0] for o in out)
    st = sum(o[1] for o in out)
    flt = sum(o[2] for o in out)
    work = sum(o[3] for o in out)
    print(f"{label:34s} user={ut:7.1f}s sys={st:7.1f}s "
          f"minflt={flt/1e6:6.1f}M work/cpu_s={work/max(ut+st,0.01)/1e6:6.2f}M "
          f"wall={wall:5.1f}s")
    for k in env:
        os.environ.pop(k, None)
    return st, work


# trim threshold must exceed the per-batch transient (~300 MB of split-word
# strings at CC page weight) or glibc trims the top chunk back every batch
# and re-faults it on the next one.
GLIBC_HOLD = {
    "MALLOC_MMAP_THRESHOLD_": str(1024 * 1024 * 1024),
    "MALLOC_TRIM_THRESHOLD_": str(2048 * 1024 * 1024),
    "MALLOC_TOP_PAD_": str(64 * 1024 * 1024),
    "MALLOC_ARENA_MAX": "2",
}

CONDS = [
    ("baseline", {}),
    ("pymalloc off + glibc hold 2G", {"PYTHONMALLOC": "malloc", **GLIBC_HOLD}),
]

if __name__ == "__main__":
    print(f"nproc={NPROC} secs/cond={SECS} page={PAGE} batch={BATCH}")
    # interleave conditions to decorrelate host drift; report each pass
    for rep in range(int(os.environ.get("ALLOC_PROBE_REPS", "3"))):
        for label, env in CONDS:
            run_condition(f"[{rep}] {label}", env)
