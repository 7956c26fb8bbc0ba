#!/usr/bin/env python3
"""Extra benchmarks for the optimization rounds (bench.py is frozen for
measurement — this file holds the guide-§1 instrumentation: per-query
noop-sink timing, .explain("formatted") capture, and sub-phase probes).

Usage:
    python bench_extra.py time [query ...]      # noop-sink per-query seconds
    python bench_extra.py plans [query ...]     # write plans/r07/<q>_<tag>.txt
    python bench_extra.py both [query ...]
Env:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS (default 32)
    BENCH_EXTRA_TAG (plan filename suffix, default "before")
    BENCH_EXTRA_PASSES (default 3; per-query min is reported)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")
PASSES = int(os.environ.get("BENCH_EXTRA_PASSES", "3"))

DEFAULT_QUERIES = [
    "pricing_summary", "top_customers", "frontier_oldest_per_host",
    "frontier_fewest_urls", "seen_anti_join", "topk_words", "exact_dedup",
    "minhash_lsh_pairs", "minhash_lsh_pairs_xxh", "embedding_near_dup",
    "embedding_topk", "lang_id", "quality_scores", "token_counts",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    names = sys.argv[2:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from playwrightcrawler_spark.session import get_spark

    spark = get_spark(app_name="pwc-bench-extra", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    qmap = entrymod.queries()
    # warm JVM/parquet footers untimed (same as bench.py)
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    if mode in ("plans", "both"):
        outdir = REPO / "plans" / "r07"
        outdir.mkdir(parents=True, exist_ok=True)
        for name in names:
            df = qmap[name](spark, SF_DIR)
            p = outdir / f"{name}_{TAG}.txt"
            p.write_text(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
            print(f"plan -> {p}")

    if mode in ("time", "both"):
        timings: dict[str, float] = {}
        for _ in range(PASSES):
            for name in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                noop(qmap[name](spark, SF_DIR))
                dt = round(time.time() - t0, 3)
                if name not in timings or dt < timings[name]:
                    timings[name] = dt
        spark.sparkContext.setJobDescription(None)
        total = round(sum(timings.values()), 3)
        print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "tag": TAG,
                          "total_sec": total, "queries": timings}))

    spark.stop()


if __name__ == "__main__":
    main()
