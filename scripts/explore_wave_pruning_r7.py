#!/usr/bin/env python3
"""Round-7 explore (round-6 verdict #2): MEASURE the wave-membership
pruning win — files read + fetch+extract seconds for the same wave over
the same corpus, bucketed vs flat.

Shape: a corpus 10x the bench corpus (600k pages, 40k hosts x 15), hive-
partitioned by pmod(xxhash64(url), N). Pruning prunes DIRECTORIES, so it
pays when the wave touches a strict subset of buckets: with uniformly
hashed urls a wave of w urls hits ~N*(1-(1-1/N)^w) buckets — i.e. the
lever fires at wave_size << N (incremental recrawls, politeness-bounded
probe waves) and degrades to a full scan at wave_size >> N. Both shapes
are measured and recorded honestly in BENCH/explore_r7.jsonl.

Usage: taskset -c 0-31 python scripts/explore_wave_pruning_r7.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from playwrightcrawler_spark.crawl.engine import CrawlEngine  # noqa: E402
from playwrightcrawler_spark.session import get_spark  # noqa: E402
from playwrightcrawler_spark.sources import pages_gen  # noqa: E402

N_HOSTS = int(os.environ.get("EXPLORE_HOSTS", "40000"))
PAGES_PER_HOST = 15
PARAGRAPHS = int(os.environ.get("EXPLORE_PARAGRAPHS", "100"))
BUCKETS = int(os.environ.get("EXPLORE_BUCKETS", "256"))
N_FILES = int(os.environ.get("EXPLORE_FILES", "512"))
WAVES = (32, 4000)  # << BUCKETS → prunes; >> BUCKETS → full scan, recorded


def corpus_paths() -> tuple[str, str]:
    import tempfile

    tag = f"{N_HOSTS}x{PAGES_PER_HOST}x{PARAGRAPHS}x{N_FILES}"
    flat = os.path.join(tempfile.gettempdir(), f"pwc_explore_flat_{tag}.parquet")
    bucketed = os.path.join(
        tempfile.gettempdir(), f"pwc_explore_b{BUCKETS}_{tag}.parquet"
    )
    return flat, bucketed


def ensure_corpora(spark) -> tuple[str, str]:
    flat, bucketed = corpus_paths()
    kw = dict(n_hosts=N_HOSTS, pages_per_host=PAGES_PER_HOST,
              paragraphs=PARAGRAPHS, include_assets=False, next_links=5,
              n_files=N_FILES)
    for path, buckets in ((flat, None), (bucketed, BUCKETS)):
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            t0 = time.time()
            n = pages_gen.write_pages_scaled(spark, path, url_buckets=buckets, **kw)
            print(f"generated {n} pages -> {path} in {time.time()-t0:.0f}s",
                  flush=True)
    return flat, bucketed


def wave_frame(spark, urls):
    return (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", F.lit("h"))
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_at", F.current_timestamp())
    )


def files_read(df) -> int:
    return df.select(F.input_file_name()).distinct().count()


def main() -> None:
    import tempfile

    spark = get_spark(app_name="explore-wave-pruning", cores=32,
                      shuffle_partitions=32)
    flat, bucketed = ensure_corpora(spark)
    import hashlib

    all_urls = list(pages_gen.bench_all_page_urls(N_HOSTS, PAGES_PER_HOST))
    all_urls.sort(key=lambda u: hashlib.md5(u.encode()).hexdigest())
    rows = [{"url": u} for u in all_urls[: max(WAVES)]]

    out = {
        "explore": "wave_membership_pruning_r7",
        "corpus_pages": N_HOSTS * PAGES_PER_HOST,
        "paragraphs": PARAGRAPHS,
        "buckets": BUCKETS,
        "n_files_flat": N_FILES,
        "shapes": [],
    }
    for wave_size in WAVES:
        urls = [r["url"] for r in rows[:wave_size]]
        shape = {"wave_size": wave_size}
        for label, path in (("flat", flat), ("bucketed", bucketed)):
            wh = tempfile.mkdtemp(prefix=f"pwc_explore_wh_{label}_")
            eng = CrawlEngine(spark, path, wh, wave_size=wave_size,
                              method_weights={"oldest": 1},
                              hunt_open_directories=False)
            wave = wave_frame(spark, urls)
            scan = eng._pages_for_wave(wave)
            nfiles = files_read(scan)
            total_files = files_read(spark.read.parquet(path))
            # timed fetch+extract (the wave hot path), best of 3
            best = None
            for _ in range(3):
                t0 = time.time()
                eng._fused_fetch_extract(wave, npart=8).write.format(
                    "noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            shape[label] = {
                "files_read": nfiles,
                "files_total": total_files,
                "fetch_extract_sec_best3": round(best, 2),
            }
            import shutil

            shutil.rmtree(wh, ignore_errors=True)
        fr = shape["flat"]["files_read"] / max(1, shape["bucketed"]["files_read"])
        shape["files_read_reduction"] = round(fr, 2)
        out["shapes"].append(shape)
        print(json.dumps(shape), flush=True)

    hist = REPO / "BENCH" / "explore_r7.jsonl"
    with open(hist, "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print("wrote", hist, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
