"""Per-action wave profiler (dev tool): times each Spark action of one
crawl wave after warmup. Usage: python scripts/profile_wave.py [hosts] [wave_size]."""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from playwrightcrawler_spark.crawl import engine as eng_mod
from playwrightcrawler_spark.crawl.engine import FRONTIER_COLS, CrawlEngine
from playwrightcrawler_spark.functions import routing, sniff, sqlfns, udfs
from playwrightcrawler_spark.operators import frontier as fr
from playwrightcrawler_spark.session import get_spark
from playwrightcrawler_spark.sources import pages_gen
from playwrightcrawler_spark.sources.tables import with_host_salt


def T(label, f):
    t = time.time()
    r = f()
    print(f"{label:28s} {time.time() - t:6.2f}s", flush=True)
    return r


def main():
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    wave_size = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="profile-wave", cores=32, shuffle_partitions=32)
    pages_p = tempfile.mkdtemp() + "/pages.parquet"
    pages_gen.write_pages_scaled(spark, pages_p, n_hosts=n_hosts, pages_per_host=10)
    eng = CrawlEngine(spark, pages_p, tempfile.mkdtemp(), wave_size=wave_size,
                      per_host_quota=2, method_weights={"oldest": 1},
                      hunt_open_directories=False)
    eng.bootstrap(pages_gen.bench_seed_urls(n_hosts, 512))
    eng.run_wave(1)
    eng.run_wave(2)

    wave = 3
    frontier_df = eng._frontier()
    candidates = frontier_df.filter(~F.col("visited"))
    method, wave_df = fr.weighted_select(candidates, size=wave_size, seed=45,
                                         quota=2, weights={"oldest": 1})
    wave_df = wave_df.select("url", "url_hash", "host", "depth").cache()
    n = T("A1 select+count", lambda: wave_df.count())
    npart = max(1, min(32, n // 128 + 1))

    hits = eng._pages().join(F.broadcast(wave_df), on="url", how="inner").cache()
    missing = wave_df.join(F.broadcast(hits.select("url")), "url", "left_anti") \
        .withColumn("html", F.lit(None).cast("binary"))
    fetched = (
        hits.unionByName(missing).coalesce(npart)
        .withColumn("file_extension", sqlfns.file_extension(sqlfns.path_of(F.col("url"))))
        .withColumn("content_type", sniff.sniff_content_type(F.col("html"), F.col("file_extension")))
        .withColumn("route", routing.route_col(routing.sanitize_content_type_col(F.col("content_type"))))
        .withColumn("route", F.when(F.col("html").isNull(), "missing").otherwise(F.col("route")))
    ).cache()
    T("A1b fetched count", lambda: fetched.count())
    html_pages = udfs.with_extraction(
        fetched.filter(F.col("route") == "html"), "html", "url"
    ).drop("html").cache()
    T("A1c extraction", lambda: html_pages.count())
    raw_links = html_pages.select(
        F.col("url").alias("parent_url"), F.col("host").alias("parent_host"), "depth",
        F.explode(udfs.resolve_links(F.col("url"), F.col("raw_links"))).alias("url"),
    )
    crawled_all = eng._build_crawled(fetched, html_pages, raw_links, wave)
    T("A2 crawled write", lambda: eng.lake.crawled.append(spark, crawled_all, meta={"wave": wave}))

    web_links = (raw_links.filter(~F.col("url").rlike(eng_mod._MAILTO_RX))
                 .select("url", (F.col("depth") + 1).alias("depth")).coalesce(npart))
    flagged = eng._classify_links(web_links)
    new_links = (eng._dedupe_links(flagged)
                 .withColumn("url_hash", sqlfns.url_hash(F.col("url")))
                 .join(frontier_df.select("url_hash"), "url_hash", "left_anti"))
    insert_rows = (with_host_salt(new_links, buckets=64)
                   .withColumn("visited", F.lit(False))
                   .withColumns(eng._frontier_row_cols(wave))
                   .select(*FRONTIER_COLS)).cache()
    untouched = frontier_df.join(wave_df.select("url_hash"), "url_hash", "left_anti")
    visited_rows = (frontier_df.join(wave_df.select("url_hash"), "url_hash", "left_semi")
                    .withColumn("visited", F.lit(True))
                    .withColumn("wave", F.lit(wave).cast("int")))
    merged = untouched.select(*FRONTIER_COLS).unionByName(
        visited_rows.select(*FRONTIER_COLS)).unionByName(insert_rows)
    T("A3 frontier write", lambda: eng.lake.frontier.write(merged, meta={"wave": wave}))
    T("A4 bucket counts", lambda: insert_rows.groupBy("host_salt").count().collect())
    spark.stop()


if __name__ == "__main__":
    main()
