"""The wave-iterated crawl engine — the reference's main loop as DataFrame
jobs (SURVEY.md §3.1 "Spark equivalent lifecycle").

One wave =
    select  : frontier policy (F1-F4) + per-host politeness quota (J3)
    fetch   : broadcast-join the (small) wave against the pages table —
              replaces the live browser per BASELINE.json input_hint
    route   : content-type sniff → first-match route (R0)
    extract : text/words/links/opendir pandas UDFs on html rows (E1-E6)
    discover: explode links + open-dir tree expansion (P16) → canonicalize
              (P1) → hygiene filters with drop accounting (P4-P10, A5)
    dedup   : dropDuplicates + anti-join against the frontier (J1/J2/J5)
    commit  : crawled append + frontier MERGE + wave_metrics, one snapshot
              per wave (resumable — north_rule checkpoint/lineage)

Scale design: the wave side of every join is <= wave_size rows and is
broadcast, so the 10^10-row pages/frontier tables are never shuffled on
the fetch path; the only wide shuffles are the per-host window (bounded by
the candidate set) and the final MERGE rewrite (bucketed by host_salt on
Iceberg). Skew: host_salt spreads mega-domains across tasks for hashing
work; politeness aggregates on the raw host (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from playwrightcrawler_spark import config
from playwrightcrawler_spark.functions import routing, sniff, sqlfns, udfs
from playwrightcrawler_spark.operators import frontier as fr
from playwrightcrawler_spark.sources.tables import Lakehouse, with_host_salt

_BASE_TS = datetime(2025, 6, 1, tzinfo=timezone.utc)

_MAILTO_RX = (
    r"(?i)^(mailto:|maillto:|maito:|mail:|malito:|mailton:|\"mailto:|"
    r"emailto:|maltio:|mainto:|E-mail:|mailtfo:|mailtp:|mailtop:|"
    r"mailo:|mail to:|Email para:|email :|email:|E-mail: |mail-to:|"
    r"maitlo:|mail\.to:)"
)


def _wave_ts(wave: int):
    """Deterministic timestamps: reruns produce identical tables."""
    return _BASE_TS + timedelta(hours=wave)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages_path: str,
        warehouse: str,
        wave_size: int = 1000,
        per_host_quota: int = config.PER_HOST_WAVE_QUOTA,
        seed: int = 42,
        method_weights: dict | None = None,
        hunt_open_directories: bool = config.HUNT_OPEN_DIRECTORIES,
        robots_rules: DataFrame | None = None,
    ):
        self.spark = spark
        self.pages_path = pages_path
        self.lake = Lakehouse(warehouse)
        self.wave_size = wave_size
        self.quota = per_host_quota
        self.seed = seed
        self.method_weights = method_weights or config.METHOD_WEIGHTS
        self.hunt = hunt_open_directories
        self.robots = robots_rules

    # ------------------------------------------------------------------ util
    def _pages(self) -> DataFrame:
        return self.spark.read.parquet(self.pages_path)

    @staticmethod
    def _frontier_row_cols(wave: int):
        ts = _wave_ts(wave)
        return dict(
            url_hash=sqlfns.url_hash(F.col("url")),
            depth=F.col("depth").cast("int"),
            score=(F.lit(1.0) / (F.lit(1.0) + F.col("depth"))).cast("double"),
            visited=F.col("visited"),
            discovered_at=F.lit(ts),
            wave=F.lit(wave).cast("int"),
        )

    # ------------------------------------------------------------- bootstrap
    def bootstrap(self, seed_urls: list[str]) -> int:
        """S5: seed ingestion → frontier v1. Seeds are canonicalized and
        hygiene-filtered exactly like discovered links."""
        df = self.spark.createDataFrame([(u,) for u in seed_urls], "url string")
        links = self._normalize_and_filter(
            df.withColumn("depth", F.lit(0)), drop_metrics=False
        )
        rows = (
            with_host_salt(links, buckets=config.HOST_SALT_BUCKETS)
            .withColumn("visited", F.lit(False))
            .withColumns(self._frontier_row_cols(wave=0))
            .select(
                "url", "url_hash", "host", "host_salt", "depth", "score",
                "visited", "discovered_at", "wave",
            )
        )
        self.lake.frontier.merge_upsert(self.spark, rows, key="url_hash",
                                        meta={"wave": 0, "op": "bootstrap"})
        return rows.count()

    # ------------------------------------------------- link hygiene pipeline
    def _normalize_and_filter(self, links: DataFrame, drop_metrics: bool = True):
        """P1 canonicalization + P4-P10 filters. Input: (url, depth [, ...]).
        Output: clean (url, host, depth) plus optional ``_drops`` attr."""
        canon = links.withColumn("url", udfs.canonicalize_url(F.col("url")))
        host = sqlfns.host_of(F.col("url"))
        flagged = (
            canon.withColumn("host", host)
            .withColumn(
                "drop_reason",
                F.when(F.col("url") == "", "invalid")
                .when(sqlfns.is_embedded(F.col("url")), "embedded")
                .when(~sqlfns.length_ok(F.col("url")), "too_long")
                .when(F.col("host").isNull() | (F.col("host") == ""), "no_host")
                .when(sqlfns.host_block_listed(F.col("host")), "blocked_host")
                .when(~sqlfns.host_allow_listed(F.col("host")), "not_allowed")
                .when(sqlfns.url_block_listed(F.col("url")), "blocked_url")
                .when(
                    sqlfns.repeated_segments_prefilter(F.col("url"))
                    & udfs.has_repeated_segments(F.col("url")),
                    "repeated_segments",
                )
                .otherwise(F.lit(None)),
            )
        )
        if drop_metrics:
            self._last_drops = (
                flagged.filter(F.col("drop_reason").isNotNull())
                .groupBy("drop_reason").count().collect()
            )
        kept = flagged.filter(F.col("drop_reason").isNull()).drop("drop_reason")
        # J4: set semantics on discovered URLs; smallest depth wins
        return kept.groupBy("url", "host").agg(F.min("depth").alias("depth"))

    # ------------------------------------------------------------- one wave
    def run_wave(self, wave: int) -> dict:
        t0 = time.time()
        spark = self.spark
        frontier_df = self.lake.frontier.read(spark)
        candidates = frontier_df.filter(~F.col("visited"))

        method, wave_df = fr.weighted_select(
            candidates,
            size=self.wave_size,
            seed=self.seed + wave,
            quota=self.quota,
            weights=self.method_weights,
        )
        if self.robots is not None:
            # north_rule: broadcast the (tiny) robots table; drop disallowed
            wave_df = (
                wave_df.join(F.broadcast(self.robots), on="host", how="left")
                .withColumn(
                    "_disallowed",
                    F.exists(
                        F.coalesce("disallow_prefixes", F.array()),
                        lambda p: F.expr("url").startswith(F.concat(F.lit("https://"), F.col("host"), p))
                        | sqlfns.path_of(F.col("url")).startswith(p),
                    ),
                )
                .filter(~F.col("_disallowed"))
                .drop("_disallowed", "disallow_prefixes", "crawl_delay_ms")
            )
        wave_df = wave_df.select("url", "url_hash", "host", "depth").cache()
        urls_selected = wave_df.count()
        if urls_selected == 0:
            return {"wave": wave, "method": method, "urls_selected": 0, "done": True}

        # ---- fetch: broadcast the small wave against the big pages table
        pages = self._pages().select("url", "html")
        fetched = (
            F.broadcast(wave_df)
            .join(pages, on="url", how="left")
            .withColumn("file_extension", sqlfns.file_extension(sqlfns.path_of(F.col("url"))))
            .withColumn("content_type", sniff.sniff_content_type(F.col("html"), F.col("file_extension")))
            .withColumn("route", routing.route_col(routing.sanitize_content_type_col(F.col("content_type"))))
            .withColumn("route", F.when(F.col("html").isNull(), "missing").otherwise(F.col("route")))
        ).cache()

        html_pages = udfs.with_extraction(
            fetched.filter(F.col("route") == "html"), html_col="html", url_col="url"
        ).cache()

        # ---- discovered links: resolve → (optional) open-dir tree → hygiene
        raw_links = (
            html_pages.select(
                F.col("url").alias("parent_url"),
                F.col("host").alias("parent_host"),
                "depth",
                F.explode(udfs.resolve_links(F.col("url"), F.col("raw_links"))).alias("url"),
            )
        ).cache()
        links_discovered = raw_links.count()

        emails = (
            raw_links.filter(F.col("url").rlike(_MAILTO_RX))
            .withColumn("email", udfs.extract_email(F.col("url")))
            .filter(F.col("email").isNotNull())
            .select(
                F.concat_ws("|", "parent_url", "email").alias("url"),
                F.col("email"), "parent_url", "parent_host",
            )
        )

        web_links = raw_links.filter(~F.col("url").rlike(_MAILTO_RX)).select(
            "url", (F.col("depth") + 1).alias("depth")
        )
        if self.hunt:
            # P16: every content URL and every discovered link contributes its
            # parent-directory chain (reference preprocess :1837-1845)
            tree_of = lambda df, d: df.select(
                F.explode(udfs.directory_tree(F.col("url"))).alias("url"),
                (d + 1).alias("depth"),
            )
            web_links = (
                web_links
                .unionByName(tree_of(fetched.select("url", "depth"), F.col("depth")))
                .unionByName(tree_of(web_links.filter(sqlfns.length_ok(F.col("url")) & ~sqlfns.is_embedded(F.col("url"))), F.col("depth")))
            )

        clean = self._normalize_and_filter(web_links)
        # J1/J2: drop anything already known (frontier holds every seen URL)
        new_links = (
            clean.withColumn("url_hash", sqlfns.url_hash(F.col("url")))
            .join(frontier_df.select("url_hash"), on="url_hash", how="left_anti")
        ).cache()
        links_new = new_links.count()

        # ---- crawled rows (A4 schema, reference §1.1b)
        enrich = sqlfns.enrichment_columns(F.col("url"))
        source_col = (
            F.when(F.col("route") == "html", "content_type_download")
            .when(F.col("route") == "plain_text", "content_type_plain_text")
            .when(F.col("route") == "missing", "fetch_miss")
            .when(F.col("route") == "image", "content_type_images_no_download")
            .otherwise(F.concat(F.lit("content_type_"), F.col("route")))
        )
        crawled = (
            fetched.join(
                html_pages.select(
                    "url", "text_extracted", "words", "isopendir", "opendir_pattern"
                ),
                on="url",
                how="left",
            )
            .withColumn("text", F.coalesce(
                F.col("text_extracted"),
                F.when(F.col("route") == "plain_text",
                       F.substring(F.decode("html", "UTF-8"), 1, config.MAX_WEBCONTENT_SIZE)),
            ))
            .withColumn("words", F.coalesce(
                F.col("words"),
                F.when(F.col("route") == "plain_text", udfs.top_words(F.col("text"))),
            ))
            .withColumn("isopendir", F.coalesce(F.col("isopendir"), F.lit(False)))
            .withColumn("opendir_pattern", F.coalesce(F.col("opendir_pattern"), F.lit("")))
            .withColumn("visited", F.lit(True))
            .withColumn("source", source_col)
            .withColumn("emails", F.lit(None).cast("array<string>"))
            .withColumn("parent_host", F.lit(None).cast("string"))
            .withColumns(enrich)
            .withColumn("wave", F.lit(wave).cast("int"))
            .withColumn("fetched_at", F.lit(_wave_ts(wave)))
            .drop("html", "text_extracted", "raw_links")
        )
        email_rows = (
            emails.withColumn("url_hash", sqlfns.url_hash(F.col("url")))
            .withColumn("content_type", F.lit(""))
            .withColumn("route", F.lit("email"))
            .withColumn("file_extension", F.lit(""))
            .withColumn("depth", F.lit(None).cast("int"))
            .withColumn("text", F.lit(None).cast("string"))
            .withColumn("words", F.lit(None).cast("array<string>"))
            .withColumn("isopendir", F.lit(False))
            .withColumn("opendir_pattern", F.lit(""))
            .withColumn("visited", F.lit(True))
            .withColumn("source", F.lit("email_url"))
            .withColumn("emails", F.array(F.col("email")))
            .withColumn("host", F.col("parent_host"))
            .withColumns({k: v for k, v in sqlfns.enrichment_columns(F.col("parent_url")).items() if k != "host"})
            .withColumn("wave", F.lit(wave).cast("int"))
            .withColumn("fetched_at", F.lit(_wave_ts(wave)))
            .drop("email", "parent_url")
        )
        crawled_all = crawled.unionByName(email_rows, allowMissingColumns=True)
        crawled_version = self.lake.crawled.append(
            spark, crawled_all, meta={"wave": wave}
        )

        # ---- frontier MERGE: mark fetched visited, insert new links
        visited_rows = (
            frontier_df.join(wave_df.select("url_hash"), "url_hash", "left_semi")
            .withColumn("visited", F.lit(True))
            .withColumn("wave", F.lit(wave).cast("int"))
        )
        insert_rows = (
            with_host_salt(new_links, buckets=config.HOST_SALT_BUCKETS)
            .withColumn("visited", F.lit(False))
            .withColumns(self._frontier_row_cols(wave))
            .select(
                "url", "url_hash", "host", "host_salt", "depth", "score",
                "visited", "discovered_at", "wave",
            )
        )
        frontier_version = self.lake.frontier.merge_upsert(
            spark,
            visited_rows.unionByName(insert_rows),
            key="url_hash",
            meta={"wave": wave},
        )

        # ---- metrics + lineage (per salt bucket), A5/A6 analogue
        fetched_ok = fetched.filter(F.col("route") != "missing").count()
        bucket_rows = [
            (wave, f"bucket:{r['host_salt']}", "links_new", r["count"])
            for r in insert_rows.groupBy("host_salt").count().collect()
        ]
        drop_rows = [
            (wave, f"drop:{r['drop_reason']}", "links_dropped", r["count"])
            for r in getattr(self, "_last_drops", [])
        ]
        scalar = [
            (wave, "wave", "urls_selected", urls_selected),
            (wave, "wave", "urls_fetched", fetched_ok),
            (wave, "wave", "pages_missing", urls_selected - fetched_ok),
            (wave, "wave", "links_discovered", links_discovered),
            (wave, "wave", "links_new", links_new),
        ]
        metrics_df = spark.createDataFrame(
            scalar + bucket_rows + drop_rows,
            "wave int, scope string, metric string, value long",
        ).withColumns(
            {
                "method": F.lit(method),
                "node_id": F.lit(config.NODE_ID),
                "committed_at": F.current_timestamp(),
            }
        )
        self.lake.wave_metrics.append(spark, metrics_df, meta={"wave": wave})

        for df in (wave_df, fetched, html_pages, raw_links, new_links):
            df.unpersist()
        return {
            "wave": wave,
            "method": method,
            "urls_selected": urls_selected,
            "urls_fetched": fetched_ok,
            "links_discovered": links_discovered,
            "links_new": links_new,
            "crawled_version": crawled_version,
            "frontier_version": frontier_version,
            "seconds": round(time.time() - t0, 2),
            "done": False,
        }

    # ---------------------------------------------------------------- driver
    def last_committed_wave(self) -> int:
        waves = [v.get("wave", -1) for v in self.lake.frontier.versions()]
        return max(waves) if waves else -1

    def run(self, waves: int, seed_urls: list[str] | None = None) -> list[dict]:
        """X11/X12: the iteration loop. Resumes from the last committed wave
        (kill-between-waves → relaunch → identical final tables)."""
        if not self.lake.frontier.exists():
            if not seed_urls:
                raise ValueError("empty frontier and no seed_urls")
            self.bootstrap(seed_urls)
        start = self.last_committed_wave() + 1
        out = []
        for w in range(start, start + waves):
            m = self.run_wave(w)
            out.append(m)
            if m.get("done"):
                break
        return out


if __name__ == "__main__":
    import argparse
    import tempfile

    from playwrightcrawler_spark.session import get_spark
    from playwrightcrawler_spark.sources import pages_gen

    ap = argparse.ArgumentParser(description="run crawl waves on the synthetic pages fixture")
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--wave-size", type=int, default=500)
    ap.add_argument("--pages", default=None, help="pages parquet (default: generate fixture)")
    ap.add_argument("--warehouse", default=None)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="pwc_")
    pages = args.pages or f"{tmp}/pages.parquet"
    if args.pages is None:
        n = pages_gen.write_pages_fixture(pages)
        print(f"generated {n} fixture pages → {pages}")
    spark = get_spark(app_name="crawl-engine")
    eng = CrawlEngine(spark, pages, args.warehouse or f"{tmp}/warehouse",
                      wave_size=args.wave_size)
    for m in eng.run(args.waves, seed_urls=pages_gen.seed_urls()):
        print(m)
    print("tables:", eng.lake.describe())
    spark.stop()
