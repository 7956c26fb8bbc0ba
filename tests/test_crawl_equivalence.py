"""Crawl-equivalence gate (north_rule / SURVEY.md §5.2): a seeded,
deterministic DRIVER-SIDE re-execution of the frontier policy — plain
Python loops over the same pages fixture, built only from the pure
kernels — must produce the same URL-seen set and the same wave-by-wave
crawl ordering as the distributed engine under the same seed list and
politeness budget.

The simulator is an independent implementation path: no DataFrames, no
engine code — just urltools/textextract and the policy spec. If the
engine's shuffles/windows/anti-joins change semantics, this catches it.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from playwrightcrawler_spark import config
from playwrightcrawler_spark.crawl.engine import CrawlEngine
from playwrightcrawler_spark.functions import textextract, urltools
from playwrightcrawler_spark.sources import pages_gen

WAVES = 3
WAVE_SIZE = 50
QUOTA = 1
_BASE = datetime(2025, 6, 1, tzinfo=timezone.utc)


def _clean(url: str) -> tuple[str, str] | None:
    """The discovered-link hygiene pipeline, driver-side."""
    if urltools.is_embedded_url(url) or len(url) > config.MAX_URL_LENGTH:
        return None
    u = urltools.sanitize_url(url)
    if not u:
        return None
    host = urltools.hostname_of(u)
    if not host:
        return None
    import re

    if re.search("|".join(config.HOST_REGEX_BLOCK_LIST), host):
        return None
    if not re.search("|".join(config.HOST_REGEX_ALLOW_LIST), host):
        return None
    if re.search("|".join(map(re.escape, config.URL_REGEX_BLOCK_LIST)), u):
        return None
    if urltools.has_repeated_segments(u):
        return None
    return u, host


def simulate(pages: dict[str, bytes], seed_urls: list[str], hunt: bool):
    """Reference-logic crawl: oldest-first policy, per-host quota, waves."""
    frontier: dict[str, dict] = {}

    def discover(urls: list[str], depth: int, wave: int):
        for raw in urls:
            cleaned = _clean(raw)
            if cleaned is None:
                continue
            u, host = cleaned
            if u not in frontier:
                frontier[u] = dict(
                    host=host, depth=depth, visited=False,
                    discovered_at=_BASE + timedelta(hours=wave), wave=wave,
                )

    discover(seed_urls, 0, 0)
    fetched_by_wave: dict[int, set] = {}
    for wave in range(1, WAVES + 1):
        # F1 select_oldest + per-host quota: oldest per host (tie → url),
        # then globally oldest-first, tie → url, limit WAVE_SIZE
        unvisited = [(u, r) for u, r in frontier.items() if not r["visited"]]
        per_host: dict[str, tuple] = {}
        for u, r in sorted(unvisited, key=lambda x: (x[1]["discovered_at"], x[0])):
            if r["host"] not in per_host:
                per_host[r["host"]] = (u, r)
        wave_sel = sorted(
            per_host.values(), key=lambda x: (x[1]["discovered_at"], x[0])
        )[:WAVE_SIZE]
        if not wave_sel:
            break
        fetched_by_wave[wave] = set()
        new_links: list[tuple[str, int]] = []
        for u, r in wave_sel:
            r["visited"] = True
            r["wave"] = wave
            fetched_by_wave[wave].add(u)
            html = pages.get(u)
            links = textextract.extract_links(html) if html else []
            resolved = []
            for href in links:
                try:
                    resolved.append(urltools.resolve_link(u, href))
                except ValueError:
                    continue
            resolved = [l for l in resolved if not l.lower().startswith("mailto")]
            new_links += [(l, r["depth"] + 1) for l in resolved]
            if hunt:
                # engine semantics: tree of a fetched URL is depth+1; tree
                # of a discovered link hangs off the link (depth+2)
                new_links += [(t, r["depth"] + 1) for t in urltools.get_directory_tree(u)]
                for l in resolved:
                    if len(l) <= config.MAX_URL_LENGTH and not urltools.is_embedded_url(l):
                        new_links += [
                            (t, r["depth"] + 2) for t in urltools.get_directory_tree(l)
                        ]
        # set semantics with min-depth, like the engine's groupBy(min depth)
        for l, d in sorted(new_links, key=lambda x: x[1]):
            cleaned = _clean(l)
            if cleaned is None:
                continue
            u2, host2 = cleaned
            if u2 not in frontier:
                frontier[u2] = dict(
                    host=host2, depth=d, visited=False,
                    discovered_at=_BASE + timedelta(hours=wave), wave=wave,
                )
    return frontier, fetched_by_wave


@pytest.fixture(scope="module")
def equivalence(spark, pages_dir, tmp_path_factory):
    table = pq.read_table(pages_dir, columns=["url", "html"])
    pages = dict(zip(table.column("url").to_pylist(), table.column("html").to_pylist()))
    seeds = pages_gen.seed_urls()

    eng = CrawlEngine(
        spark, pages_dir, str(tmp_path_factory.mktemp("wh_eq")),
        wave_size=WAVE_SIZE, per_host_quota=QUOTA,
        method_weights={"oldest": 1},  # pinned strategy schedule (§5.2)
        hunt_open_directories=True,
    )
    eng.run(WAVES, seed_urls=seeds)
    sim_frontier, sim_waves = simulate(pages, seeds, hunt=True)
    return eng, sim_frontier, sim_waves


def test_seen_set_matches(equivalence, spark):
    """The URL-seen set (every URL ever admitted to the frontier)."""
    eng, sim_frontier, _ = equivalence
    engine_urls = {r.url for r in eng.lake.frontier.read(spark).select("url").collect()}
    sim_urls = set(sim_frontier)
    assert engine_urls == sim_urls, (
        sorted(engine_urls - sim_urls)[:5],
        sorted(sim_urls - engine_urls)[:5],
    )


def test_crawl_ordering_matches(equivalence, spark):
    """Wave-by-wave fetched sets — the crawl ordering under the pinned
    seed + policy schedule."""
    eng, _, sim_waves = equivalence
    crawled = (
        eng.lake.crawled.read(spark)
        .filter(F.col("route") != "email")
        .select("url", "wave")
        .collect()
    )
    engine_waves: dict[int, set] = {}
    for r in crawled:
        engine_waves.setdefault(r.wave, set()).add(r.url)
    assert set(engine_waves) == set(sim_waves)
    for w in sim_waves:
        assert engine_waves[w] == sim_waves[w], (
            w,
            sorted(engine_waves[w] ^ sim_waves[w])[:6],
        )


def test_depths_match(equivalence, spark):
    eng, sim_frontier, _ = equivalence
    eng_rows = {
        r.url: r.depth for r in eng.lake.frontier.read(spark).select("url", "depth").collect()
    }
    mismatches = {
        u: (eng_rows[u], sim_frontier[u]["depth"])
        for u in eng_rows
        if eng_rows[u] != sim_frontier[u]["depth"]
    }
    assert not mismatches, dict(list(mismatches.items())[:6])
