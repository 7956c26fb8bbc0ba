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


def simulate(
    pages: dict[str, bytes],
    seed_urls: list[str],
    hunt: bool,
    policy: str = "oldest",
    robots: dict[str, tuple[list[str], int | None]] | None = None,
):
    """Reference-logic crawl: seeded policy, per-host quota, waves; with
    optional robots rules (denied rows consume their slot, flip visited,
    and are never fetched — engine semantics)."""
    from urllib.parse import urlsplit as _usplit

    frontier: dict[str, dict] = {}

    def sel_key(item):
        u, r = item
        if policy == "priority":
            # score = 1/(1+depth) desc ⇔ depth asc; ties: age then url
            return (r["depth"], r["discovered_at"], u)
        return (r["discovered_at"], u)

    def denied(u: str, host: str) -> bool:
        if not robots or host not in robots:
            return False
        prefixes, _delay = robots[host]
        path = _usplit(u).path
        return any(path.startswith(p) for p in prefixes)

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
        # policy selection + per-host quota: first per host by the policy
        # key, then globally policy-ordered, limit WAVE_SIZE
        unvisited = [(u, r) for u, r in frontier.items() if not r["visited"]]
        per_host: dict[str, tuple] = {}
        for u, r in sorted(unvisited, key=sel_key):
            if r["host"] not in per_host:
                per_host[r["host"]] = (u, r)
        wave_sel = sorted(per_host.values(), key=sel_key)[:WAVE_SIZE]
        if not wave_sel:
            break
        fetched_by_wave[wave] = set()
        new_links: list[tuple[str, int]] = []
        for u, r in wave_sel:
            r["visited"] = True
            r["wave"] = wave
            if denied(u, r["host"]):
                continue  # consumed but never fetched
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


# --- variant: robots compliance + score-priority policy pinned --------------

@pytest.fixture(scope="module")
def equivalence_robots(spark, pages_dir, tmp_path_factory):
    from playwrightcrawler_spark.functions import robotstxt

    table = pq.read_table(pages_dir, columns=["url", "html"])
    pages = dict(zip(table.column("url").to_pylist(), table.column("html").to_pylist()))
    seeds = pages_gen.seed_urls()

    eng = CrawlEngine(
        spark, pages_dir, str(tmp_path_factory.mktemp("wh_eq_robots")),
        wave_size=WAVE_SIZE, per_host_quota=QUOTA,
        method_weights={"priority": 1},       # north_rule priority queue
        hunt_open_directories=False,
        robots_rules="pages",                 # parsed from the corpus
    )
    eng.run(WAVES, seed_urls=seeds)

    robots = {}
    for url, body in pages.items():
        if url.endswith("/robots.txt"):
            host = url.split("://", 1)[1].split("/", 1)[0]
            prefixes, delay = robotstxt.parse_robots(
                bytes(body).decode("utf-8", errors="replace")
            )
            if prefixes or delay is not None:
                robots[host] = (prefixes, delay)
    sim_frontier, sim_waves = simulate(
        pages, seeds, hunt=False, policy="priority", robots=robots
    )
    return eng, sim_frontier, sim_waves, robots


def test_robots_priority_seen_set_matches(equivalence_robots, spark):
    eng, sim_frontier, _, _ = equivalence_robots
    engine_urls = {r.url for r in eng.lake.frontier.read(spark).select("url").collect()}
    assert engine_urls == set(sim_frontier), (
        sorted(engine_urls ^ set(sim_frontier))[:6],
    )


def test_robots_priority_ordering_matches(equivalence_robots, spark):
    eng, _, sim_waves, _ = equivalence_robots
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
            w, sorted(engine_waves[w] ^ sim_waves[w])[:6],
        )


def test_robots_denied_never_crawled_but_consumed(equivalence_robots, spark):
    """Disallowed URLs must appear in the frontier as visited (consumed)
    yet never in crawled — and some must actually exist in this run."""
    eng, _, _, robots = equivalence_robots
    fr = eng.lake.frontier.read(spark).collect()
    crawled_urls = {
        r.url for r in eng.lake.crawled.read(spark).select("url").collect()
    }
    from urllib.parse import urlsplit

    denied = [
        r for r in fr
        if r.host in robots
        and any(urlsplit(r.url).path.startswith(p) for p in robots[r.host][0])
    ]
    assert denied, "fixture produced no robots-denied frontier rows"
    for r in denied:
        assert r.url not in crawled_urls, r.url
    assert any(r.visited for r in denied)  # consumed over the crawled waves
