"""Direct unit tests for the frontier selection policies (F1-F4 + the
north_rule priority queue) — round 1 verified F2/F3 only indirectly."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from playwrightcrawler_spark.operators import frontier as fr

_T0 = datetime(2025, 6, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def cand(spark):
    rows = []
    for h in range(40):
        host = f"{'abc'[h % 3]}host{h:02d}.example"
        for p in range(1 + h % 4):
            rows.append((
                f"https://{host}/p{p}.html", host,
                _T0 + timedelta(minutes=h * 10 + p),
                p, 1.0 / (1.0 + p),
            ))
    return spark.createDataFrame(
        rows, "url string, host string, discovered_at timestamp, depth int, score double"
    ).cache()


def _hosts_unique(df):
    rows = df.collect()
    hosts = [r.host for r in rows]
    return rows, len(hosts) == len(set(hosts))


def test_select_oldest(cand):
    rows, uniq = _hosts_unique(fr.select_oldest(cand, size=10, quota=1))
    assert uniq and len(rows) == 10
    times = [r.discovered_at for r in rows]
    assert times == sorted(times)
    assert all(r.url.endswith("/p0.html") for r in rows)  # oldest per host


def test_select_random_deterministic_and_collapsed(cand):
    a = fr.select_random(cand, size=15, seed=7).collect()
    b = fr.select_random(cand, size=15, seed=7).collect()
    assert [r.url for r in a] == [r.url for r in b]       # resume-stable
    c = fr.select_random(cand, size=15, seed=8).collect()
    assert [r.url for r in a] != [r.url for r in c]       # seed actually used
    assert len({r.host for r in a}) == len(a)             # one per host


def test_select_host_prefix_single_action_semantics(cand):
    # seed=10 draws 'c' (hosts exist) → the slice is one first-char family
    out = fr.select_host_prefix(cand, size=10, seed=10, quota=1)
    rows, uniq = _hosts_unique(out)
    assert rows and uniq
    assert {r.host[0] for r in rows} == {"c"}
    again = [r.url for r in fr.select_host_prefix(cand, size=10, seed=10, quota=1).collect()]
    assert [r.url for r in rows] == again
    # seed=3 draws a char with no hosts → full-table fallback, never empty
    assert fr.select_host_prefix(cand, size=10, seed=3, quota=1).count() == 10


def test_select_host_prefix_falls_back_when_prefix_empty(spark):
    df = spark.createDataFrame(
        [("https://zz.example/a", "zz.example", _T0, 0, 1.0)],
        "url string, host string, discovered_at timestamp, depth int, score double",
    )
    # whatever char is drawn, a 1-row table must never return empty
    for seed in range(5):
        assert fr.select_host_prefix(df, size=5, seed=seed).count() == 1


def test_select_fewest_urls_prefers_unknown_hosts(cand):
    rows = fr.select_fewest_urls(cand, size=12, quota=1).collect()
    counts = [r for r in rows]
    assert len({r.host for r in rows}) == len(rows)
    # hosts with exactly 1 known URL (h % 4 == 0) must come first
    first_hosts = {r.host for r in rows[:10]}
    assert all(h.endswith(".example") for h in first_hosts)
    n_urls_order = []
    full = {r.host: 0 for r in cand.collect()}
    for r in cand.collect():
        full[r.host] += 1
    assert [full[r.host] for r in rows] == sorted(full[r.host] for r in rows)[: len(rows)]


def test_select_priority_shallow_first(cand):
    rows = fr.select_priority(cand, size=15, quota=1).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.depth == 0 for r in rows)  # every host has a depth-0 row


def test_weighted_select_seeded_and_filtered(spark, cand):
    blocked = cand.unionByName(
        spark.createDataFrame(
            [("https://www.gstatic.com/x", "www.gstatic.com", _T0, 0, 1.0)],
            "url string, host string, discovered_at timestamp, depth int, score double",
        )
    )
    m1, df1 = fr.weighted_select(blocked, size=10, seed=11, quota=1, weights=None)
    m2, df2 = fr.weighted_select(blocked, size=10, seed=11, quota=1, weights=None)
    assert m1 == m2
    assert [r.url for r in df1.collect()] == [r.url for r in df2.collect()]
    assert df1.filter(F.col("host") == "www.gstatic.com").count() == 0


def test_default_weights_reach_priority_queue(spark, pages_dir, tmp_path_factory):
    """config.METHOD_WEIGHTS ships the north_rule priority queue: the
    DEFAULT-config engine's seeded schedule selects it with no custom
    constructor arg, and the recorded per-wave method sequence equals the
    seeded weighted-choice schedule (crawl-ordering equivalence at the
    strategy-schedule level; the priority policy's row-level ordering is
    pinned by the equivalence_robots variant)."""
    import random

    from playwrightcrawler_spark import config as cfg
    from playwrightcrawler_spark.crawl.engine import CrawlEngine
    from playwrightcrawler_spark.sources import pages_gen

    assert cfg.METHOD_WEIGHTS.get("priority", 0) > 0
    names = list(cfg.METHOD_WEIGHTS)
    wts = [cfg.METHOD_WEIGHTS[n] for n in names]

    def sched(w, seed=42):                 # engine: Random(seed + wave)
        return random.Random(seed + w).choices(names, weights=wts, k=1)[0]

    # crawl waves start at 1 (bootstrap commits wave 0)
    first = next(w for w in range(1, 200) if sched(w) == "priority")
    wh = tmp_path_factory.mktemp("wh_default_weights")
    eng = CrawlEngine(spark, pages_dir, str(wh), wave_size=20)  # all defaults
    out = eng.run(first, seed_urls=pages_gen.seed_urls())
    methods = [m["method"] for m in out if "method" in m]
    assert methods == [sched(w) for w in range(1, len(methods) + 1)]
    assert "priority" in methods
