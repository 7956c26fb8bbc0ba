"""Detector-first decode lane, end-to-end (round-5 verdict #6).

The unit parity test pins ``detect_decode(detector_first=True)`` against
the reference decode order (playwrightcrawler.py:5093-5099); this test
runs the flag through the FULL engine — env → config → route-aware fused
extraction UDF in a real python worker → crawled table — in a fresh
subprocess, because ``SPARK_GRAFT_DETECTOR_FIRST`` is read at module
import and the shared session's reused workers would not see a
monkeypatched value.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import sys

from pyspark.sql import functions as F

from playwrightcrawler_spark import config

# the env flag must have reached config in THIS process (and therefore in
# the python workers this process's JVM forks)
assert config.DECODE_DETECTOR_FIRST is True

from playwrightcrawler_spark.crawl.engine import CrawlEngine
from playwrightcrawler_spark.functions import textextract
from playwrightcrawler_spark.session import get_spark
from playwrightcrawler_spark.sources import pages_gen

pages, wh = sys.argv[1], sys.argv[2]
pages_gen.write_pages_fixture(pages, n_extra_hosts=2, seed=42)
spark = get_spark(app_name="pwc-detfirst-e2e", cores=2, shuffle_partitions=4)
eng = CrawlEngine(spark, pages, wh, wave_size=400, per_host_quota=10,
                  method_weights={"oldest": 1})
eng.bootstrap(spark.read.parquet(pages).select("url"))
eng.run(1)

crawled = (
    eng.lake.crawled.read(spark)
    .filter(F.col("route") == "plain_text")
    .select("url", "text")
    .collect()
)
assert crawled, "wave crawled no plain_text rows"
raws = {r["url"]: bytes(r["html"]) for r in spark.read.parquet(pages)
        .select("url", "html").collect()}
bad = []
for r in crawled:
    want = textextract.detect_decode(
        raws[r["url"]], detector_first=True
    )[: config.MAX_WEBCONTENT_SIZE]
    if r["text"] != want:
        bad.append((r["url"], repr(r["text"])[:80], repr(want)[:80]))
assert not bad, bad
print("DETECTOR_FIRST_OK", len(crawled))
spark.stop()
"""


@pytest.mark.detector_first
def test_detector_first_wave_e2e(tmp_path):
    """One full crawl wave with SPARK_GRAFT_DETECTOR_FIRST=1: every
    plain-text row's committed text must equal the detector-first kernel's
    output for that page's raw bytes — including the fixture's invalid-
    UTF-8 latin.txt and sjis.txt bodies, which is where the two ladder
    orders can diverge."""
    env = {
        **os.environ,
        "SPARK_GRAFT_DETECTOR_FIRST": "1",
        "PYTHONPATH": str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT,
         str(tmp_path / "pages.parquet"), str(tmp_path / "wh")],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DETECTOR_FIRST_OK" in proc.stdout, proc.stdout[-500:]
