"""Unit edge cases for operators/dedup.py::decontaminate (corpus-level
parity with the DuckDB oracle lives in test_oracle_parity.py). Pins the
crafted shapes the fixture can't produce and the broadcast plan contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from playwrightcrawler_spark.operators.dedup import decontaminate

BENCH_SPAN = "alpha beta gamma delta epsilon"


@pytest.fixture(scope="module")
def frames(spark):
    bench = spark.createDataFrame(
        [(100, f"question {BENCH_SPAN} answer zeta")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            (0, f"some leaked text {BENCH_SPAN} inside a training doc"),
            (1, "a perfectly clean document about something else entirely"),
            (2, "tiny doc"),                       # < n tokens: zero n-grams
            (3, f"{BENCH_SPAN} {BENCH_SPAN}"),     # span twice, distinct grams once
        ],
        ["doc_id", "text"],
    )
    return docs, bench


def test_decontaminate_flags(frames):
    docs, bench = frames
    rows = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(docs, bench, n=5).collect()
    }
    assert rows[0]["contaminated"] is True and rows[0]["n_overlap"] >= 1
    assert rows[1]["contaminated"] is False and rows[1]["n_overlap"] == 0
    assert rows[2]["n_ngrams"] == 0 and rows[2]["contaminated"] is False
    assert rows[3]["contaminated"] is True
    # every input doc comes back exactly once (left join, no drops)
    assert set(rows) == {0, 1, 2, 3}


def test_decontaminate_min_hits(frames):
    docs, bench = frames
    rows = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, bench, n=5, min_hits=10).collect()
    }
    assert rows[0] is False  # one shared span < 10 hits


def test_decontaminate_broadcasts_benchmark(frames):
    docs, bench = frames
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    # the eval-set gram side must ride a broadcast, never shuffle the corpus
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
