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


def test_winnowing_guarantee(spark):
    """Schleimer et al. §2: two docs sharing a span of >= w + k - 1
    tokens (here 4 + 3 - 1 = 6) MUST share at least one fingerprint."""
    from playwrightcrawler_spark.operators.dedup import winnowing_fingerprints

    span = "one two three four five six"
    docs = spark.createDataFrame(
        [
            (0, f"left padding words then {span} and a tail here"),
            (1, f"completely different head {span} different ending too"),
            (2, "no overlap with anything else in this tiny corpus at all"),
            (3, "ab"),  # shorter than k tokens: no grams, no fingerprints
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared 6-token span must share a fingerprint"
    assert not (by_doc[2] & (by_doc[0] | by_doc[1]))
    assert 3 not in by_doc
    # density: winnowing keeps far fewer than all grams but at least one
    # per w-window — for n grams that is between n/w-ish and n
    n_grams_doc0 = 9 - 3 + 1  # 9 tokens
    assert 1 <= len(by_doc[0]) < n_grams_doc0


def test_winnowing_rightmost_tiebreak(spark):
    """An all-identical-token doc has ONE distinct gram hash everywhere;
    rightmost-min tie-break must pick the LAST position of each window,
    so selections are the window-end positions, deduped."""
    from playwrightcrawler_spark.operators.dedup import winnowing_fingerprints

    docs = spark.createDataFrame([(0, "x x x x x x x x")], ["doc_id", "text"])
    rows = winnowing_fingerprints(docs, k=3, w=4).collect()
    # 6 grams, windows start at pos 1..3, each selecting its rightmost
    # (pos 4, 5, 6) — all same hash, three distinct positions
    assert sorted(r["pos"] for r in rows) == [4, 5, 6]
    assert len({r["fp"] for r in rows}) == 1


def test_winnowing_overlap_pairs(spark):
    from playwrightcrawler_spark.operators.dedup import winnowing_overlap_pairs

    span = "shared verbatim span of many tokens runs through here nicely"
    docs = spark.createDataFrame(
        [
            (0, f"doc zero head {span} doc zero tail words"),
            (1, f"doc one other head {span} and another ending"),
            (2, "unrelated content that overlaps with nothing at all today"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in winnowing_overlap_pairs(docs, min_shared=2).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(2 not in p for p in pairs)


def test_winnowing_overlap_max_df_drops_boilerplate(spark):
    """A fingerprint present in EVERY doc (boilerplate) must be excluded
    by the document-frequency cap, leaving no candidate pairs."""
    from playwrightcrawler_spark.operators.dedup import winnowing_overlap_pairs

    boiler = "all rights reserved click here to subscribe now please"
    docs = spark.createDataFrame(
        [(i, f"unique{i} words{i} only{i} here{i} {boiler}") for i in range(6)],
        ["doc_id", "text"],
    )
    pairs = winnowing_overlap_pairs(docs, min_shared=1, max_df=3).collect()
    assert pairs == []


def test_decontaminate_broadcasts_benchmark(frames):
    docs, bench = frames
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    # the eval-set gram side must ride a broadcast, never shuffle the corpus
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_winnowing_max_df_drop_count_surfaced(spark, sf_dir):
    """Round-6 verdict #4: the max_df cap's discarded-fingerprint count —
    the recall knob at scale — must be readable, not silent. Rides the
    document-frequency aggregate as an observed metric (no extra job)."""
    from pyspark.sql import Observation

    from playwrightcrawler_spark.operators import dedup

    docs = _docs_with_copies_local(spark, sf_dir)

    # fixture shape at the production cap: nothing is ubiquitous enough
    # to drop — pinned so a corpus/codegen change that starts dropping
    # shows up here
    obs = Observation()
    dedup.winnowing_overlap_pairs(
        docs, k=3, w=4, min_shared=2, max_df=20, hash_mode="md5",
        observation=obs,
    ).count()
    got = obs.get
    assert got["dropped_fps"] == 0
    assert got["distinct_fps"] > 0

    # forced-tiny cap: drops must be counted and pairs still correct
    obs2 = Observation()
    pairs = dedup.winnowing_overlap_pairs(
        docs, k=3, w=4, min_shared=2, max_df=2, hash_mode="md5",
        observation=obs2,
    )
    n_pairs = pairs.count()
    got2 = obs2.get
    assert got2["dropped_fps"] > 0
    assert got2["dropped_fps"] + 1 <= got2["distinct_fps"]
    # every surviving pair respects the cap: no fp shared by > max_df docs
    assert n_pairs >= 0


def _docs_with_copies_local(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    both = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return both.filter((F.col("doc_id") % 1_000_000) < 100)
