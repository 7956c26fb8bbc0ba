"""Unit edge cases for the Gopher-style repetition filters
(operators/textstats.py::repetition_stats). Corpus-level parity with the
DuckDB oracle lives in tests/test_oracle_parity.py::repetition_stats;
this file pins the degenerate shapes the fixture corpus cannot produce:
empty text, a single token, an all-one-token doc, and an exact
bigram-loop doc.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from playwrightcrawler_spark.operators.textstats import repetition_stats


@pytest.fixture(scope="module")
def stats(spark):
    docs = spark.createDataFrame(
        [
            (0, ""),                                  # empty: no tokens at all
            (1, "word"),                              # single token, no bigrams
            (2, "spam spam spam spam spam spam"),     # one token repeated
            (3, "buy now buy now buy now buy now"),   # pure 2-gram loop
            (4, "a genuinely varied sentence with distinct words here"),
        ],
        ["doc_id", "text"],
    )
    rows = repetition_stats(docs).orderBy("doc_id").collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_empty_doc(stats):
    r = stats[0]
    assert r["n_tokens"] == 0
    assert r["top_bigram_frac"] == 0.0
    assert r["max_token_run"] == 0
    # ttr guards the 0/0 with greatest(n,1): 0 distinct / 1
    assert r["ttr"] == 0.0


def test_single_token(stats):
    r = stats[1]
    assert r["n_tokens"] == 1
    assert r["top_bigram_frac"] == 0.0  # sequence() guard: no [0,-1] walk
    assert r["max_token_run"] == 1
    assert r["ttr"] == 1.0
    assert r["repetitive"] is False


def test_all_same_token(stats):
    r = stats[2]
    assert r["n_tokens"] == 6
    assert r["max_token_run"] == 6
    assert r["top_bigram_frac"] == 1.0  # "spam spam" is every bigram
    assert r["ttr"] == pytest.approx(1 / 6, abs=1e-6)
    assert r["repetitive"] is True


def test_bigram_loop(stats):
    r = stats[3]
    assert r["n_tokens"] == 8
    assert r["max_token_run"] == 1          # no token repeats consecutively
    # 7 bigrams: "buy now" x4, "now buy" x3
    assert r["top_bigram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert r["repetitive"] is True


def test_varied_doc_not_flagged(stats):
    r = stats[4]
    assert r["ttr"] == 1.0
    assert r["max_token_run"] == 1
    assert r["repetitive"] is False


def test_stratified_sample_deterministic_and_stable(spark, sf_dir):
    from playwrightcrawler_spark.operators.textstats import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"en": 0.6, "fr": 0.3}
    first = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    again = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    assert first == again  # no RNG: identical runs, identical sample

    # per-group rate lands near target (binomial tolerance at n~100-200)
    en_total = docs.filter("lang = 'en'").count()
    en_kept = docs.filter("lang = 'en'").join(
        spark.createDataFrame([(i,) for i in first], ["doc_id"]), "doc_id"
    ).count()
    assert abs(en_kept / en_total - 0.6) < 0.15

    # membership is per-row: dropping OTHER rows never flips a decision
    half = docs.filter("doc_id % 2 = 0")
    half_kept = {r["doc_id"] for r in stratified_sample(half, rates).collect()}
    assert half_kept == {i for i in first if i % 2 == 0}

    # unknown groups fall to default_rate=0.0 → dropped entirely
    none_kept = stratified_sample(
        docs.withColumn("lang", F.lit("xx")), rates
    ).count()
    assert none_kept == 0


def test_unigram_logprob_semantics(spark):
    from playwrightcrawler_spark.operators.textstats import unigram_logprob

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),   # the common vocabulary...
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "qwerty zxcvb unheard rare"),  # ...vs one outlier doc
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r.asDict() for r in unigram_logprob(docs).collect()}
    # outlier vocabulary scores strictly lower (CCNet would cut it)
    assert rows[3]["mean_logprob"] < rows[0]["mean_logprob"]
    assert rows[3]["ppl"] > rows[0]["ppl"]

    uniform = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g h")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r.asDict() for r in unigram_logprob(uniform).collect()}
    # every token unique once => unigram model is uniform over 8 types,
    # so each doc's perplexity IS the vocabulary size
    assert rows[0]["ppl"] == pytest.approx(8.0, abs=1e-6)
    assert rows[1]["ppl"] == pytest.approx(8.0, abs=1e-6)


def test_unigram_logprob_shuffle_join_path(spark, sf_dir):
    """The round-6 verdict's broadcast-ceiling item: at 10^8-10^9 distinct
    tokens the unconditional vocab broadcast would exceed Spark's 8 GB /
    512M-row broadcast cap. ``broadcast_vocab=False`` must (a) produce
    bit-identical results and (b) plan the token join WITHOUT a broadcast
    of the vocabulary side."""
    from playwrightcrawler_spark.operators.textstats import unigram_logprob
    from playwrightcrawler_spark.plans import audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = unigram_logprob(docs).orderBy("doc_id")
    # broadcast_vocab=False removes the FORCED hint — strategy becomes
    # size-based (auto-broadcast under autoBroadcastJoinThreshold,
    # shuffle join over it). Force the threshold to -1 to exercise the
    # over-threshold path the 10^9-row vocabulary would take.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        b = unigram_logprob(docs, broadcast_vocab=False).orderBy("doc_id")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        plan_b = audit.physical_plan(
            unigram_logprob(docs, broadcast_vocab=False)
        )
        assert "SortMergeJoin" in plan_b or "ShuffledHashJoin" in plan_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
