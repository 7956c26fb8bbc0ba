"""Randomized equivalence pins for the round-6 text/dedup operators.

Pattern (same as the fast-scanner equivalence suites): an INDEPENDENT
pure-Python reference implementation of each algorithm, a seeded random
corpus covering edge lengths, ONE Spark job over the whole corpus, and
exact set/row comparison. A hypothesis fuzz additionally proves the
winnowing guarantee on the reference implementation itself, so the two
tests together pin Spark ≡ reference ≡ the published property.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

K, W = 3, 4

_WORDS = ["alpha", "beta", "gamma", "delta", "run", "x9", "loop", "q", "zz7", "mid"]


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, str]]:
    """Independent winnowing: k-gram md5-prefix hashes, w-window minimum
    with RIGHTMOST tie-break, clipped final windows for short docs."""
    toks = _tokens(text)
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hashes = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
    n = len(hashes)
    out = set()
    for start in range(max(n - w + 1, 1)):
        frame = hashes[start : start + w]
        m = min(frame)
        # rightmost occurrence of the min within the frame
        pos_in_frame = max(i for i, h in enumerate(frame) if h == m)
        out.add((start + pos_in_frame + 1, m))  # 1-based gram position
    return out


def _py_repetition(text: str) -> tuple[int, float, int, float]:
    """(n_tokens, ttr, max_run, top_bigram_frac) rounded like the op."""
    toks = _tokens(text)
    n = len(toks)
    ttr = round(len(set(toks)) / max(n, 1), 6)
    max_run = 0
    run = 0
    prev = object()
    for t in toks:
        run = run + 1 if t == prev else 1
        prev = t
        max_run = max(max_run, run)
    bigrams = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)] if n >= 2 else []
    if bigrams:
        top = max(map(bigrams.count, set(bigrams)))
        frac = round(top / len(bigrams), 6)
    else:
        frac = 0.0
    return n, ttr, max_run, frac


def _random_corpus(seed: int = 42, n_docs: int = 40) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        # lengths 0..24 tokens, small vocab => natural repeats and ties
        length = rng.choice([0, 1, 2, 3, 4, 5, 8, 12, 16, 24])
        docs.append((i, " ".join(rng.choice(_WORDS) for _ in range(length))))
    return docs


def test_winnowing_matches_python_reference(spark):
    from playwrightcrawler_spark.operators.dedup import winnowing_fingerprints

    corpus = _random_corpus()
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got: dict[int, set] = {}
    for r in winnowing_fingerprints(df, k=K, w=W, hash_mode="md5").collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, text in corpus:
        assert got.get(doc_id, set()) == _py_winnow(text), f"doc {doc_id}: {text!r}"


def test_repetition_stats_match_python_reference(spark):
    from playwrightcrawler_spark.operators.textstats import repetition_stats

    corpus = _random_corpus(seed=7)
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for doc_id, text in corpus:
        n, ttr, max_run, frac = _py_repetition(text)
        r = rows[doc_id]
        assert r["n_tokens"] == n
        assert r["ttr"] == pytest.approx(ttr, abs=1e-6)
        assert r["max_token_run"] == max_run
        assert r["top_bigram_frac"] == pytest.approx(frac, abs=1e-6)


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=200, deadline=None)
@given(
    left=st.lists(st.sampled_from(_WORDS), max_size=12),
    right=st.lists(st.sampled_from(_WORDS), max_size=12),
    span=st.lists(st.sampled_from(_WORDS), min_size=W + K - 1, max_size=W + K + 4),
    tail_a=st.lists(st.sampled_from(_WORDS), max_size=6),
    tail_b=st.lists(st.sampled_from(_WORDS), max_size=6),
)
def test_winnowing_guarantee_fuzz(left, right, span, tail_a, tail_b):
    """Schleimer et al. guarantee on the reference implementation: any
    two docs sharing a token span of length >= w + k - 1 share at least
    one fingerprint HASH (positions may differ)."""
    doc_a = " ".join(left + span + tail_a)
    doc_b = " ".join(right + span + tail_b)
    fps_a = {h for _, h in _py_winnow(doc_a)}
    fps_b = {h for _, h in _py_winnow(doc_b)}
    assert fps_a & fps_b
