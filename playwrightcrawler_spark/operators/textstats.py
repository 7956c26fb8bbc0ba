"""Text analytics for a training-data pipeline: language ID, quality
scoring, token counting, fingerprinting. All pure SQL (portable to the
DuckDB oracle verbatim) — the point at 100 TB is that none of this leaves
codegen or shuffles more than one agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from playwrightcrawler_spark.operators.dedup import tokens_col

# Tiny, fixed stopword anchors per language — a deterministic n-gram/stopword
# heuristic (not a model): hit ratios decide. Good enough to exercise the
# operator shape; swap lists for fastText-style profiles in production.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "this"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "mit", "für", "nicht"],
    "es": ["el", "la", "los", "las", "y", "de", "un", "una", "es", "para"],
}


def _hits(toks, words: list[str]):
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, t)))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predicted language by stopword-hit ratio; CJK detected by codepoint
    share. Deterministic ties broken by fixed language order."""
    toks = tokens_col(F.col(text_col))
    total = F.greatest(F.size(toks), F.lit(1))
    ratios = {
        lang: _hits(toks, words).cast("double") / total
        for lang, words in STOPWORDS.items()
    }
    cjk = (
        F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")).cast("double")
        / F.greatest(F.length(F.col(text_col)), F.lit(1))
    )
    df2 = df.select(id_col, *[F.round(ratios[l], 6).alias(f"ratio_{l}") for l in STOPWORDS],
                    F.round(cjk, 6).alias("ratio_cjk"))
    best = F.greatest(*[F.col(f"ratio_{l}") for l in STOPWORDS])
    pred = F.when(F.col("ratio_cjk") > 0.05, "zh")
    for lang in STOPWORDS:  # fixed order => deterministic tie-break
        pred = pred.when((F.col(f"ratio_{lang}") == best) & (best > 0), lang)
    return df2.withColumn("pred_lang", pred.otherwise("unknown"))


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / mean-word-length / stopword-density features +
    a composite keep/drop flag (the C4-style cheap filter)."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_tokens,
    ).otherwise(0.0)
    punct_ratio = (
        F.length(F.regexp_replace(text, r"[^.!?,;:]", "")).cast("double")
        / F.greatest(n_chars, F.lit(1))
    )
    stop_ratio = (
        _hits(toks, STOPWORDS["en"]).cast("double") / F.greatest(n_tokens, F.lit(1))
    )
    keep = (
        (n_chars >= 100)
        & (n_tokens >= 20)
        & (mean_word_len >= 2.0) & (mean_word_len <= 12.0)
        & (punct_ratio <= 0.2)
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        keep.alias("keep"),
    )


def token_counts(df: DataFrame, text_col: str = "text", group_col: str = "lang") -> DataFrame:
    """Corpus token accounting per group: whitespace tokens and BPE-ish
    subword estimate (4 chars/token heuristic) — the budget numbers a
    training pipeline actually tracks."""
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe_est = F.ceil(F.length(F.col(text_col)).cast("double") / 4.0)
    return (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("docs"),
            F.sum(ws_tokens).cast("long").alias("ws_tokens"),
            F.sum(bpe_est).cast("long").alias("bpe_tokens_est"),
        )
        .orderBy(group_col)
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Canonical content fingerprint of whitespace-collapsed lowercase text
    — the join key for cross-snapshot dedup. xxhash64 in production; md5
    under oracle mode (DuckDB-portable)."""
    from playwrightcrawler_spark.operators.dedup import content_fingerprint

    return df.select(
        id_col,
        content_fingerprint(F.col(text_col), hash_mode).alias("fingerprint"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group sampling — the data-mixing step of a
    training pipeline (e.g. up/down-weighting languages or sources to
    target token ratios), made REPRODUCIBLE: selection hashes the stable
    ``id_col`` (md5 prefix as a uniform draw in [0,1)) instead of using
    an RNG, so the same corpus always yields the same sample, any
    engine can recompute membership (the DuckDB oracle does), and adding
    or removing other rows never flips a decision — properties
    ``df.sampleBy`` cannot give across engines or runs.

    Scale shape: a pure per-row filter — no shuffle, no RNG state,
    folded into the scan by codegen; group rates compile to one CASE
    chain."""
    draw = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )
    rate = F.lit(default_rate)
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return df.filter(draw < rate)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Model-based quality proxy (CCNet, Wenzek et al. 2020, which ranks
    documents by LM perplexity): score each document by the mean log
    probability of its tokens under the corpus's own unigram
    distribution, plus ``ppl`` = exp(-mean) — the perplexity of the
    unigram model on the doc. Outlier-vocabulary documents (gibberish,
    boilerplate in the wrong language) score low without any external
    model artifact.

    Scale shape: the unigram table is vocabulary-sized (millions of rows
    at web scale, built by one explode + map-side-combinable groupBy over
    the corpus) and — by default — BROADCAST back, so the corpus is
    exploded exactly twice and its rows never shuffle on the token key;
    the per-doc mean is the single doc-keyed shuffle. The corpus total
    rides the same broadcast (window-free ``sum over ()``), keeping the
    whole pipeline two jobs with no driver-side collection.

    ``broadcast_vocab``: the broadcast assumes a vocabulary that fits
    executor/driver memory (fine into the tens of millions of rows).
    On a typo/noise-heavy open-web corpus the distinct-token table can
    reach 10^8-10^9 rows — past Spark's 8 GB / 512M-row broadcast cap —
    so callers at that shape pass ``False``: the join then shuffles on
    the token key (both sides hash-partitioned; the exploded corpus
    pays one extra exchange, which is the correct trade when the
    alternative is an executor OOM). Results are identical either way
    (pinned in tests/test_textstats.py)."""
    toks = tokens_col(F.col(text_col))
    exploded = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    freq = exploded.groupBy("tok").agg(F.count("*").alias("tok_n"))
    # total corpus tokens attached without a driver round-trip: an
    # unpartitioned window sum over the (small) vocabulary table
    from pyspark.sql import Window

    freq = freq.withColumn("_total", F.sum("tok_n").over(Window.partitionBy()))
    freq = freq.withColumn(
        "logp", F.log(F.col("tok_n").cast("double") / F.col("_total"))
    ).select("tok", "logp")
    return (
        exploded.join(F.broadcast(freq) if broadcast_vocab else freq, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("mean_logprob"),
            F.round(F.exp(-F.avg("logp")), 6).alias("ppl"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_bigram_max: float = 0.08,
    max_run_max: int = 3,
    ttr_min: float = 0.35,
    min_tokens: int = 20,
) -> DataFrame:
    """Gopher-style repetition features per document (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters, adapted to word
    n-grams because the corpus is single-line):

    - ``top_bigram_frac``: share of the most frequent word 2-gram among
      all 2-grams — catches boilerplate/template loops.
    - ``max_token_run``: longest run of one token repeated consecutively
      (gaps-and-islands over token positions).
    - ``ttr``: type-token ratio (distinct/total tokens) — low values mean
      the doc recycles a tiny vocabulary.
    - ``repetitive``: composite drop flag on the three thresholds.

    Scale shape: everything is keyed by ``id_col`` — one explode +
    two-level agg for the bigram mode (map-side combinable; the
    (doc, bigram) group count is bounded by the doc's own length), one
    window (single shuffle+sort on doc id, both window functions share
    the frame) for runs, and the final joins co-partition on the same
    key. No driver-side collection, no UDFs; everything stays in
    codegen/Exchange-on-doc_id, so the operator holds at 10^10 docs."""
    from pyspark.sql import Window

    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col).alias(id_col), toks.alias("toks"))

    feats = base.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )

    # Most-frequent-2-gram share. sequence(0, -1) would step DOWNWARD in
    # Spark SQL, so short docs are guarded to an empty array explicitly.
    bigrams = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "  transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1])) "
        "ELSE CAST(array() AS array<string>) END"
    )
    bigram_stats = (
        base.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top_c"), F.sum("count").alias("_tot"))
    )

    # Longest same-token run: change-flag via lag, island id via running
    # sum, then max island size per doc.
    w = Window.partitionBy(id_col).orderBy("pos")
    run_stats = (
        base.select(F.col(id_col), F.posexplode("toks").alias("pos", "tok"))
        .withColumn(
            "_chg",
            F.when(F.lag("tok").over(w).eqNullSafe(F.col("tok")), F.lit(0)).otherwise(F.lit(1)),
        )
        .withColumn(
            "_island",
            F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy(id_col, "_island")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_max_run"))
    )

    out = (
        feats.join(bigram_stats, id_col, "left")
        .join(run_stats, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.col("n_distinct").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)), 6
            ).alias("ttr"),
            F.round(
                F.coalesce(F.col("_top_c").cast("double") / F.col("_tot"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
            F.coalesce(F.col("_max_run"), F.lit(0)).alias("max_token_run"),
        )
    )
    # The bigram criterion is meaningful only past a minimum length: a
    # short all-unique doc still has top_bigram_frac = 1/(n-1), which
    # would false-positive every tweet-sized document. Runs and TTR stay
    # ungated — a low TTR or a long run in a tiny doc IS repetition.
    return out.withColumn(
        "repetitive",
        ((F.col("n_tokens") >= min_tokens) & (F.col("top_bigram_frac") >= top_bigram_max))
        | (F.col("max_token_run") > max_run_max)
        | (F.col("ttr") <= ttr_min),
    )
