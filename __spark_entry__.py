"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship pipeline over /root/testdata/sf0.001 — the
  training-data triage query (quality × language × dedup fingerprint,
  aggregated per language).
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 (see playwrightcrawler_spark/queries.py for the mapping).
- ``oracle_sql()``: DuckDB equivalents with identical column names/types
  (playwrightcrawler_spark/oracles.py). Entries absent from the oracle map
  are non-SQL-expressible (pandas-UDF / engine paths) → rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-language corpus triage — quality-filter + fingerprint
    dedup + token budget in one pipeline (all pure SQL, one shuffle per
    agg; the shape that scales to 100 TB)."""
    from playwrightcrawler_spark.operators import dedup, textstats

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    quality = textstats.quality_scores(docs)
    langs = textstats.lang_id(docs).select("doc_id", "pred_lang")
    deduped = dedup.exact_dedup(docs).select("doc_id")
    tokens = textstats.token_counts(docs.join(deduped, "doc_id"), group_col="lang")
    triage = (
        docs.select("doc_id", "lang")
        .join(quality.select("doc_id", "keep", "n_tokens"), "doc_id")
        .join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("keep").cast("long")).alias("kept_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("tokens"),
            F.sum((F.col("pred_lang") == F.col("lang")).cast("long")).alias("langid_agree"),
        )
    )
    return triage.join(tokens.select("lang", "bpe_tokens_est"), "lang").orderBy("lang")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from playwrightcrawler_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from playwrightcrawler_spark.oracles import ORACLES
    from playwrightcrawler_spark.queries import _fixture_pages

    # crawl-domain oracles read the pages fixture parquet via DuckDB
    # read_parquet — make sure it exists even if the oracle runs first
    # (generation is pure pyarrow, no Spark session needed)
    _fixture_pages(None)
    return dict(ORACLES)
