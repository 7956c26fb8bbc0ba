"""Maintenance pass — the reference's cleanup_elasticsearch_indexes
(M1, playwrightcrawler.py:3557-3730) as one row-level DELETE.

The reference walks both indices with search_after and issues batched
delete_by_query per rule; here it's a single predicate — Catalyst fuses
all rules into one scan, and per-rule counters (A5) come from one
aggregation over the complement instead of imperative tallies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from playwrightcrawler_spark import config
from playwrightcrawler_spark.functions import sqlfns, udfs


def classify_cleanup(
    df: DataFrame,
    remove_repeated: bool = config.REMOVE_REPEATED_SEGMENTS,
    remove_empty_ctype: bool = config.REMOVE_EMPTY_CTYPE,
    remove_blocked_hosts: bool = config.REMOVE_BLOCKED_HOSTS,
    remove_blocked_urls: bool = config.REMOVE_BLOCKED_URLS,
    remove_invalid: bool = config.REMOVE_INVALID_URLS,
) -> DataFrame:
    """Adds ``drop_reason`` (NULL = keep). Rule order mirrors the reference
    so per-rule counts are comparable. Early exit when no rule is enabled
    happens naturally: the when-chain constant-folds to NULL."""
    reason = F.lit(None).cast("string")
    checks = []
    if remove_repeated:
        checks.append((
            sqlfns.repeated_segments_prefilter(F.col("url"))
            & udfs.has_repeated_segments(F.col("url")),
            "repeated_segments",
        ))
    if remove_empty_ctype and "content_type" in df.columns:
        visited = F.col("visited") if "visited" in df.columns else F.lit(False)
        checks.append(((F.col("content_type") == "") & ~visited, "empty_ctype"))
    if remove_blocked_hosts and "host" in df.columns:
        checks.append((sqlfns.host_block_listed(F.col("host")), "blocked_host"))
    if remove_blocked_urls:
        checks.append((sqlfns.url_block_listed(F.col("url")), "blocked_url"))
    if remove_invalid:
        checks.append((
            (udfs.canonicalize_url(F.col("url")) != F.col("url"))
            | (F.coalesce(F.try_parse_url(F.col("url"), F.lit("PROTOCOL")), F.lit("")) == ""),
            "invalid_url",
        ))
    expr = None
    for cond, name in checks:
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("drop_reason", expr if expr is not None else reason)


def cleanup(df: DataFrame, **flags) -> tuple[DataFrame, DataFrame]:
    """(kept_rows, per-rule counts) — counts are the A5 stats analogue."""
    classified = classify_cleanup(df, **flags)
    stats = (
        classified.filter(F.col("drop_reason").isNotNull())
        .groupBy("drop_reason")
        .agg(F.count("*").alias("deleted"))
    )
    return classified.filter(F.col("drop_reason").isNull()).drop("drop_reason"), stats
