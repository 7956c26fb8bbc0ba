"""Structured Streaming variant of link ingestion.

The reference is wave-iterated batch (ITERATIONS loop,
playwrightcrawler.py:5384) and so is this engine's main path; streaming is
the continuous-ingest complement: seed/discovered-link files landing in a
folder become frontier rows with the SAME hygiene pipeline, exactly-once
per micro-batch via foreachBatch + the snapshot tables' atomic commit.

Design notes for 10^10 scale:
- `dropDuplicates` within the stream holds only the watermark window of
  keys in state; global dedup stays the frontier anti-join inside
  foreachBatch (state stores can't hold 10^10 keys);
- foreachBatch gives batch-side MERGE semantics (Iceberg MERGE INTO in
  production, SnapshotTable.merge_upsert here) — the standard pattern for
  streaming upserts into a lakehouse table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from playwrightcrawler_spark import config
from playwrightcrawler_spark.functions import sqlfns, udfs
from playwrightcrawler_spark.sources.tables import SnapshotTable, with_host_salt


def streaming_links(spark: SparkSession, folder: str) -> DataFrame:
    """Unbounded link source: text files appearing under ``folder``."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(folder)
        .select(F.trim(F.col("value")).alias("url"))
        .filter((F.col("url") != "") & ~F.col("url").startswith("#"))
    )


def clean_links(links: DataFrame) -> DataFrame:
    """The discovered-link hygiene pipeline, streaming-safe (all stateless
    projections/filters; the pandas UDFs run per micro-batch)."""
    canon = links.withColumn("url", udfs.canonicalize_url(F.col("url")))
    host = sqlfns.host_of(F.col("url"))
    return (
        canon.withColumn("host", host)
        .filter(
            (F.col("url") != "")
            & ~sqlfns.is_embedded(F.col("url"))
            & sqlfns.length_ok(F.col("url"))
            & F.col("host").isNotNull()
            & ~sqlfns.host_block_listed(F.col("host"))
            & sqlfns.host_allow_listed(F.col("host"))
            & ~sqlfns.url_block_listed(F.col("url"))
        )
        .dropDuplicates(["url"])
    )


def start_frontier_ingest(
    spark: SparkSession,
    folder: str,
    frontier: SnapshotTable,
    checkpoint_dir: str,
    trigger_seconds: int = 2,
):
    """links folder → frontier MERGE, one atomic snapshot per micro-batch."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            with_host_salt(batch_df, buckets=config.HOST_SALT_BUCKETS)
            .withColumn("url_hash", sqlfns.url_hash(F.col("url")))
            .withColumn("depth", F.lit(0))
            .withColumn("score", F.lit(1.0))
            .withColumn("visited", F.lit(False))
            .withColumn("discovered_at", F.current_timestamp())
            .withColumn("wave", F.lit(-1))
            .select(
                "url", "url_hash", "host", "host_salt", "depth", "score",
                "visited", "discovered_at", "wave",
            )
        )
        if frontier.exists():
            frontier.merge_upsert(batch_df.sparkSession, rows, key="url_hash",
                                  meta={"stream_batch": batch_id})
        else:
            frontier.write(rows.dropDuplicates(["url_hash"]),
                           meta={"stream_batch": batch_id})

    cleaned = clean_links(streaming_links(spark, folder))
    return (
        cleaned.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


# ---------------------------------------------------------------------------
# Stateful politeness gate (applyInPandasWithState)
# ---------------------------------------------------------------------------

_GATE_OUT_SCHEMA = "url string, host string, emitted_in_batch int"
_GATE_STATE_SCHEMA = "pending array<string>, dropped long"


def start_politeness_gate(
    spark: SparkSession,
    folder: str,
    out_dir: str,
    checkpoint_dir: str,
    quota_per_trigger: int = 1,
    max_pending: int = 1000,
):
    """Streaming per-host politeness: at most ``quota_per_trigger`` URLs
    per host are released per micro-batch; the overflow is CARRIED in
    per-host state (bounded at ``max_pending`` — beyond that the NEWEST
    arrivals are counted in ``dropped``, never silently lost: the queue is
    FIFO, full queue rejects new work) and released by later triggers even
    if no new links arrive for that host. State is REMOVED once a host's
    backlog drains (re-created on its next input), so state size tracks
    hosts with live backlogs, not every host ever seen; the ``dropped``
    counter consequently accounts per backlog episode, not per lifetime.

    This is the reference's per-host asyncio.Lock/serial-fetch semantics
    (downloader.py:256-264) as a custom stateful streaming operator:
    ``groupBy(host).applyInPandasWithState`` keeps one small state row per
    host — the standard Spark pattern for operators the built-in windowed
    aggs can't express. State is per-host and bounded, so 10^8 hosts cost
    O(hosts) state, independent of frontier size."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def gate(key, pdf_iter, state):
        import pandas as pd

        (host,) = key
        pending, dropped = state.get if state.exists else ([], 0)
        pending = list(pending)
        for pdf in pdf_iter:
            pending.extend(pdf["url"].tolist())
        if len(pending) > max_pending:
            dropped += len(pending) - max_pending
            pending = pending[: max_pending]
        release, pending = pending[:quota_per_trigger], pending[quota_per_trigger:]
        if pending:
            state.update((pending, dropped))
            # a processing-time timeout re-invokes this host next trigger
            # even with no new input, so carried URLs always drain
            state.setTimeoutDuration(500)
        elif state.exists:
            # drained: drop the state row — otherwise state grows
            # monotonically with every distinct host ever seen
            state.remove()
        if release:
            yield pd.DataFrame({
                "url": release,
                "host": [host] * len(release),
                "emitted_in_batch": [len(release)] * len(release),
            })

    cleaned = clean_links(streaming_links(spark, folder))
    gated = cleaned.groupBy("host").applyInPandasWithState(
        gate, _GATE_OUT_SCHEMA, _GATE_STATE_SCHEMA,
        "append", GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 seconds")
        .start()
    )
