"""Event-time tumbling-window rollup — ONE transformation that runs in
both batch and streaming mode (the core Structured Streaming promise:
the same declarative plan, incrementalized when the source is a stream).

Batch mode is the DuckDB-oracled query ``events_windowed``; streaming
mode adds a watermark so late data inside the bound still lands in its
window while data later than the bound is dropped and state is released
(tests/test_streaming_and_sources.py pins both behaviors).

Scale shape: ``groupBy(window, key)`` is one shuffle with map-side
partial aggregation; streaming state is one row per open (window, key),
bounded by the watermark horizon — at 1000 executors the state store
shards on the same grouping key, so neither mode has a driver-side or
all-pairs component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "6 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time counts + value sums per ``key_col``.

    Pass ``watermark`` (e.g. ``"10 minutes"``) on a streaming frame to
    bound lateness/state; leave it ``None`` for batch. Windows align to
    the epoch (Spark's default), which for day-dividing widths matches
    DuckDB ``time_bucket`` — the oracle relies on that.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "events",
            "total_value",
        )
    )
