"""Gap-based sessionization — Spark's native ``session_window`` grouping
(usable unchanged in batch and Structured Streaming), oracled by an
independent DuckDB gaps-and-islands recomputation.

Semantics (pinned by the boundary unit test AND the oracle): a session
extends ``gap`` past its last event INCLUSIVE — an event at exactly
``prev_ts + gap`` still merges; new-session iff ``ts - prev_ts > gap``
(strictly greater).

Scale shape: one shuffle on the session key with map-side partial
aggregation (Spark merges session windows inside the aggregate, no
window-function sort needed); in streaming mode the same expression is
watermark-bounded state, one row per open session per key.

Skew: map-side partial merging collapses a mega-key's events into few
open sessions per partition BEFORE the shuffle, so a 95%-of-rows hot
key (pinned in tests/test_skew.py) shuffles merged session stubs, not
raw events; the residual final-merge skew is one row per partial
session and AQE skew handling covers the aggregate's exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "6 hours",
) -> DataFrame:
    """Per-key sessions: start/end (end = last event + ``gap``), event
    count and value sum."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
