"""As-of join (point-in-time join): match each left row to the most
recent right row with ``right.ts <= left.ts`` per key — the lookup every
feature store / market-data / snapshot-enrichment pipeline needs and
Spark lacks as a built-in.

Implementation is the scalable merge-scan composition, NOT a range
join: tag and union both inputs, sort each key's timeline once, carry
the latest right-side values forward with ``last(..., ignorenulls)``
over an unbounded-preceding window, then keep the left rows. One
shuffle (the window sort on the key), linear in rows — a naive
``left.ts >= right.ts`` range join is O(left x right) per key and
unusable at 100 TB. Ties (equal timestamps) match inclusively: the
right row sorts before the left row at the same instant (secondary
sort on the tag), mirroring DuckDB/QuestDB ASOF semantics — the DuckDB
native ``ASOF JOIN`` is the oracle.

Skew: each key's timeline serializes into one window task — the known
limit of any per-key ordered computation (pinned under a 95%-of-rows
mega-key in tests/test_skew.py). At 100× scale, mitigate a pathological
key by time-bucketing: run the same composition per (key, time_bucket)
with the previous bucket's final carried values unioned in as seed rows,
which caps any task at one bucket of one key; AQE skew handling also
splits the oversized sort-shuffle partitions the mega-key creates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows enriched with the latest right-side ``value_cols`` at or
    before each left timestamp (null when no right row precedes).

    Right rows are expected to be unique per (key, ts): with duplicate
    right timestamps on one key the carried value is whichever sorts
    last under the window's (ts, side) order — unspecified, exactly as
    in DuckDB/QuestDB ASOF. Dedup the right side per (key, ts) first
    (e.g. keep max(value)) when inputs can carry such ties."""
    value_cols = value_cols or [c for c in right.columns if c not in (key_col, ts_col)]
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        key_col,
        ts_col,
        *[F.col(c) for c in value_cols],
    ).withColumn("_side", F.lit(0))
    # align schemas: left keeps its own columns, right-side values are
    # null on left rows (and vice versa) so last(ignorenulls) carries
    carried = [f"{c}{suffix}" for c in value_cols] + [f"{ts_col}{suffix}"]
    lhs = lhs.select(
        "*",
        *[F.lit(None).cast(rhs.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(None).cast(rhs.schema[ts_col].dataType).alias(f"{ts_col}{suffix}"),
    )
    rhs = rhs.select(
        *[F.lit(None).cast(lhs.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key_col, ts_col)],
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    ).select(*lhs.columns)
    unioned = lhs.unionByName(rhs)
    # right rows (side 0) sort before left rows at equal ts => inclusive
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col("_side") == 1).drop("_side")
