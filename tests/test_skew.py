"""Skew pins for the per-key window/aggregation operators (round-6
verdict #5): one mega-key owning ~95% of all rows must still produce
correct results. These operators serialize per key by construction
(asof: one window sort per key; sessionize: one merged session aggregate
per key) — the pin here is correctness under skew at test scale; the
100×-scale mitigations are documented in the operator docstrings
(time-bucketed pre-aggregation, AQE skew handling on the sort shuffle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_HOT = 19_000   # mega-key rows (~95%)
N_COLD = 1_000   # spread over 50 keys


@pytest.fixture(scope="module")
def skewed_events(spark):
    hot = spark.range(N_HOT).select(
        F.lit("whale").alias("user_id"),
        (F.lit(1_600_000_000) + F.col("id") * 60).cast("timestamp").alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
        F.col("id").alias("seq"),
    )
    cold = spark.range(N_COLD).select(
        F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("user_id"),
        (F.lit(1_600_000_000) + F.col("id") * 3600).cast("timestamp").alias("ts"),
        F.lit(1.0).alias("value"),
        F.col("id").alias("seq"),
    )
    return hot.unionByName(cold)


def test_asof_join_mega_key(spark, skewed_events):
    from playwrightcrawler_spark.operators.asof import asof_join

    ev = skewed_events
    # clicks: every 10th event; signups: every 100th — on the SAME skewed
    # timeline, so the whale key dominates both sides of the union
    clicks = ev.filter(F.col("seq") % 10 == 0).select("user_id", "ts", "seq")
    signups = ev.filter(F.col("seq") % 100 == 0).select("user_id", "ts", "value")
    out = asof_join(clicks, signups, key_col="user_id", ts_col="ts",
                    value_cols=["value"]).cache()
    try:
        assert out.count() == clicks.count()
        # every whale click at seq s matches the signup at floor(s/100)*100
        # (signup ts <= click ts, latest) — check an exact slice
        rows = {
            r["seq"]: r
            for r in out.filter(
                (F.col("user_id") == "whale") & (F.col("seq").isin(0, 990, 9990))
            ).collect()
        }
        for s in (0, 990, 9990):
            expect_signup_seq = (s // 100) * 100
            got = rows[s]["ts_asof"].timestamp()
            assert got == 1_600_000_000 + expect_signup_seq * 60
        # no whale row lost, no cold-key contamination
        assert out.filter(F.col("user_id") == "whale").count() == N_HOT // 10
    finally:
        out.unpersist()


def test_sessionize_mega_key(spark, skewed_events):
    from playwrightcrawler_spark.operators.sessions import sessionize

    # whale events are 60s apart -> ONE session spanning the whole
    # timeline with a 6h gap; cold keys get their own sessions
    out = sessionize(skewed_events, gap="6 hours").cache()
    try:
        whale = out.filter(F.col("user_id") == "whale").collect()
        assert len(whale) == 1
        assert whale[0]["n_events"] == N_HOT
        assert out.filter(F.col("user_id") != "whale").count() > 0
    finally:
        out.unpersist()
