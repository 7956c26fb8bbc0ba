"""Partitioned Bloom seen-set tests (north_rule): exactness vs the plain
anti-join, zero false negatives, useful fpp, and the scale-shaped plan
(no shuffle of the big side)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from playwrightcrawler_spark.operators import seen


@pytest.fixture(scope="module")
def seen_data(spark):
    """'frontier' of 20k hashes and 5k candidates, half overlapping."""
    frontier = (
        spark.range(20_000)
        .select(
            F.xxhash64(F.concat(F.lit("seen:"), F.col("id"))).alias("url_hash"),
        )
        .withColumn("host_salt", F.pmod(F.col("url_hash"), F.lit(64)).cast("int"))
    )
    candidates = (
        spark.range(5_000)
        .select(
            F.when(
                F.col("id") % 2 == 0,
                F.xxhash64(F.concat(F.lit("seen:"), F.col("id"))),  # dup of frontier
            )
            .otherwise(F.xxhash64(F.concat(F.lit("new:"), F.col("id"))))
            .alias("url_hash"),
            F.col("id").alias("cand_id"),
        )
        .withColumn("host_salt", F.pmod(F.col("url_hash"), F.lit(64)).cast("int"))
    )
    blooms = seen.build_blooms(frontier, expected_items_per_bucket=400).cache()
    blooms.count()
    return frontier, candidates, blooms


def test_bloom_no_false_negatives(spark, seen_data):
    """Every frontier member must test maybe_seen=True."""
    frontier, _, blooms = seen_data
    flagged = frontier.withColumn("m", seen.maybe_seen_col(spark, blooms))
    assert flagged.filter(~F.col("m")).count() == 0


def test_bloom_fpp_useful(spark, seen_data):
    """Genuinely-new candidates should mostly test negative (fpp ~1%)."""
    frontier, candidates, blooms = seen_data
    new_only = candidates.join(frontier.select("url_hash"), "url_hash", "left_anti")
    n = new_only.count()
    fp = new_only.withColumn("m", seen.maybe_seen_col(spark, blooms)).filter("m").count()
    assert fp / n < 0.05, (fp, n)


def test_anti_join_seen_exact(spark, seen_data):
    """Bloom path ≡ plain anti-join, row for row."""
    frontier, candidates, blooms = seen_data
    exact = seen.anti_join_seen(candidates, frontier, spark, blooms=None)
    bloomed = seen.anti_join_seen(candidates, frontier, spark, blooms=blooms)
    a = {r.cand_id for r in exact.select("cand_id").collect()}
    b = {r.cand_id for r in bloomed.select("cand_id").collect()}
    assert a == b and len(a) > 0


def test_bloom_plan_never_shuffles_frontier(spark, seen_data):
    """The 10^10-row side appears only under broadcast joins: the bloomed
    plan must contain no SortMergeJoin and no ShuffledHashJoin."""
    frontier, candidates, blooms = seen_data
    plan = seen.anti_join_seen(
        candidates, frontier, spark, blooms=blooms
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_merge_blooms_is_union(spark):
    a_df = spark.createDataFrame(
        [(h, 0) for h in range(100)], "id long, z int"
    ).select(
        F.xxhash64(F.concat(F.lit("a:"), F.col("id"))).alias("url_hash")
    ).withColumn("host_salt", F.pmod(F.col("url_hash"), F.lit(8)).cast("int"))
    b_df = spark.createDataFrame(
        [(h, 0) for h in range(100)], "id long, z int"
    ).select(
        F.xxhash64(F.concat(F.lit("b:"), F.col("id"))).alias("url_hash")
    ).withColumn("host_salt", F.pmod(F.col("url_hash"), F.lit(8)).cast("int"))
    ba = seen.build_blooms(a_df, expected_items_per_bucket=50)
    bb = seen.build_blooms(b_df, expected_items_per_bucket=50)
    merged = seen.merge_blooms(ba, bb)
    both = a_df.unionByName(b_df).withColumn(
        "m", seen.maybe_seen_col(spark, merged)
    )
    assert both.filter(~F.col("m")).count() == 0
    assert merged.count() <= 8


def test_probe_determinism():
    h = np.array([1, -5, 2**62, -(2**62)], dtype=np.int64)
    runs = [
        [p.tolist() for p in seen._probe_positions(h, 1024, 4)] for _ in range(2)
    ]
    assert runs[0] == runs[1]
    m, k = seen.bloom_params(10_000, 0.01)
    assert m % 8 == 0 and 1 <= k <= 16
