"""Unit semantics for operators/asof.py (corpus parity with DuckDB's
native ASOF JOIN lives in test_oracle_parity.py::asof_join)."""

from __future__ import annotations

import datetime as dt

from playwrightcrawler_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(0)),    # before any right row -> null match
            (1, 101, _ts(10)),   # exactly at right ts 10 -> inclusive match
            (1, 102, _ts(25)),   # between 20 and 30 -> matches 20
            (2, 200, _ts(5)),    # key with no right rows at all
        ],
        ["user_id", "event_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 1.0),
            (1, _ts(20), 2.0),
            (1, _ts(30), 4.0),
        ],
        ["user_id", "ts", "value"],
    )
    rows = {
        r["event_id"]: (r["ts_asof"], r["value_asof"])
        for r in asof_join(left, right).collect()
    }
    assert rows[100] == (None, None)
    assert rows[101] == (_ts(10), 1.0)   # equal timestamps match (>=)
    assert rows[102] == (_ts(20), 2.0)   # latest preceding, not the next
    assert rows[200] == (None, None)
    assert set(rows) == {100, 101, 102, 200}  # left rows preserved 1:1


def test_asof_multiple_value_columns(spark):
    left = spark.createDataFrame([(1, 1, _ts(15))], ["user_id", "event_id", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(10), 7.0, "snap-a"), (1, _ts(14), 9.0, "snap-b")],
        ["user_id", "ts", "value", "label"],
    )
    r = asof_join(left, right, value_cols=["value", "label"]).collect()[0]
    assert (r["value_asof"], r["label_asof"], r["ts_asof"]) == (9.0, "snap-b", _ts(14))
