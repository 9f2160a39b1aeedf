"""Backward as-of join semantics (operators/asof.py)."""

import datetime as dt

import pytest

from linz_bde_uploader_spark.operators.asof import asof_join


def _t(mm):
    return dt.datetime(2024, 1, 1, 10, mm)


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        [(1, _t(0), 100, 10.0),   # user 1: quotes at :00 and :20
         (1, _t(20), 101, 20.0),
         (1, _t(20), 102, 21.0),  # same-ts tie -> higher seq wins
         (2, _t(30), 103, 30.0)],
        "user_id long, ts timestamp, event_id long, px double")
    trades = spark.createDataFrame(
        [(1, _t(5), 200),    # between quotes -> 10.0
         (1, _t(20), 201),   # equal ts -> right side wins (<=): 21.0
         (1, _t(50), 202),   # after all -> latest: 21.0
         (2, _t(25), 203),   # before user 2's only quote -> null
         (3, _t(40), 204)],  # no quotes for key at all -> null
        "user_id long, ts timestamp, event_id long")
    return trades, quotes


def test_asof_backward_semantics(spark, frames):
    trades, quotes = frames
    out = asof_join(trades, quotes, key="user_id", ts="ts",
                    payload_cols=["px"], seq_col="event_id")
    got = {r.event_id: r.px for r in out.collect()}
    assert got == {200: 10.0, 201: 21.0, 202: 21.0, 203: None, 204: None}


def test_asof_rejects_column_collision(spark, frames):
    trades, quotes = frames
    with pytest.raises(ValueError, match="already on left side"):
        asof_join(trades.withColumn("px", trades.event_id * 1.0),
                  quotes, key="user_id", ts="ts", payload_cols=["px"])


def test_asof_plan_single_key_shuffle(spark, frames):
    """The union-window composition must shuffle ONCE on the key —
    the whole point vs. a range-join pair blow-up."""
    trades, quotes = frames
    out = asof_join(trades, quotes, key="user_id", ts="ts",
                    payload_cols=["px"], seq_col="event_id")
    jvm = spark._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "Join" not in plan
