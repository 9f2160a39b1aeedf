"""Bucketed interval join semantics + plan (operators/rangejoin.py)."""

import datetime as dt

import pytest

from linz_bde_uploader_spark.operators.rangejoin import interval_join


def _t(mm, ss=0):
    return dt.datetime(2024, 1, 1, 10, mm, ss)


@pytest.fixture(scope="module")
def frames(spark):
    purchases = spark.createDataFrame(
        [(200, 1, _t(30)),   # window [10:00, 10:30]
         (201, 1, _t(59)),   # window [10:29, 10:59]
         (202, 2, _t(30)),   # user 2: no views at all
         (203, 1, _t(0))],   # exact lower boundary case
        "event_id long, user_id long, ts timestamp")
    views = spark.createDataFrame(
        [(1, _t(0), 1.0),    # on 200's lower bound (inclusive) + 203's upper
         (1, _t(15), 2.0),   # inside 200's window
         (1, _t(31), 4.0),   # after 200, inside 201
         (1, _t(59), 8.0)],  # on 201's upper bound (inclusive)
        "user_id long, vts timestamp, v double")
    return purchases, views


def test_interval_inner_inclusive_bounds(spark, frames):
    purchases, views = frames
    out = interval_join(purchases, views, left_ts="ts", right_ts="vts",
                        lower_s=-1800.0, upper_s=0.0, key="user_id")
    got = sorted((r.event_id, r.v) for r in out.collect())
    assert got == [(200, 1.0), (200, 2.0), (201, 4.0), (201, 8.0),
                   (203, 1.0)]


def test_interval_left_outer_keeps_unmatched(spark, frames):
    purchases, views = frames
    out = interval_join(purchases, views, left_ts="ts", right_ts="vts",
                        lower_s=-1800.0, upper_s=0.0, key="user_id",
                        how="left_outer")
    rows = out.collect()
    # every purchase appears; 202 exactly once, with null right side
    by_event = {}
    for r in rows:
        by_event.setdefault(r.event_id, []).append(r.v)
    assert sorted(by_event) == [200, 201, 202, 203]
    assert by_event[202] == [None]
    assert sorted(by_event[200]) == [1.0, 2.0]


def test_interval_join_is_equi_join(spark, frames):
    """The whole point: the range predicate must ride an equi hash
    join on (bucket, key), never a nested-loop/cartesian plan."""
    purchases, views = frames
    out = interval_join(purchases, views, left_ts="ts", right_ts="vts",
                        lower_s=-1800.0, upper_s=0.0, key="user_id")
    jvm = spark._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_validates_args(spark, frames):
    purchases, views = frames
    with pytest.raises(ValueError, match="upper_s"):
        interval_join(purchases, views, left_ts="ts", right_ts="vts",
                      lower_s=0.0, upper_s=0.0, key="user_id")
    with pytest.raises(ValueError, match="how"):
        interval_join(purchases, views, left_ts="ts", right_ts="vts",
                      lower_s=-1.0, upper_s=0.0, key="user_id", how="full")
