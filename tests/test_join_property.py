"""Property-based checks of the custom join operators (asof_join,
interval_join) against brute-force Python models — the golden-case
tests in test_asof.py / test_rangejoin.py pin known scenarios; these
pin the semantics across randomized key/timestamp space (ties, empty
sides, out-of-range rows, negative interval bounds)."""

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linz_bde_uploader_spark.operators.asof import asof_join
from linz_bde_uploader_spark.operators.rangejoin import interval_join

# heavy module: excluded from the inner-loop run (pytest.ini, -m "not slow")
pytestmark = pytest.mark.slow

BASE = dt.datetime(2024, 1, 1)

key_s = st.integers(min_value=0, max_value=2)
ts_s = st.integers(min_value=0, max_value=40)
left_rows = st.lists(st.tuples(key_s, ts_s), max_size=8)
right_rows = st.lists(st.tuples(key_s, ts_s, st.integers(0, 100)),
                      max_size=8)


def _t(sec):
    return BASE + dt.timedelta(seconds=sec)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_model(spark, lrows, rrows):
    left = [(i, k, _t(t)) for i, (k, t) in enumerate(lrows)]
    right = [(1000 + i, k, _t(t), float(v))
             for i, (k, t, v) in enumerate(rrows)]
    ldf = spark.createDataFrame(left, schema="eid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        right, schema="eid long, k long, ts timestamp, val double")
    out = asof_join(ldf, rdf, key="k", ts="ts",
                    payload_cols=["val"], seq_col="eid")
    got = {r["eid"]: r["val"] for r in out.collect()}
    assert set(got) == {eid for (eid, _, _) in left}
    for (eid, k, t) in left:
        cand = [(rt, reid, v) for (reid, rk, rt, v) in right
                if rk == k and rt <= t]
        exp = max(cand)[2] if cand else None
        assert got[eid] == exp, (eid, k, t, cand)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows,
       lo=st.integers(min_value=-20, max_value=5),
       width=st.integers(min_value=1, max_value=25))
def test_interval_join_matches_model(spark, lrows, rrows, lo, width):
    hi = lo + width
    left = [(i, k, _t(t)) for i, (k, t) in enumerate(lrows)]
    right = [(1000 + i, k, _t(t), float(v))
             for i, (k, t, v) in enumerate(rrows)]
    ldf = spark.createDataFrame(left, schema="eid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        right, schema="reid long, k long, rts timestamp, val double")

    expected = {(eid, reid)
                for (eid, k, t) in left
                for (reid, rk, rt, _v) in right
                if rk == k and t + dt.timedelta(seconds=lo) <= rt
                and rt <= t + dt.timedelta(seconds=hi)}

    inner = interval_join(ldf, rdf, left_ts="ts", right_ts="rts",
                          lower_s=float(lo), upper_s=float(hi),
                          key="k", how="inner")
    got = {(r["eid"], r["reid"]) for r in inner.collect()}
    assert got == expected

    outer = interval_join(ldf, rdf, left_ts="ts", right_ts="rts",
                          lower_s=float(lo), upper_s=float(hi),
                          key="k", how="left_outer")
    rows = outer.collect()
    matched = {(r["eid"], r["reid"]) for r in rows if r["reid"] is not None}
    unmatched = {r["eid"] for r in rows if r["reid"] is None}
    assert matched == expected
    assert unmatched == {eid for (eid, _, _) in left
                         if eid not in {e for (e, _) in expected}}

    # the left_id fast path (caller-guaranteed unique key, no derived
    # row-id shuffle) must give exactly the same outer result
    outer_fast = interval_join(ldf, rdf, left_ts="ts", right_ts="rts",
                               lower_s=float(lo), upper_s=float(hi),
                               key="k", how="left_outer", left_id="eid")
    fast = outer_fast.collect()
    assert {(r["eid"], r["reid"]) for r in fast if r["reid"] is not None} \
        == matched
    assert {r["eid"] for r in fast if r["reid"] is None} == unmatched
