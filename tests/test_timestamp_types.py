"""TIMESTAMP vs TIMESTAMP_NTZ duality: every time operator must give
identical results whichever timestamp type the input carries.

The driver's parquet fixtures have changed physical timestamp type
between rounds (int64 nanos -> naive/NTZ), and each change broke
whatever called ``unix_micros``/``withWatermark`` directly. These
tests pin the contract that operators are type-agnostic (session tz
is UTC in conftest, so the NTZ wall clock IS the LTZ instant)."""

import datetime

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.timeutil import epoch_micros, epoch_seconds
from linz_bde_uploader_spark.operators.asof import asof_join
from linz_bde_uploader_spark.operators.rangejoin import interval_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


LEFT = [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:30:00"),
        (3, "2024-01-01 12:00:05")]
RIGHT = [(10, "2024-01-01 09:59:00"), (11, "2024-01-01 11:00:00"),
         (12, "2024-01-01 12:00:00")]


def _frames(spark, ts_type):
    l = spark.createDataFrame(
        [(i, _ts(t)) for i, t in LEFT], f"id long, ts {ts_type}")
    r = spark.createDataFrame(
        [(i, _ts(t)) for i, t in RIGHT], f"rid long, rts {ts_type}")
    return l, r


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
def test_epoch_micros_both_types(spark, ts_type):
    df = spark.createDataFrame([(_ts("2024-01-01 10:00:00"),)],
                               f"ts {ts_type}")
    row = df.select(epoch_micros("ts").alias("us"),
                    epoch_seconds("ts").alias("s")).first()
    assert row.us == 1704103200000000
    assert row.s == 1704103200.0


def test_interval_join_type_agnostic(spark):
    outs = []
    for t in ("timestamp", "timestamp_ntz"):
        l, r = _frames(spark, t)
        j = interval_join(l, r, left_ts="ts", right_ts="rts",
                          lower_s=-3600.0, upper_s=0.0)
        outs.append(sorted((x.id, x.rid) for x in j.collect()))
    assert outs[0] == outs[1]
    assert outs[0] == [(1, 10), (2, 11), (3, 12)]


def test_interval_join_mixed_types(spark):
    """One side LTZ, the other NTZ — the cast normalizes both."""
    l, _ = _frames(spark, "timestamp")
    _, r = _frames(spark, "timestamp_ntz")
    j = interval_join(l, r, left_ts="ts", right_ts="rts",
                      lower_s=-3600.0, upper_s=0.0)
    assert sorted((x.id, x.rid) for x in j.collect()) == \
        [(1, 10), (2, 11), (3, 12)]


def test_asof_join_type_agnostic(spark):
    outs = []
    for t in ("timestamp", "timestamp_ntz"):
        l, r = _frames(spark, t)
        l = l.withColumn("k", F.lit(1))
        r = (r.withColumnRenamed("rts", "ts").withColumn("k", F.lit(1))
             .withColumnRenamed("rid", "quote"))
        j = asof_join(l, r, key="k", ts="ts", payload_cols=["quote"])
        outs.append(sorted((x.id, x.quote) for x in j.collect()))
    assert outs[0] == outs[1]
    assert outs[0] == [(1, 10), (2, 11), (3, 12)]


def test_streaming_batch_analog_type_agnostic(spark):
    """windowed_counts (the batch form) on NTZ equals LTZ — and the
    NTZ path must not raise EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE."""
    from linz_bde_uploader_spark.streaming.events import windowed_counts

    rows = [(_ts(t), "a", 1.0) for _, t in LEFT] + \
           [(_ts(t), "b", 2.0) for _, t in RIGHT]
    outs = []
    for t in ("timestamp", "timestamp_ntz"):
        df = spark.createDataFrame(rows, f"ts {t}, event_type string, value double")
        outs.append(sorted(map(tuple, windowed_counts(df).collect())))
    assert outs[0] == outs[1]
