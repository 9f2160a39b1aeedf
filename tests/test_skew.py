"""salted_join must be row-for-row equivalent to the plain join
(operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def frames(spark):
    # 90% of fact rows hit key 7 (the hot key); dim has keys 0-9
    # plus 11 (matches nothing), fact also has key 99 (dim miss)
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100)
        .alias("k"), F.col("id").alias("fact_id"))
    dim = spark.range(0, 12).select(F.col("id").alias("k"),
                                    F.concat(F.lit("d"), "id").alias("dim_val"))
    return fact, dim


def test_salted_inner_equals_plain(spark, frames):
    fact, dim = frames
    plain = sorted((r.fact_id, r.dim_val) for r in
                   fact.join(dim, "k").collect())
    salted = sorted((r.fact_id, r.dim_val) for r in
                    salted_join(fact, dim, "k", n_salts=8).collect())
    assert salted == plain and plain


def test_salted_left_outer_equals_plain(spark, frames):
    fact, dim = frames
    plain = sorted((r.fact_id, r.dim_val) for r in
                   fact.join(dim, "k", "left_outer").collect())
    salted = sorted((r.fact_id, r.dim_val) for r in
                    salted_join(fact, dim, "k", n_salts=8,
                                how="left_outer").collect())
    assert salted == plain
    assert any(v is None for _, v in plain)  # dim-miss rows survive


def test_salted_join_spreads_hot_key(spark, frames):
    """The point of the salt: the hot key's rows must land in more
    than one (key, salt) group."""
    fact, _ = frames
    l = fact.withColumn("_s", F.pmod(F.monotonically_increasing_id(), 8))
    n_groups = l.filter("k = 7").select("_s").distinct().count()
    assert n_groups > 1
