"""Property-based checks of the r5 scale rewrites against their naive
forms, over randomized inputs — the soak tests pin one hot fixture;
these pin the equivalences across the input space.

- grouped_topk == one-window top-k for ANY grouping/order/k/salting
  (exactness is a pigeonhole argument; the property hammers ties,
  empty groups, and k larger than the group).
- capped LSH candidates produce the SAME connected components as
  all-pairs candidates for ANY corpus (a bucket is a clique; a star
  spans a clique's component) — not just the boilerplate fixture.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.hashing import hash32
from linz_bde_uploader_spark.operators.dedup import (
    duplicate_clusters, lsh_candidate_pairs,
)
from linz_bde_uploader_spark.operators.topk import grouped_topk

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

rows_strategy = st.lists(
    st.tuples(st.integers(0, 30),          # score (ties likely)
              st.integers(0, 3)),          # group (few groups)
    min_size=1, max_size=40)


@SLOW
@given(rows=rows_strategy, k=st.integers(1, 6), n_salts=st.integers(1, 5))
def test_grouped_topk_matches_window_property(spark, rows, k, n_salts):
    data = [(i, f"g{g}", s) for i, (s, g) in enumerate(rows)]
    df = spark.createDataFrame(data, ["id", "grp", "score"])
    order = [F.col("score").desc(), F.col("id")]
    got = {tuple(r) for r in grouped_topk(
        df, ["grp"], order, k, hash32(F.col("id").cast("string")),
        n_salts=n_salts).select("grp", "rank", "id").collect()}
    w = Window.partitionBy("grp").orderBy(*order)
    want = {tuple(r) for r in
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).select("grp", "rank", "id").collect()}
    assert got == want


texts = st.sampled_from([
    "alpha beta gamma delta epsilon zeta",
    "alpha beta gamma delta epsilon eta",
    "one two three four five six seven",
    "shared boiler plate text block here",
    "totally different words in this doc",
])


@SLOW
@given(docs=st.lists(texts, min_size=2, max_size=25),
       cap=st.integers(1, 6))
def test_capped_lsh_components_equal_property(spark, docs, cap):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    capped = lsh_candidate_pairs(df, num_perm=8, bands=2, shingle_words=2,
                                 max_bucket_size=cap)
    full = lsh_candidate_pairs(df, num_perm=8, bands=2, shingle_words=2)
    c_a = {(r["id"], r["cluster_id"])
           for r in duplicate_clusters(capped).collect()}
    c_b = {(r["id"], r["cluster_id"])
           for r in duplicate_clusters(full).collect()}
    assert c_a == c_b
