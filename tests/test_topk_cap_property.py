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

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.hashing import hash32
from linz_bde_uploader_spark.operators.dedup import (
    duplicate_clusters, lsh_candidate_pairs,
)
from linz_bde_uploader_spark.operators.topk import grouped_topk

# heavy module: excluded from the inner-loop run (pytest.ini, -m "not slow")
pytestmark = pytest.mark.slow

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
    full = lsh_candidate_pairs(df, num_perm=8, bands=2, shingle_words=2,
                               max_bucket_size=None)
    c_a = {(r["id"], r["cluster_id"])
           for r in duplicate_clusters(capped).collect()}
    c_b = {(r["id"], r["cluster_id"])
           for r in duplicate_clusters(full).collect()}
    assert c_a == c_b


# --------------------------------------------------- r6 equivalences


@SLOW
@given(words=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1, max_size=25),
    n_merges=st.integers(1, 5))
def test_bpe_train_matches_reference_property(spark, words, n_merges):
    """bpe_train == pure-Python reference BPE for ANY corpus over a
    tiny alphabet — hammers runs ('aaaa'), ties (lexicographic pair
    break), multi-char merged symbols re-merging, and merge counts
    exceeding the distinct-pair supply."""
    import collections

    from linz_bde_uploader_spark.operators import text_analysis as TA

    docs = spark.createDataFrame([(0, " ".join(words))],
                                 ["doc_id", "text"])

    freqs = collections.Counter(words)
    toks = {w: list(w) for w in freqs}
    expect = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for w, ts in toks.items():
            for i in range(len(ts) - 1):
                counts[(ts[i], ts[i + 1])] += freqs[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        expect.append(best)
        a, b = best
        for w, ts in toks.items():
            out, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == a and ts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            toks[w] = out

    assert TA.bpe_train(docs, n_merges=n_merges) == expect


@SLOW
@given(vecs=st.lists(
    st.tuples(st.integers(-2, 2), st.integers(-2, 2),
              st.integers(-2, 2)),
    min_size=3, max_size=25),
    tau_pct=st.integers(30, 95))
def test_semantic_dedup_matches_naive_property(spark, vecs, tau_pct):
    """semantic_dedup's distinct-vector formulation == the naive
    member-level rule for ANY integer vector set — hammers identical
    groups whose ids straddle other groups' reps, all-identical
    corpora, and thresholds near cosine ties. Zero vectors excluded
    (cosine undefined; the operator's contract requires non-null
    norms)."""
    import numpy as np

    from linz_bde_uploader_spark.operators import similarity as S

    rows = [(i, [float(a), float(b), float(c)])
            for i, (a, b, c) in enumerate(vecs)
            if (a, b, c) != (0, 0, 0)]
    if len(rows) < 2:
        return
    k_probe = min(4, len(rows))
    if not any(i < k_probe for i, _ in rows):
        return  # zero-vector filtering emptied the seed range
    tau = tau_pct / 100.0
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    k = min(4, len(rows))
    got = {r["vec_id"]: (r["cell"], r["kept"])
           for r in S.semantic_dedup(emb, threshold=tau,
                                     n_centroids=k).collect()}

    X = dict((i, np.array(v)) for i, v in rows)
    # seed_centroids keeps vec_id < n_centroids and its cell ids ARE
    # those vec_ids — with zero-vector gaps they are not positional
    cands = [i for i in sorted(X) if i < k]
    C = [X[i] for i in cands]

    def cell_of(v):
        sims = [float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
                for c in C]
        return cands[int(np.argmax(sims))]  # first max -> lowest cent_id

    cells = {i: cell_of(v) for i, v in X.items()}
    for b in X:
        dropped = any(
            a < b and cells[a] == cells[b]
            and round(float(X[a] @ X[b] / (np.linalg.norm(X[a])
                                           * np.linalg.norm(X[b]))), 6) >= tau
            for a in X)
        assert got[b] == (cells[b], not dropped), (b, got[b], tau)


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(words=st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1, max_size=20))
def test_bpe_merges_sql_matches_reference_property(words):
    """SQL_BPE_MERGES (the unrolled greedy-islands oracle) == the
    pure-Python reference BPE for ANY corpus over a tiny alphabet —
    no Spark in the loop, so this hammers the SQL's gaps-and-islands
    overlap handling (runs like 'aaaa'), lexicographic tie-breaks,
    and merged-symbol re-merging cheaply. Transitively pins the
    oracle to bpe_train via test_bpe_train_matches_reference_property."""
    import collections

    import duckdb
    import pandas as pd

    from linz_bde_uploader_spark.plans.pipeline_suite import SQL_BPE_MERGES

    freqs = collections.Counter(words)
    toks = {w: list(w) for w in freqs}
    expect = []
    for _ in range(8):
        counts = collections.Counter()
        for w, ts in toks.items():
            for i in range(len(ts) - 1):
                counts[(ts[i], ts[i + 1])] += freqs[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        expect.append(best)
        a, b = best
        for w, ts in toks.items():
            out, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == a and ts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            toks[w] = out

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": [" ".join(words)]}))
    got = [(r[1], r[2]) for r in
           sorted(con.execute(SQL_BPE_MERGES).fetchall())]
    assert got == expect, (got, expect)
