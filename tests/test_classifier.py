"""Hashed-feature linear classifier: NumPy training parity and the
leakage-safe split invariant."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    """Synthetic separable corpus: 'spammy' docs repeat a junk token."""
    rows = []
    for i in range(120):
        if i % 3 == 0:
            rows.append((i, "buy cheap now " * 4 + f"filler{i % 7}", 1))
        else:
            rows.append((i, f"the quick brown fox {i % 11} jumps over "
                            f"words {i % 5} of ordinary prose", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _collect_feats(feats):
    return [(r["id"], r["feat"], r["cnt"]) for r in feats.collect()]


def test_train_logreg_matches_numpy(spark, corpus):
    """The distributed batch-GD update must reproduce a dense NumPy
    implementation of the same rule (same lr, same iterations, same
    feature hashing) to float tolerance."""
    from linz_bde_uploader_spark.operators import classifier as C

    nf, iters, lr = 256, 3, 0.5
    feats = C.hashed_features(corpus, n_features=nf).cache()
    labels = corpus.select(F.col("doc_id").alias("id"), "y").cache()
    w, b = C.train_logreg(feats, labels, n_features=nf, iters=iters, lr=lr)

    ids = sorted(r["id"] for r in labels.collect())
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), nf))
    for i, f_, c in _collect_feats(feats):
        X[idx[i], f_] = c
    y = np.array([r["y"] for r in
                  sorted(labels.collect(), key=lambda r: r["id"])],
                 dtype=np.float64)
    wn = np.zeros(nf)
    bn = 0.0
    n = len(ids)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ wn + bn)))
        r = p - y
        wn -= lr * (X.T @ r) / n
        bn -= lr * r.sum() / n
    assert abs(b - bn) < 1e-9
    assert np.allclose(w, wn, atol=1e-9)


def test_trained_model_separates_planted_classes(spark, corpus):
    """Three GD iterations on the separable fixture must rank every
    spammy doc above every clean doc by margin."""
    from linz_bde_uploader_spark.operators import classifier as C

    nf = 256
    feats = C.hashed_features(corpus, n_features=nf).cache()
    labels = corpus.select(F.col("doc_id").alias("id"), "y")
    w, b = C.train_logreg(feats, labels, n_features=nf, iters=3, lr=0.5)
    wdf = spark.createDataFrame(
        [(i, float(w[i])) for i in range(nf)], ["feat", "w"])
    margins = {r["id"]: r["margin"]
               for r in C.score_margin(feats, wdf, bias=b).collect()}
    spam = [m for i, m in margins.items() if i % 3 == 0]
    clean = [m for i, m in margins.items() if i % 3 != 0]
    assert min(spam) > max(clean)


def test_split_leakage_safe_no_cluster_straddles(spark):
    """Every LSH near-dup pair must land on one side of the split,
    and the split must be roughly 90/10 at the group level."""
    from linz_bde_uploader_spark.operators import dedup as D
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        _dup_corpus, q_docs_split_leakage_safe)

    split = {r["doc_id"]: (r["rep"], r["split"])
             for r in q_docs_split_leakage_safe(spark, SF_DIR).collect()}
    corpus = _dup_corpus(spark, SF_DIR)
    assert len(split) == corpus.count()
    pairs = D.lsh_candidate_pairs(corpus, num_perm=16, bands=4,
                                  shingle_words=3,
                                  max_bucket_size=None).collect()
    assert pairs
    for r in pairs:
        assert split[r["id_a"]][1] == split[r["id_b"]][1]
    reps = {rep for rep, _ in split.values()}
    train_reps = {rep for rep, s in split.values() if s == "train"}
    frac = len(train_reps) / len(reps)
    assert 0.75 < frac <= 1.0


def test_quality_deciles_monotone_and_balanced(spark):
    """Deciles are monotone in margin, ties share a bucket, and
    bucket sizes are near n/10 (exact up to tie granularity)."""
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        q_docs_quality_deciles,
    )

    rows = q_docs_quality_deciles(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    by_margin = {}
    for r in rows:
        by_margin.setdefault(r["margin_milli"], set()).add(r["decile"])
    for deciles in by_margin.values():
        assert len(deciles) == 1  # ties share a decile
    ordered = sorted(rows, key=lambda r: r["margin_milli"])
    decs = [r["decile"] for r in ordered]
    assert decs == sorted(decs)  # monotone
    assert decs[0] == 0 and decs[-1] == 9
    from collections import Counter
    sizes = Counter(decs)
    assert all(abs(sizes.get(d, 0) - n / 10) <= max(3, n * 0.05)
               for d in range(10))


def test_epoch_plan_repeat_structure(spark):
    """Per source: repeats take exactly two adjacent values
    (floor(r/1000) and +1 via the hash remainder), the realized
    extra-fraction tracks r%1000, and a capped source never exceeds
    4 repeats."""
    from collections import defaultdict

    from linz_bde_uploader_spark.plans.pipeline_suite import q_docs_epoch_plan

    rows = q_docs_epoch_plan(spark, SF_DIR).collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        per[r["source"]].append(r["n_repeats"])
        assert 0 <= r["n_repeats"] <= 4
    for src, reps in per.items():
        vals = sorted(set(reps))
        assert len(vals) <= 2
        if len(vals) == 2:
            assert vals[1] == vals[0] + 1
