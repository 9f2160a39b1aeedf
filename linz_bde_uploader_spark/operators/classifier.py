"""Model-based quality scoring: a fastText-style linear classifier
over hashed bag-of-words features, trained and applied as pure
DataFrame plans.

The reference has no ML surface — this extends the training-data
pipeline the way production corpus filters do (e.g. the CCNet /
fastText quality-filter stage): a linear model over hashed n-gram
counts is the standard cheap doc-quality gate before expensive
model-based filtering.

Scale design:
- Features: one tokenize + explode + groupBy pass -> sparse
  (id, feat, cnt) rows; the feature space is a fixed hash range, so
  the aggregate is a bounded-key shuffle with map-side combine.
- Scoring: weights are a tiny (n_features) relation -> broadcast
  join + one aggregate keyed on the doc id. Nothing collects.
- Training (batch gradient descent): per iteration one broadcast
  join (margins), one narrow join on the doc id (residuals back to
  features — co-partitioned, both sides were just keyed by id), one
  groupBy(feat) aggregate, and a driver-side O(n_features) weight
  update. Driver traffic per iteration is n_features scalars —
  the same bounded shape kmeans_fit uses for centroids. Iterations
  are O(corpus scan) each; feature rows can be persisted once by the
  caller and reused across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.hashing import hash32


def hashed_features(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    n_features: int = 1024) -> DataFrame:
    """Sparse hashed bag-of-words: (id, feat, cnt) with
    feat = portable_hash32('f:' || word) % n_features. Hashing is the
    md5-derived portable family, so any ANSI engine reproduces the
    exact feature matrix (the differential-testing contract)."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    feat = F.pmod(hash32(F.concat(F.lit("f:"), F.col("word"))),
                  F.lit(n_features))
    return (
        docs.select(F.col(id_col).alias("id"), w)
        .select("id", feat.alias("feat"))
        .groupBy("id", "feat").agg(F.count("*").alias("cnt"))
    )


def score_margin(feats: DataFrame, weights: DataFrame,
                 bias: float = 0.0) -> DataFrame:
    """(id, margin): margin = bias + sum(cnt * w) over the doc's
    features. ``weights`` is (feat, w) — at most n_features rows, so
    it broadcasts; the aggregate is keyed on the doc id."""
    return (
        feats.join(F.broadcast(weights), "feat")
        .groupBy("id")
        .agg((F.lit(bias)
              + F.sum(F.col("cnt") * F.col("w"))).alias("margin"))
    )


def train_logreg(feats: DataFrame, labels: DataFrame,
                 n_features: int = 1024, iters: int = 5,
                 lr: float = 0.5):
    """Batch-gradient-descent logistic regression over sparse hashed
    features. ``labels`` is (id, y) with y in {0,1}. Returns
    (weights: list[float] of length n_features, bias: float).

    Full-batch gradient, the distributed-friendly variant: per
    iteration the current weights enter the plan as a broadcast
    relation, margins and sigmoids are computed per doc JVM-side,
    residuals join back to the feature rows on the doc id, and the
    per-feature gradient aggregate collects n_features scalars to
    the driver for the update — the bounded driver-reduction shape
    shared with kmeans_fit / pca_fit. Docs absent from ``labels``
    are ignored; docs with no features still contribute to the bias
    gradient via the labels relation.

    Callers should persist ``feats`` (and ``labels``) before
    training: each iteration re-reads both."""
    spark = feats.sparkSession
    w = [0.0] * n_features
    b = 0.0
    n = labels.count()
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(i, float(w[i])) for i in range(n_features)], ["feat", "w"])
        margins = score_margin(feats, wdf, bias=b)
        resid = (
            labels.join(margins, "id", "left")
            .select("id",
                    (F.lit(1.0)
                     / (F.lit(1.0) + F.exp(-F.coalesce("margin", F.lit(b))))
                     - F.col("y").cast("double")).alias("r")))
        grad_rows = (
            feats.join(resid, "id")
            .groupBy("feat")
            .agg(F.sum(F.col("cnt") * F.col("r")).alias("g"))
            .collect())
        gb = resid.agg(F.sum("r").alias("g")).collect()[0]["g"]
        for row in grad_rows:
            w[row["feat"]] -= lr * row["g"] / n
        b -= lr * gb / n
    return w, b
