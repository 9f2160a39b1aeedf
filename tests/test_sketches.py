"""Sketch aggregates: error bounds vs the exact answers.

A sketch query can't hash-match a DuckDB oracle (the estimate is
engine-specific), so correctness here means bounded error against the
exact computation on the same data — checked per source group.
"""

from pyspark.sql import functions as F

from linz_bde_uploader_spark.plans.pipeline_suite import q_docs_sketch_stats
from linz_bde_uploader_spark.plans.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_stats_error_bounds(spark):
    sketch = {r.source: r for r in q_docs_sketch_stats(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents")
    exact_nd = {r.source: r.nd for r in docs.groupBy("source")
                .agg(F.countDistinct("text").alias("nd")).collect()}
    lengths = {}
    for r in docs.select("source", "n_chars").collect():
        lengths.setdefault(r.source, []).append(r.n_chars)
    assert set(sketch) == set(exact_nd) and sketch
    for src, nd in exact_nd.items():
        s = sketch[src]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(s.approx_distinct_docs - nd) <= max(3, 0.06 * nd), src
        # percentile_approx returns an actual sample whose RANK must be
        # within the sketch's rank-error bound of the target rank
        # (value-distance is the wrong metric: the exact percentile
        # interpolates between samples)
        vals = sorted(lengths[src])
        n = len(vals)
        tol = max(2, int(0.01 * n) + 1)  # accuracy=10000 -> 1/10000 rank error; be lenient
        for got, p in ((s.len_p50, 0.5), (s.len_p90, 0.9), (s.len_p99, 0.99)):
            assert got in vals, (src, got)
            lo = min(i for i, v in enumerate(vals) if v == got)
            hi = max(i for i, v in enumerate(vals) if v == got)
            target = p * (n - 1)
            assert lo - tol <= target <= hi + tol, (src, p, got, target, lo, hi)
