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


def test_hll_estimate_within_error_bounds(spark):
    """The deterministic HLL (operators/sketches.py) must land within
    the theoretical relative error of the exact distinct count:
    rsd = 1.04/sqrt(256) ~= 6.5%; allow 4 sigma (26%). Checked on
    both cardinality regimes the events query exercises (the ~150
    linear-counting regime and the ~1.6k raw-harmonic regime)."""
    from linz_bde_uploader_spark.operators.sketches import hll_distinct
    from linz_bde_uploader_spark.plans.analytics_suite import _keyed_events

    keyed = _keyed_events(spark, SF_DIR)
    est = {(r.event_type, r.key_kind): r.hll_est_micro / 1e6
           for r in hll_distinct(
               keyed, ["event_type", "key_kind"], F.col("key")).collect()}
    exact = {(r.event_type, r.key_kind): r.nd
             for r in keyed.groupBy("event_type", "key_kind")
             .agg(F.countDistinct("key").alias("nd")).collect()}
    assert set(est) == set(exact) and len(exact) == 10
    for k, nd in exact.items():
        assert abs(est[k] - nd) <= 0.26 * nd, (k, est[k], nd)


def test_kmv_estimate_within_error_bounds_and_exact_branch(spark):
    """KMV k=64: rsd ~= 1/sqrt(k-2) ~= 12.7%; allow 4 sigma (51%).
    Below k distinct keys the sketch IS the distinct set, so the
    estimate must be EXACT (the published exact branch)."""
    from linz_bde_uploader_spark.operators.sketches import kmv_distinct
    from linz_bde_uploader_spark.plans.analytics_suite import _keyed_events

    keyed = _keyed_events(spark, SF_DIR)
    est = {(r.event_type, r.key_kind): r.kmv_est_micro / 1e6
           for r in kmv_distinct(
               keyed, ["event_type", "key_kind"], F.col("key")).collect()}
    exact = {(r.event_type, r.key_kind): r.nd
             for r in keyed.groupBy("event_type", "key_kind")
             .agg(F.countDistinct("key").alias("nd")).collect()}
    for k, nd in exact.items():
        assert abs(est[k] - nd) <= 0.51 * nd, (k, est[k], nd)

    # exact branch: 40 distinct keys < k=64 -> estimate == 40.0
    tiny = spark.createDataFrame(
        [("g", f"key{i % 40}") for i in range(200)], "g string, k string")
    (row,) = kmv_distinct(tiny, ["g"], F.col("k")).collect()
    assert row.kmv_est_micro == 40 * 1_000_000


def test_hll_sketch_shuffle_is_register_bounded(spark):
    """The 100 TB claim, pinned on the plan: the HLL aggregation
    pipeline contains no window, no UDF and no collect, and its
    post-projection aggregates are partial (map-side combine) — the
    final exchange carries register rows, not input rows. We assert
    the physical plan has partial_ aggregates below the exchange and
    no Window/Python nodes anywhere."""
    from linz_bde_uploader_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("g", f"key{i}") for i in range(5000)], "g string, k string")
    plan = hll_distinct(df, ["g"], F.col("k"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Python" not in plan
    assert "partial_max" in plan  # register max combines map-side
    assert "partial_sum" in plan or "partial_count" in plan


def test_maintain_hll_equals_full_refresh(spark):
    """The seventh IVM member: the maintained register table through
    the CDC merge must equal a from-scratch register build over the
    merged state — including groups that lost rows (recompute path),
    insert-only groups (max-merge path), and the NULL-key filter."""
    from linz_bde_uploader_spark.operators import merge as M
    from linz_bde_uploader_spark.operators import sketches as SK
    from linz_bde_uploader_spark.plans.engine_suite import (
        ORDER_COLS, cdc_frames)

    cur, stg, chg = cdc_frames(spark, SF_DIR)
    actions = M.classify_actions(cur, stg, chg, "o_orderkey",
                                 ORDER_COLS).cache()
    merged = M.apply_actions(cur, stg, actions, "o_orderkey")
    skey = F.col("o_custkey").cast("string")
    old = SK.hll_registers(cur, ["o_orderstatus"], skey)
    got = {(r.o_orderstatus, r.idx): r.m for r in
           SK.maintain_hll(cur, stg, actions, "o_orderkey",
                           ["o_orderstatus"], skey, merged,
                           old_regs=old).collect()}
    want = {(r.o_orderstatus, r.idx): r.m for r in
            SK.hll_registers(merged, ["o_orderstatus"],
                             skey).collect()}
    assert got == want and len(want) > 100
    # ...and the bootstrap path (old_regs=None) is the same thing
    boot = {(r.o_orderstatus, r.idx): r.m for r in
            SK.maintain_hll(cur, stg, actions, "o_orderkey",
                            ["o_orderstatus"], skey, merged,
                            old_regs=None).collect()}
    assert boot == want


def test_maintain_hll_insert_only_and_group_vanish(spark):
    """Two hand-checked edges: (a) insert-only actions touch no
    group, so the stored registers max-merge with the delta (the
    estimate can only grow); (b) deleting a group's every row makes
    the group vanish from the refreshed view."""
    from linz_bde_uploader_spark.operators import merge as M
    from linz_bde_uploader_spark.operators import sketches as SK

    cur = spark.createDataFrame(
        [(1, "a", "u1"), (2, "a", "u2"), (3, "b", "u3")],
        "k long, g string, u string")
    skey = F.col("u")
    old = SK.hll_registers(cur, ["g"], skey)

    # (a) pure inserts into group a
    stg = cur.unionByName(spark.createDataFrame(
        [(4, "a", "u4"), (5, "a", "u5")], "k long, g string, u string"))
    chg = spark.createDataFrame([(4,), (5,)], "key long")
    actions = M.classify_actions(cur, stg, chg, "k", ["k", "g", "u"])
    merged = M.apply_actions(cur, stg, actions, "k")
    got = {(r.g, r.idx): r.m for r in
           SK.maintain_hll(cur, stg, actions, "k", ["g"], skey,
                           merged, old_regs=old).collect()}
    want = {(r.g, r.idx): r.m for r in
            SK.hll_registers(merged, ["g"], skey).collect()}
    assert got == want

    # (b) delete every row of group b
    stg2 = cur.filter("g <> 'b'")
    chg2 = spark.createDataFrame([(3,)], "key long")
    actions2 = M.classify_actions(cur, stg2, chg2, "k", ["k", "g", "u"])
    merged2 = M.apply_actions(cur, stg2, actions2, "k")
    got2 = SK.maintain_hll(cur, stg2, actions2, "k", ["g"], skey,
                           merged2, old_regs=old)
    assert got2.filter("g = 'b'").count() == 0
    assert {(r.g, r.idx): r.m for r in got2.collect()} == \
        {(r.g, r.idx): r.m for r in
         SK.hll_registers(merged2, ["g"], skey).collect()}


def test_hll_overlap_tracks_exact(spark):
    """Inclusion-exclusion overlap over register unions must track
    the exact intersection. Differencing compounds the error of
    THREE estimates, each rsd ~6.5% of its own (union-sized)
    cardinality — allow 4 sigma of 3x the union rsd. The events
    user sets overlap heavily, so the signal is large."""
    from linz_bde_uploader_spark.plans.analytics_suite import (
        q_events_hll_overlap)

    rows = q_events_hll_overlap(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5 types, 2)
    for r in rows:
        est = r.hll_overlap_micro / 1e6
        # union <= 150 users; 4 sigma * 3 * 0.065 * 150 ~= 117
        assert abs(est - r.exact_overlap) <= 120, \
            (r.type_a, r.type_b, est, r.exact_overlap)


def test_sampled_percentiles_rank_error(spark):
    """The 1/16 hash sample's percentile must land near the
    population percentile. On 1..5000 uniform values the sample is
    ~312 rows; binomial rank sd ~= sqrt(p(1-p)/n_s) * N ~= 140 for
    p50 — allow 4 sigma (~11%). The hash sample is FIXED, so the
    assertion is permanent, not flaky. (The suite query runs the
    same operator pipeline per source at sf0.01; this test supplies
    the statistically meaningful group size.)"""
    import duckdb

    from linz_bde_uploader_spark.plans.pipeline_suite import (
        SQL_SAMPLED_PERCENTILES)

    con = duckdb.connect()
    con.execute("""CREATE VIEW documents AS
        SELECT 'g' AS source, range AS doc_id, range AS n_chars,
               '' AS text, 'en' AS lang
        FROM range(1, 5001)""")
    (row,) = con.execute(SQL_SAMPLED_PERCENTILES).fetchall()
    _src, n_sample, p50, p90, p99 = row
    assert 200 <= n_sample <= 450, n_sample
    assert abs(p50 - 2500) <= 550, p50
    assert abs(p90 - 4500) <= 400, p90
    assert abs(p99 - 4950) <= 250, p99


def test_kmv_jaccard_tracks_exact(spark):
    """The KMV Jaccard estimator (|L ∩ A ∩ B| / |L| over the merged
    k-min sketch) is a binomial draw of k=64 samples: sd =
    sqrt(J(1-J)/64) <= 0.0625. Allow 4 sigma (0.25) against the
    exact Jaccard — and require the two columns to be integer
    micro-units (the query's zero-float claim)."""
    from linz_bde_uploader_spark.plans.analytics_suite import (
        q_events_kmv_jaccard)

    rows = q_events_kmv_jaccard(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert isinstance(r.kmv_jaccard_micro, int)
        assert abs(r.kmv_jaccard_micro - r.exact_jaccard_micro) \
            <= 250_000, (r.type_a, r.type_b)


def test_cms_one_sided_error(spark):
    """Count-min guarantees: the estimate NEVER undercounts, and
    overcounts by at most ~2N/w with high probability (N tokens,
    w=1024 counters, min over 4 rows). Checked for EVERY distinct
    token of the sf0.01 corpus, not just the probe set — the
    never-undercount property is structural and must hold
    universally."""
    from linz_bde_uploader_spark.operators.sketches import (
        cms_build, cms_lookup)
    from linz_bde_uploader_spark.plans.tables import load_table

    toks = (load_table(spark, SF_DIR, "documents")
            .select(F.explode(F.split(F.trim("text"), r"\s+"))
                    .alias("tok")))
    n_total = toks.count()
    cms = cms_build(toks)
    assert cms.count() <= 4 * 1024
    exact = toks.groupBy("tok").count()
    est = cms_lookup(cms, exact.select("tok"))
    joined = {r.tok: (r["count"], r.cms_count) for r in
              exact.join(est, "tok").collect()}
    assert joined
    bound = 4 * (2 * n_total / 1024)  # 4x the Markov bound, generous
    for tok, (ex, cm) in joined.items():
        assert cm >= ex, (tok, ex, cm)          # one-sided, always
        assert cm - ex <= bound, (tok, ex, cm)  # w.h.p. overcount cap


def test_cms_weighted_build_equals_stream_build(spark):
    """The r19 weighted form — cms_build from a pre-aggregated
    (token, count) vocabulary — must produce the bit-identical
    counter table to the raw-stream build: counters are linear sums,
    so summing per-token counts into cells == counting occurrences.
    This is the identity text_cms_freq's one-pass rewrite rests on."""
    from linz_bde_uploader_spark.operators.sketches import cms_build
    from linz_bde_uploader_spark.plans.tables import load_table

    toks = (load_table(spark, SF_DIR, "documents")
            .select(F.explode(F.split(F.trim("text"), r"\s+"))
                    .alias("tok")))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("n"))
    direct = {(r.row, r.idx): r.c for r in cms_build(toks).collect()}
    weighted = {(r.row, r.idx): r.c
                for r in cms_build(vocab, count_col="n").collect()}
    assert direct == weighted and direct


def test_hll_rollup_equals_direct(spark):
    """Register max-rollup is algebraically EXACT, not approximate:
    rolling the (type, day) registers up to type by per-register max
    must be bit-identical to building type-grain registers directly
    from the events (max over a union == max of maxes). This is the
    identity the sketch-cube pattern (events_hll_rollup) rests on."""
    from linz_bde_uploader_spark.plans.tables import load_table
    from linz_bde_uploader_spark.operators.sketches import hll_registers

    ev = (load_table(spark, SF_DIR, "events")
          .filter("user_id IS NOT NULL AND ts IS NOT NULL")
          .select("event_type",
                  F.date_format(F.col("ts").cast("timestamp"),
                                "yyyy-MM-dd").alias("day"),
                  F.col("user_id").cast("string").alias("key")))
    fine = hll_registers(ev, ["event_type", "day"], F.col("key"))
    rolled = {(r.event_type, r.idx): r.m for r in
              fine.groupBy("event_type", "idx")
              .agg(F.max("m").alias("m")).collect()}
    direct = {(r.event_type, r.idx): r.m for r in
              hll_registers(ev, ["event_type"],
                            F.col("key")).collect()}
    assert rolled == direct and len(direct) > 200
