"""Physical-plan regression tests: the scale properties SCALE.md
documents (broadcast joins, pushdown, bounded shuffles) must survive
refactors. Asserting on plan text is deliberate — a silent fallback
to a shuffle join or a lost filter pushdown is a 100 TB incident that
no row-level test catches."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _formatted(df):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def _simple(df):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))


@pytest.fixture(scope="module")
def allq():
    from linz_bde_uploader_spark.plans.analytics_suite import ANALYTICS_QUERIES
    from linz_bde_uploader_spark.plans.engine_suite import ENGINE_QUERIES
    from linz_bde_uploader_spark.plans.pipeline_suite import PIPELINE_QUERIES
    return {**ENGINE_QUERIES, **PIPELINE_QUERIES, **ANALYTICS_QUERIES}


def test_dim_joins_broadcast(spark, allq):
    """q5 joins 5 dimension tables — every join must broadcast; a
    sort-merge or cartesian fallback would shuffle the fact table
    once per dimension at scale."""
    plan = _simple(allq["q5_local_supplier"][0](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_classify_broadcasts_change_keys(spark, allq):
    """The change-key list must broadcast into both big-table scans
    (the semi-reduction that keeps 100 TB scans local)."""
    plan = _simple(allq["cdc_classify"][0](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark, allq):
    """q1's shipdate predicate must reach the parquet reader."""
    plan = _formatted(allq["q1_pricing_summary"][0](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_column_pruning_reaches_scan(spark, allq):
    """dedup_exact needs only (doc_id, text): the scan schema must not
    include the other document columns."""
    plan = _formatted(allq["dedup_exact"][0](spark, SF_DIR))
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schemas and all("lang" not in l and "source" not in l
                                for l in scan_schemas)


def test_exact_dedup_single_hash_shuffle(spark, allq):
    """Exact dedup is one hash shuffle of content digests (plus the
    local-mode repartition of the tiny input)."""
    plan = _simple(allq["dedup_exact"][0](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1


def test_q4_exists_is_semi_join(spark, allq):
    """Q4's EXISTS must compile to a semi join (only order columns
    survive the probe — no lineitem payload in the shuffle)."""
    plan = _simple(allq["q4_order_priority"][0](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q7_nation_lookups_broadcast(spark, allq):
    """Both nation lookups in Q7 must broadcast; the orderdate and
    shipdate filters must not force a cartesian pair filter."""
    plan = _simple(allq["q7_volume_shipping"][0](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q10_returnflag_pushdown(spark, allq):
    """Q10's returnflag equality predicate must reach the lineitem
    parquet scan."""
    plan = _formatted(allq["q10_returned_items"][0](spark, SF_DIR))
    assert "EqualTo(l_returnflag,R)" in plan


def test_anti_joins_compile_to_left_anti(spark, allq):
    """Q16's NOT IN and Q22's NOT EXISTS must stay anti joins, not
    degenerate into outer-join + null filter."""
    for name in ("q16_supplier_cnt", "q22_no_order_customers"):
        plan = _simple(allq[name][0](spark, SF_DIR))
        assert "LeftAnti" in plan, name
        assert "CartesianProduct" not in plan, name


def test_rollup_is_single_expand_pass(spark, allq):
    """ROLLUP compiles to one Expand + one partial/final aggregate
    pair — one shuffle for all three grouping sets, not one per set."""
    plan = _simple(allq["events_rollup"][0](spark, SF_DIR))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_lag_window_shuffles_once_on_user(spark, allq):
    """The per-user LAG window partitions by user_id exactly once."""
    plan = _simple(allq["events_lag_delta"][0](spark, SF_DIR))
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tfidf_no_token_window_and_cached_tf(spark, allq):
    """tf_idf's document frequency must be a groupBy+join, never an
    unbounded window over the token partition — a stopword-class
    token would buffer ~n_docs rows in one straggler task. The suite
    entry caches the shared tf relation (the corpus-wide df count
    needs every doc regardless of the caller's doc-subset filter, so
    the cache loses no pruning here and saves the second corpus
    tokenize): both consumers must read the cache."""
    plan = _simple(allq["text_tfidf"][0](spark, SF_DIR))
    assert "windowspecdefinition(token" not in plan
    assert "windowspecdefinition(doc_id" in plan  # doc-length window stays
    assert plan.count("InMemoryTableScan") >= 2


def test_unigram_logprob_vocab_joins_hash_or_broadcast(spark, allq):
    """The unigram-LM score joins the token stream with a one-row-per-
    token vocabulary — a hash or broadcast join, never a cartesian,
    and no unbounded token-keyed window."""
    plan = _simple(allq["text_unigram_logprob"][0](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(tok" not in plan


def test_emb_outliers_centroid_and_threshold_broadcast(spark, allq):
    """The 64-dim centroid and the 1-row mean+2sigma threshold must
    broadcast back over the embedding scan — the corpus side never
    shuffles for either."""
    plan = _simple(allq["emb_outliers"][0](spark, SF_DIR))
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # 1-row joins
    assert "SortMergeJoin" not in plan


def test_pack_sequences_no_global_sort(spark, allq):
    """Sequence packing windows per shard — the plan must show a
    shard-keyed exchange and NO single-partition exchange (a global
    running sum would serialize the corpus through one task)."""
    plan = _simple(allq["docs_pack_sequences"][0](spark, SF_DIR))
    assert "hashpartitioning(shard" in plan
    assert "Exchange SinglePartition" not in plan


def test_simhash_pairs_band_buckets_are_16bit(spark, allq):
    """The SimHash near-pair bucket join must band on 16-bit segments
    (mask 65535 -> 2^16 bucket values per band). 8-bit segments (mask
    255) cap at 256 buckets and degenerate the self-join toward
    O(n²/256) on a large corpus."""
    plan = _simple(allq["dedup_simhash_pairs"][0](spark, SF_DIR))
    assert "65535" in plan
    assert "& 255)" not in plan


def test_decontaminate_benchmark_broadcasts(spark, allq):
    """The benchmark shingle set must broadcast into the corpus
    shingle stream — at 100 TB the corpus side never shuffles for
    the contamination probe."""
    plan = _simple(allq["dedup_decontaminate"][0](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_winsorize_threshold_broadcasts(spark, allq):
    """The 1-row p99 must broadcast back into the scan (a nested-loop
    join against one row is fine; a shuffle of the fact side is not)."""
    plan = _simple(allq["events_value_winsorize"][0](spark, SF_DIR))
    assert ("BroadcastNestedLoopJoin" in plan
            or "BroadcastHashJoin" in plan)
    assert "SortMergeJoin" not in plan


def test_pivot_avoids_distinct_prepass(spark, allq):
    """Explicit pivot values -> no distinct-values collect job, and
    the plan is the two-stage pivot shape: a partial count keyed on
    (user, type) feeding a user-keyed pivotfirst. The second exchange
    carries at most |users| x |types| pre-reduced rows — fine at
    scale; what must NOT appear is a third shuffle or a scan without
    column pruning."""
    df = allq["events_pivot"][0](spark, SF_DIR)
    plan = _simple(df)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "pivotfirst" in plan
    fplan = _formatted(df)
    scan_schemas = [l for l in fplan.splitlines() if "ReadSchema" in l]
    assert scan_schemas and all("value" not in l and "props" not in l
                                for l in scan_schemas)


def test_chunking_is_shuffle_free(spark, allq):
    """Chunk explosion is map-side only — no exchange of any kind
    before the consumer."""
    plan = _simple(allq["docs_chunking"][0](spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan


def test_q9_dimensions_broadcast(spark, allq):
    """Q9's part/supplier/nation lookups must broadcast — the
    lineitem scan joins them without a fact-side shuffle."""
    plan = _simple(allq["q9_profit_nation_year"][0](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_register_views_sql_surface(spark):
    """spark.sql over registered views matches the DataFrame path —
    the SQL-first entry point users coming from the reference's
    psql-side workflows get."""
    from linz_bde_uploader_spark.plans.tables import register_views

    names = register_views(spark, SF_DIR)
    assert set(names) >= {"lineitem", "documents", "events"}
    n_sql = spark.sql(
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 25"
    ).first()["n"]
    from linz_bde_uploader_spark.plans.tables import load_table
    from pyspark.sql import functions as F
    n_df = load_table(spark, SF_DIR, "lineitem") \
        .filter(F.col("l_quantity") > 25).count()
    assert n_sql == n_df > 0


def test_jaccard_prefix_sets_cached_once(spark, allq):
    """The per-doc sorted-array aggregate (`sets`) has three consumers
    (prefix explode + both verify sides); Catalyst does not reuse the
    exchange across them, so the operator persists the relation. The
    plan must show the cache being READ (InMemoryTableScan) and at
    most one live computation of the collect_list aggregate — without
    the persist the heaviest aggregate executes 3x (measured ~3x
    wall-clock at sf0.1, r2 verdict)."""
    df = allq["dedup_jaccard_prefix"][0](spark, SF_DIR)
    plan = _simple(df)
    # all three consumers read the cache (the explain text repeats the
    # InMemoryRelation body under every scan, so counting the aggregate
    # itself in text would be meaningless)
    assert plan.count("InMemoryTableScan") >= 3
    assert "StorageLevel(disk, memory" in plan


def test_near_pairs_no_cartesian(spark, allq):
    """Embedding near-dup pairs must come from the bucket equi-join —
    an all-pairs cartesian is the 100 TB failure mode."""
    plan = _simple(allq["sim_near_pairs"][0](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_single_python_stage(spark, allq):
    """Multimodal decode is ONE Arrow-batched Python stage directly
    over the scan: no exchange before it (per-row work needs no
    co-location) and no second Python round-trip."""
    plan = _simple(allq["multimodal_features"][0](spark, SF_DIR))
    assert plan.count("MapInPandas") + plan.count("ArrowEvalPython") == 1
    assert "Exchange hashpartitioning" not in plan


def test_q8_dimensions_broadcast(spark, allq):
    """Q8 market share joins 2 nations + region + part + supplier +
    customer + orders around lineitem — all dimension joins broadcast,
    no cartesian fallback."""
    plan = _simple(allq["q8_market_share"][0](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_q17_avg_subquery_broadcast(spark, allq):
    """Q17's per-part average quantity is a broadcast aggregate joined
    back to lineitem, not a correlated re-scan."""
    plan = _simple(allq["q17_small_quantity"][0](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_paragraph_dedup_no_segment_window(spark, allq):
    """First-occurrence selection must be the aggregate-min + join
    form: a window partitioned by the segment text would buffer every
    occurrence of a hot boilerplate segment in one task."""
    plan = _simple(allq["text_paragraph_dedup"][0](spark, SF_DIR))
    assert "windowspecdefinition(para" not in plan
    assert "CartesianProduct" not in plan


def test_capped_guard_family_plans_stay_bucketed(spark, allq):
    """The three boilerplate-guard queries must keep their join
    bucketed: no cartesian/nested-loop fallback, and the star branch
    must not introduce a window over the bucket key (which would
    re-concentrate the hot bucket in one task)."""
    for name in ("dedup_lsh_capped", "dedup_simhash_capped",
                 "sim_near_pairs_capped"):
        plan = _simple(allq[name][0](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "windowspecdefinition(band" not in plan, name
        assert "windowspecdefinition(bucket" not in plan, name
    # sim_near_pairs_capped's one BroadcastNestedLoopJoin is the
    # deliberate 1-row v0 crossJoin in the fixture corpus, not the
    # pair join — the pair join itself must be a hash/merge join
    plan = _simple(allq["dedup_lsh_capped"][0](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim_near_pairs_capped_query_composes_both_guards(spark, allq):
    """The headline query must compose BOTH boilerplate guards —
    identical-vector collapse AND the densification bucket cap. The
    r15 soak caught the collapse-only form at 20.5x wall for 10x
    data (densified buckets blow up the join output; collapse cannot
    bound near- but not-identical vectors). Pins: (a) the identical
    star edges are present (the %29 exact-copy group), (b) the cap is
    ACTIVE — strictly fewer pairs than the collapse-only A/B on the
    same corpus (3 of 16 post-collapse buckets exceed the cap on this
    fixture), (c) the cap never invents pairs (capped ⊆ collapse-only
    plus identical stars are shared)."""
    from pyspark.sql import functions as F

    from linz_bde_uploader_spark.operators.similarity import (
        embedding_near_pairs,
    )
    from linz_bde_uploader_spark.plans.tables import (
        load_table, parallelize_small,
    )

    capped = allq["sim_near_pairs_capped"][0](spark, SF_DIR)
    emb = parallelize_small(load_table(spark, SF_DIR, "embeddings"))
    v0 = F.broadcast(emb.filter(F.col("vec_id") == 0)
                     .select(F.col("embedding").alias("_v0")))
    corpus = emb.crossJoin(v0).select(
        "vec_id",
        F.when(F.col("vec_id") % 29 == 0, F.col("_v0"))
         .otherwise(F.col("embedding")).alias("embedding"))
    collapse_only = embedding_near_pairs(
        corpus, threshold=0.4, n_planes=4, dim=64,
        collapse_identical=True, max_bucket_size=None)
    c_rows = capped.collect()
    f_rows = collapse_only.collect()
    ident_c = {(r.id_a, r.id_b) for r in c_rows if r.cosine_sim == 1.0}
    ident_f = {(r.id_a, r.id_b) for r in f_rows if r.cosine_sim == 1.0}
    assert ident_c == ident_f and len(ident_c) > 0
    pairs_c = {(r.id_a, r.id_b) for r in c_rows}
    pairs_f = {(r.id_a, r.id_b) for r in f_rows}
    assert len(pairs_c) < len(pairs_f)  # the cap is live on this fixture
    # hub-star edges score hub-vs-member, a pair the exact all-pairs
    # join also emits when >= threshold — so no invented pairs
    assert pairs_c <= pairs_f


def test_full_diff_stays_key_shuffled_full_outer(spark, allq):
    """EP3 (-full-incremental): the table-vs-snapshot diff must stay
    ONE key-partitioned full-outer sort-merge join — the shape whose
    f1/f10/f30 slope the ETL soak pins (SCALE_SOAK.json
    etl_soak.*.fullinc_sec, linear after fixed costs). A nested-loop
    or cartesian fallback here is the canonical 100 TB incident: both
    sides are full table scans by construction (no change list
    exists — recovering it IS the mode), so the join strategy is the
    entire cost model."""
    plan = _simple(allq["full_diff"][0](spark, SF_DIR))
    assert "FullOuter" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the key's null filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(o_orderkey)]" in plan


def test_exact_survivorship_no_text_window(spark, allq):
    """First-occurrence selection for exact dedup must be the
    digest-aggregate + join form: a window partitioned by the text
    would buffer every copy of a hot boilerplate text in one task
    and shuffle whole documents as the sort key."""
    plan = _simple(allq["dedup_survivors"][0](spark, SF_DIR))
    assert "windowspecdefinition(text" not in plan
    assert "md5" in plan
