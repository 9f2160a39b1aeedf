"""Corpus sharding: materialize a training dataset as deterministic,
evenly-sized parquet shards.

The reference's only sink is a per-table bulk load
(/root/reference/lib/LINZ/BdeDatabase.pm:512-565); a training-data
pipeline additionally needs the *export* side — write the cleaned/
deduped corpus as shards that (a) are reproducible run-to-run,
(b) bound file sizes so downstream loaders stream them, and (c) land
grouped by a partition column (e.g. language) for selective reads.

Scale notes (100 TB):
- Shard assignment is a pure hash of the stable row key — no global
  sort, no sample-based range partitioner, no driver involvement.
- The shard id is a WRITER partition column: every (partition,
  shard) group lands in exactly one task (hash repartition), and
  dynamic partitioning splits a task's output per directory — so
  each group is exactly one file even if two groups hash-collide
  into the same task. File count and size are controlled by
  ``n_shards`` alone (plus ``maxRecordsPerFile`` as a guard rail).
- ``sortWithinPartitions`` costs a per-task in-memory sort only (no
  extra shuffle) and makes every shard internally ordered, which
  keeps parquet row-group stats tight for key-range reads.
- A deterministic pseudo-shuffle (``shuffle_col``) orders rows by a
  seeded hash — the "shuffle the corpus before training" pass —
  without ``rand()``'s run-to-run nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def assign_shards(df: DataFrame, key: str, n_shards: int,
                  seed: int = 0) -> DataFrame:
    """Add a deterministic shard id in [0, n_shards) hashed from
    ``key``. xxhash64 is a JVM-side expression (no UDF) and seeded,
    so re-runs and different engines agree."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.xxhash64(F.col(key), F.lit(seed))
    return df.withColumn(SHARD_COL, F.pmod(h, F.lit(n_shards)).cast("int"))


def shuffle_col(df: DataFrame, key: str, seed: int = 0,
                name: str = "shuffle_order") -> DataFrame:
    """Deterministic pseudo-random ordering column: sort by it to
    shuffle the corpus reproducibly (rand() changes between runs and
    retries; a seeded hash does not)."""
    return df.withColumn(name, F.xxhash64(F.col(key), F.lit(seed)))


def prepare_training_corpus(docs: DataFrame, benchmark: DataFrame,
                            out_path: str, text_col: str = "text",
                            id_col: str = "doc_id",
                            min_quality: float = 0.3,
                            decontam_ngram: int = 8,
                            chunk_tokens: int = 32, stride: int = 24,
                            n_shards: int = 8,
                            partition_by: list[str] | None = None,
                            seed: int = 0,
                            model_weights: list[float] | None = None,
                            model_bias: float = 0.0,
                            min_margin: float = 0.0) -> dict:
    """The whole data-prep chain as one lazy plan: quality filter →
    exact-dedup survivorship → benchmark decontamination →
    context-window chunking → deterministic shard export.

    Every stage is the corresponding standalone operator; composing
    them here keeps the intermediate DataFrames unmaterialized, so
    Catalyst plans the full chain at once (filters pushed into the
    scan; the benchmark shingle set broadcasts). Per-stage row counts
    for the run ledger come from ``Observation`` metrics collected
    DURING the shard-write action — not from separate ``count()``
    actions that would re-execute the quality/dedup/decontam chain
    (two extra full corpus passes at the 100 TB target). The only
    standalone count is ``n_input``, which parquet sources answer
    from footer metadata. Observations sit on single-consumer plan
    nodes only (the post-decontam and post-chunk frames); the
    twice-referenced frames (``kept`` feeds both the contamination
    probe and the anti-join) would double-count.
    """
    from pyspark.sql import Observation, Window

    from linz_bde_uploader_spark.operators import dedup as D
    from linz_bde_uploader_spark.operators.text_analysis import quality_score

    n_input = docs.count()

    # 1. quality gate (pure column expression, pushed into the scan)
    scored = docs.withColumn("quality", quality_score(F.col(text_col)))
    kept = scored.filter(F.col("quality") >= min_quality)

    # 2. exact-dedup survivorship: keep the lowest id per identical
    # text. Aggregate-min on the content digest + join back — NOT a
    # window over the text: min() collapses a boilerplate group
    # map-side before the exchange, and the shuffle key is a 16-byte
    # digest instead of the full document (same reasoning as
    # paragraph_dedup; a window would buffer every copy of a hot
    # text in one straggler task).
    h = F.md5(F.col(text_col))
    firsts = (kept.select(h.alias("_h"), F.col(id_col).alias("_mid"))
              .groupBy("_h").agg(F.min("_mid").alias("_keep")))
    kept = (kept.withColumn("_h", h).join(firsts, "_h")
            .filter(F.col(id_col) == F.col("_keep"))
            .drop("_h", "_keep"))

    # 3. decontamination: drop docs sharing any n-gram with the benchmark
    bench_sh = D._shingle_hashes(
        benchmark, text_col, id_col, decontam_ngram).select("h").distinct()
    doc_sh = D._shingle_hashes(kept, text_col, id_col, decontam_ngram)
    contaminated = (doc_sh.join(F.broadcast(bench_sh), "h")
                    .select(F.col("id").alias(id_col)).distinct())
    kept = kept.join(contaminated, id_col, "left_anti")

    # 3b. optional model-based quality gate (fastText-style linear
    # margin, operators/classifier.py): weights broadcast as an
    # n_features-row relation; docs below min_margin (or with no
    # features at all) drop. Composes after the rule gate the same
    # way production filters stack cheap-rule -> model.
    if model_weights is not None:
        from linz_bde_uploader_spark.operators import classifier as C
        wdf = docs.sparkSession.createDataFrame(
            [(i, float(w)) for i, w in enumerate(model_weights)],
            ["feat", "w"])
        feats = C.hashed_features(kept, text_col, id_col,
                                  len(model_weights))
        pass_ids = (C.score_margin(feats, wdf, bias=model_bias)
                    .filter(F.col("margin") >= min_margin)
                    .select(F.col("id").alias(id_col)))
        kept = kept.join(pass_ids, id_col, "left_semi")

    obs_kept = Observation("prep_n_kept")
    kept = kept.observe(obs_kept, F.count(F.lit(1)).alias("n"))

    # 4. chunking: stride/overlap windows over the token stream
    nt = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    chunks = (kept.withColumn("_nt", nt)
              .withColumn("start", F.explode(
                  F.sequence(F.lit(0), F.col("_nt") - 1, F.lit(stride))))
              .withColumn("chunk_len",
                          F.least(F.lit(chunk_tokens),
                                  F.col("_nt") - F.col("start")))
              .drop("_nt"))
    obs_chunks = Observation("prep_n_chunks")
    chunks = chunks.observe(obs_chunks, F.count(F.lit(1)).alias("n"))

    # 5. deterministic shard export (the ONE action for stages 1-5).
    # partition_values is pre-computed from the RAW input (a pruned
    # one-column scan), never from the observed chunk plan — counting
    # on that plan would re-run the whole chain and fire the
    # observations on the wrong action.
    npv = (docs.select(*partition_by).distinct().count()
           if partition_by else None)
    write_corpus_shards(chunks, out_path, key=id_col, n_shards=n_shards,
                        partition_by=partition_by, sort_within=id_col,
                        partition_values=npv, seed=seed)
    return {"n_input": n_input, "n_kept": obs_kept.get["n"],
            "n_chunks": obs_chunks.get["n"]}


def write_corpus_shards(df: DataFrame, path: str, key: str,
                        n_shards: int, partition_by: list[str] | None = None,
                        sort_within: str | None = None,
                        max_records_per_file: int = 0,
                        partition_values: int | None = None,
                        seed: int = 0) -> None:
    """Write ``df`` as ``n_shards`` deterministic parquet shards per
    partition value, hive-partitioned by ``partition_by + [shard]``.

    One repartition shuffle total, sized ``n_shards x
    |partition values|`` so distinct (partition, shard) groups don't
    funnel through the default ``spark.sql.shuffle.partitions``
    task count. The exactly-one-file-per-shard contract does NOT
    depend on that task mapping being collision-free: ``shard`` is a
    writer partition column, so dynamic partitioning splits each
    task's rows per output directory — a task that received two
    groups still writes two files, one per directory.

    ``partition_values``: expected distinct-count of ``partition_by``
    (sizes the shuffle). Pass it at scale to skip the count-distinct
    pre-pass; defaults to counting.
    """
    partition_by = partition_by or []
    out = assign_shards(df, key, n_shards, seed=seed)
    if partition_by:
        npv = partition_values if partition_values is not None else (
            df.select(*partition_by).distinct().count())
    else:
        npv = 1
    out = out.repartition(n_shards * max(1, npv),
                          *(partition_by + [SHARD_COL]))
    if sort_within is not None:
        out = out.sortWithinPartitions(*partition_by, SHARD_COL, sort_within)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer = writer.partitionBy(*partition_by, SHARD_COL)
    writer.parquet(path)


def pack_sequences(chunks: DataFrame, budget: int, key: str = "doc_id",
                   order: list[str] | None = None,
                   len_col: str = "chunk_len",
                   n_shards: int = 64) -> DataFrame:
    """Token-budget sequence packing: assign chunk rows greedily to
    fixed-budget training sequences (``bin``) by cumulative token
    count. Packing is inherently sequential, so it runs PER SHARD
    (deterministic hash of ``key``): each shard's running-sum window
    is an independent partition — |shards|-way parallel, no global
    sort. ``n_shards`` trades parallelism against cross-shard
    bin-fill fragmentation (each shard's final bin may be partially
    filled); size it to O(cluster cores) at scale.

    ``order`` MUST be a unique ordering of the rows within each
    shard (e.g. ``[doc_id, start]`` for chunk rows): the running sum
    uses an explicit ROWS frame, so with ties the within-tie row
    order — and therefore the bin assignment — would depend on
    partition-internal sort stability and not be reproducible
    run-to-run. (A RANGE frame would be worse: every tied row would
    receive the full peer-group sum and bins could overfill far past
    ``budget + max_chunk``.) ``order`` is therefore required — a
    caller who cannot name a unique ordering cannot get reproducible
    bins, and the old silent default of ``[key]`` (only unique with
    at most one chunk per key) hid exactly that bug."""
    from pyspark.sql import Window

    from linz_bde_uploader_spark.functions.hashing import hash32

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if not order:
        raise ValueError(
            "pack_sequences requires an explicit `order`: columns that "
            "uniquely order rows within each shard (e.g. [key, 'start']) "
            "— bin assignment is not reproducible otherwise")
    sharded = chunks.withColumn(
        "shard",
        F.pmod(hash32(F.col(key).cast("string")), F.lit(n_shards))
        .cast("int"))
    w = (Window.partitionBy("shard").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return sharded.withColumn(
        "bin", F.floor((F.sum(len_col).over(w) - F.col(len_col))
                       / budget).cast("int"))


def write_range_ordered(df: DataFrame, path: str, order_col: str,
                        n_parts: int = 8) -> None:
    """Globally ordered parquet export WITHOUT the single-task global
    sort: ``repartitionByRange`` samples range boundaries (one
    lightweight sampling pass), every partition sorts locally in
    parallel, and part files inherit disjoint, ascending key ranges —
    so reading files in name order replays the global order. This is
    the Spark-native contract for 'corpus sorted by length/score/id'
    exports at 100 TB: an ``orderBy().coalesce(1)`` style export
    funnels everything through one task; this shape is
    embarrassingly parallel with only the boundary sample
    centralized. Callers needing a total order ACROSS files rely on
    the disjoint-range property (asserted in
    tests/test_corpus.py::test_write_range_ordered_global_order)."""
    (df.repartitionByRange(n_parts, F.col(order_col))
       .sortWithinPartitions(order_col)
       .write.mode("overwrite").parquet(path))


def contrastive_triplets(corpus: DataFrame, pos: DataFrame,
                         clusters: DataFrame, id_col: str = "doc_id",
                         pool_buckets: int = 32, pool_per_bucket: int = 4,
                         n_probes: int = 3) -> DataFrame:
    """(anchor, positive, negative) triplet mining for embedding-model
    training. ``pos`` supplies verified positive pairs (id_a, id_b);
    ``clusters`` (id, cluster_id) is the near-dup component map used
    as the leakage guard: a probe sequence (k = 0..n_probes-1) walks
    a deterministic negative pool until the candidate shares no
    cluster with the anchor and is neither endpoint; a triplet whose
    probes all leak is dropped (deterministic, never random).

    Scale shape — the negative pool is bounded by absolute SIZE, not
    by a sample rate: each doc hashes into one of ``pool_buckets``
    buckets and only the ``pool_per_bucket`` smallest (by a second,
    independent hash — i.e. a uniform draw) survive per bucket via
    the salted two-phase ``grouped_topk``, so the pool never exceeds
    ``pool_buckets * pool_per_bucket`` rows NO MATTER the corpus
    size, and no global window exists anywhere (an earlier revision
    ranked a rate-sampled pool with one global ``row_number`` and
    force-broadcast it — a single-task sort plus an OOM at 100x; a
    rate bounds the fraction, not the size). Probing is a plain
    (bucket, within-bucket-rank) equi-join against the pool; the
    only forced broadcast is the per-bucket size relation
    (<= pool_buckets rows, bounded by construction). The
    cluster-membership joins are left to AQE — the clusters relation
    is corpus-sized in the worst case, exactly the broadcast
    SCALE.md's docs_split_leakage_safe entry calls the 100 TB
    mistake. Shrinking the pool degrades triplet yield gracefully
    (more probes leak or self-collide) but never silently: the drop
    is deterministic per pair."""
    from linz_bde_uploader_spark.functions.hashing import hash32
    from linz_bde_uploader_spark.operators.topk import grouped_topk

    ids = F.col(id_col).cast("string")
    cand = corpus.select(
        F.col(id_col).alias("neg_id"),
        F.pmod(hash32(F.concat(F.lit("np:"), ids)),
               F.lit(pool_buckets)).alias("b"),
        hash32(F.concat(F.lit("po:"), ids)).alias("o"))
    pool = (
        grouped_topk(cand, ["b"], [F.col("o").asc(), F.col("neg_id").asc()],
                     pool_per_bucket,
                     salt_expr=F.xxhash64(F.col("neg_id").cast("string")),
                     n_salts=32)
        .select("neg_id", "b", (F.col("rank") - 1).alias("r")))
    bsz = pool.groupBy("b").agg(F.count("*").alias("bn"))
    h = hash32(F.concat(F.lit("neg:"), F.col("id_a").cast("string"),
                        F.lit(":"), F.col("id_b").cast("string")))
    hk = hash32(F.concat(F.lit("negr:"), F.col("id_a").cast("string"),
                         F.lit(":"), F.col("id_b").cast("string"),
                         F.lit(":"), F.col("k").cast("string")))
    probes = (
        pos.select("id_a", "id_b",
                   F.explode(F.array(*[F.lit(i) for i in range(n_probes)]))
                   .alias("k"))
        .withColumn("b", F.pmod(h + F.col("k"), F.lit(pool_buckets)))
        .join(F.broadcast(bsz), "b")
        .withColumn("r", F.pmod(hk, F.col("bn")))
        .join(pool, ["b", "r"]))
    ca = clusters.select(F.col("id").alias("id_a"),
                         F.col("cluster_id").alias("cl_a"))
    cn = clusters.select(F.col("id").alias("neg_id"),
                         F.col("cluster_id").alias("cl_n"))
    ok = (
        probes.join(ca, "id_a", "left")
        .join(cn, "neg_id", "left")
        .filter((F.col("neg_id") != F.col("id_a"))
                & (F.col("neg_id") != F.col("id_b"))
                & (F.col("cl_n").isNull() | F.col("cl_a").isNull()
                   | (F.col("cl_n") != F.col("cl_a")))))
    return (
        ok.groupBy("id_a", "id_b")
        .agg(F.min_by("neg_id", "k").alias("negative_id"))
        .select(F.col("id_a").alias("anchor_id"),
                F.col("id_b").alias("positive_id"), "negative_id")
    )


def weighted_sample(df: DataFrame, group_cols: list[str],
                    weight_col: str, k: int,
                    id_col: str = "doc_id",
                    invalid_weights: str = "error") -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each row draws u in (0,1] from the
    portable hash of its id and competes on the key u^(1/w) — the k
    largest keys per group are a weight-proportional sample. We rank
    DESCENDING on the log-monotone form ln(u)/w (maximizing u^(1/w)
    is maximizing ln(u)/w), with ln rounded to 12 dp for
    cross-engine determinism (ORACLE.md idiom) and the id as
    tiebreaker.

    Scale shape: one narrow projection (hash + two IEEE ops), then
    the salted two-phase grouped_topk — no global window, no RNG (a
    hash-derived u makes retries/replays/differential tests see the
    SAME sample, the property rand(seed) cannot give across engine
    boundaries). This is the token-weighted document sampler a
    training-mix pipeline uses (w = token/char count => long docs
    proportionally likelier, sampling without replacement).

    Returns the sampled rows with a 1-based ``rank`` per group."""
    from linz_bde_uploader_spark.functions.hashing import hash60
    from linz_bde_uploader_spark.operators.topk import grouped_topk

    u = (hash60(F.col(id_col).cast("string")) + F.lit(1)) \
        .cast("double") / F.lit(1152921504606846976.0)
    w = F.col(weight_col).cast("double")
    sk = F.round(F.log(u), 12) / w
    # Guard the contract, not just the caller: a NULL or w <= 0
    # weight would produce a NULL/inverted sort key and silently
    # corrupt the sample's weight-proportionality. A-Res is defined
    # over positive weights only. Default is LOUD: a bad weight
    # raises at execution (distributed, lazy — no driver action at
    # construction), so a caller feeding bad weights cannot get a
    # quietly smaller, differently-composed sample.
    # ``invalid_weights="drop"`` restores the documented filter for
    # callers that pre-declare the exclusion as intended semantics.
    valid = w.isNotNull() & (w > 0)
    if invalid_weights == "error":
        # the guard lives INSIDE the consumed sort-key expression —
        # an assert in a separate projected-away column would be
        # pruned by Catalyst and never evaluated
        keyed = df.withColumn("_sk", F.when(valid, sk).otherwise(
            F.raise_error(F.concat(
                F.lit("weighted_sample: NULL or non-positive "
                      f"{weight_col} for {id_col}="),
                F.col(id_col).cast("string")))))
    elif invalid_weights == "drop":
        keyed = df.filter(valid).withColumn("_sk", sk)
    else:
        raise ValueError(
            f"invalid_weights must be 'error' or 'drop', "
            f"got {invalid_weights!r}")
    return (grouped_topk(keyed, list(group_cols),
                         [F.col("_sk").desc(), F.col(id_col).asc()],
                         k, salt_expr=hash60(F.col(id_col)
                                             .cast("string")))
            .drop("_sk"))
