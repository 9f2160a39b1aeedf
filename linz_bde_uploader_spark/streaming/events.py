"""Structured Streaming operators.

The reference is strictly batch (SURVEY.md §2.8) — its "incremental"
mode is batch CDC gated by watermark columns. Several streaming
surfaces are still natural re-expressions (the upload loop itself —
``streaming_cdc_upload`` with maintained views, the dedup-on-ingest
drain, the windowed distinct-count sketch ``stream_hll_counts`` —
plus the event-analytics operators below):

1. ``stream_repository`` — the poll-run loop over the BDE repository
   as a file stream with the ``availableNow`` trigger: each trigger
   processes any dataset directories that appeared since the last
   checkpoint, which is exactly the reference's
   last_upload_dataset watermark semantics, with exactly-once
   bookkeeping handled by the checkpoint instead of bde_control.

2. event-stream analytics used by the pipeline suite, expressed over
   any streaming DataFrame with event-time watermarks:
   - ``windowed_counts``: tumbling-window count/sum with late-data
     tolerance (maps to the batch events_window_agg query);
   - ``sessionize``: session windows with a gap timeout
     (F.session_window — Spark's native stateful session operator;
     maps to the batch events_sessionize query).

Scale notes: windowed aggregations are stateful — state lives in the
state store keyed by (window, group); watermarks bound state size.
``session_window`` merges per-key sessions in the state store without
a Python round-trip. maxFilesPerTrigger bounds per-batch work on the
file stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_repository(spark: SparkSession, root: str, level: int,
                      schema: T.StructType, file_tag: str = "*",
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File stream over ``<root>/level_<n>/<dataset>/<tag>.crs`` text
    lines, tagged with their dataset id via input_file_name().

    S1/S2 as a stream: new dataset dirs are discovered per trigger;
    the checkpoint replaces the ledger watermark. ``file_tag`` scopes
    the stream to ONE table's file (a dataset directory mixes files of
    different schemas — e.g. the xaud changeset next to pab1 data — so
    an unscoped stream must parse per-file, not with one schema)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(f"{root}/level_{level}/*/{file_tag}.crs")
    dataset = F.regexp_extract(F.input_file_name(), r"/(\d{14})/[^/]+$", 1)
    return lines.withColumn("dataset", dataset)


def parse_crs_stream(lines: DataFrame, schema: T.StructType) -> DataFrame:
    """Streaming variant of the .crs data parse: data rows carry a
    trailing '|'; header lines are dropped by the same predicate used
    in the batch reader (sources/crs.py)."""
    ncols = len(schema.fields)
    parts = F.split(F.col("value"), r"\|", -1)
    data = lines.filter(F.col("value").endswith("|")) \
                .filter(F.size(parts) == ncols + 1)
    exprs = []
    for i, field in enumerate(schema.fields):
        raw = F.element_at(parts, i + 1)
        # try_cast: a malformed row must not kill a long-running
        # stream (the batch reader enforces the error budget instead)
        val = F.when(raw == "", F.lit(None)).otherwise(raw) \
               .try_cast(field.dataType)
        exprs.append(val.alias(field.name))
    return data.select("dataset", *exprs)


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """``withWatermark`` requires TIMESTAMP (LTZ) event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), but parquet naive
    timestamps read as TIMESTAMP_NTZ under Spark 4's default
    ``inferTimestampNTZ``. Cast when needed — with the repo's session
    tz pinned to UTC the naive wall clock becomes the same UTC
    instant, and on an already-LTZ column this is a no-op."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    group_col: str = "event_type",
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window aggregate with late-data watermark.

    State is bounded: windows older than the watermark are finalized
    and evicted. Works identically on a batch DataFrame (watermark is
    a no-op there), which is how the oracle checks it."""
    return (
        ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(group_col))
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                group_col, "n", "sum_value")
    )


def sessionize(events: DataFrame, ts_col: str = "ts",
               key_col: str = "user_id", gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Session windows per key with an inactivity gap — Spark's native
    stateful session operator (state-store merge, no Python UDF)."""
    return (
        ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(key_col,
                F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
                "n_events")
    )


def stream_dedup(docs: DataFrame, ts_col: str = "ts",
                 text_col: str = "text",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication: keep the first occurrence of
    each content digest; drop re-arrivals while the digest is still
    in state (``dropDuplicatesWithinWatermark``).

    The batch exact-dedup (operators/dedup.py) needs the whole corpus;
    this is its always-on form for ingest pipelines: state holds one
    16-byte digest per distinct document and is EVICTED once the
    event-time watermark passes first_seen + delay — bounded state, so
    the stream survives unbounded input. The guarantee is one-sided by
    design (duplicates within the watermark window are always dropped;
    re-arrivals after eviction pass through and are left to the
    periodic batch dedup pass)."""
    return (
        ensure_event_time(docs, ts_col)
        .withColumn("content_hash", F.sha2(F.col(text_col), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("content_hash")
    )


def stream_interval_join(left: DataFrame, right: DataFrame,
                         left_ts: str, right_ts: str, key: str,
                         lookback_s: int = 1800, lookahead_s: int = 0,
                         watermark: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events on the same key whose timestamp falls in
    [left_ts - lookback, left_ts + lookahead] — the always-on form of
    operators/rangejoin.interval_join (e.g. views in the 30 minutes
    before each purchase, as the purchases arrive).

    Both inputs carry event-time watermarks and the range predicate
    compares the two event-time columns directly, which is what lets
    Spark bound join state: a buffered right row is evicted once the
    left watermark passes right_ts + lookback, and vice versa.
    Without the time-range condition the state store would hold both
    streams forever. Inner join only (the streaming-supported mode
    for both sides being streams on all Spark versions we target);
    the batch operator covers outer variants."""
    l = ensure_event_time(left, left_ts) \
        .withWatermark(left_ts, watermark).alias("l")
    r = ensure_event_time(right, right_ts) \
        .withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} "
        f"AND r.{right_ts} >= l.{left_ts} - INTERVAL {int(lookback_s)} seconds "
        f"AND r.{right_ts} <= l.{left_ts} + INTERVAL {int(lookahead_s)} seconds")
    return l.join(r, cond, "inner").drop(F.col(f"r.{key}"))


CONTINUITY_OUTPUT = T.StructType([
    T.StructField("table", T.StringType()),
    T.StructField("dataset", T.StringType()),
    T.StructField("gap_hours", T.DoubleType()),
    T.StructField("status", T.StringType()),
])

CONTINUITY_STATE = T.StructType([
    T.StructField("last_end", T.DoubleType()),   # epoch seconds of last END
])


def continuity_check(files: DataFrame, warn_hours: float = 0.5,
                     fail_hours: float = 0.0) -> DataFrame:
    """Custom stateful operator: the level-5 start-time continuity
    check as a keyed stream (applyInPandasWithState).

    The reference warns/fails when a level-5 file's START timestamp
    differs from the previous file's recorded END by more than the
    configured tolerance (lib/LINZ/BdeUpload.pm:1070-1100; conf
    level5_starttime_warn/fail_tolerance). Batch mode keeps that
    watermark in bde_control.upload_table.last_upload_details; here
    the per-table state store holds it, so an always-on stream flags
    gaps the moment a dataset arrives.

    Input: a (streaming) DataFrame (table, dataset, start_ts, end_ts)
    with epoch-second doubles. State per table: last END. Output one
    row per file: gap_hours = |START - last_END| / 3600 and status
    ok|warning|fail (first file of a table is 'ok', gap 0). fail_hours
    <= 0 disables the fail tier (reference default).

    Scale shape: state is two doubles per table (~91 keys) — the
    state store cost is negligible; the operator exists for its
    exactly-once, per-key sequential semantics, not its size.
    """
    import pandas as pd

    def step(key, pdf_iter, state):
        last_end = state.get[0] if state.exists else None
        rows = pd.concat(list(pdf_iter)).sort_values("dataset")
        out = []
        for r in rows.itertuples():
            if last_end is None:
                gap, status = 0.0, "ok"
            else:
                gap = abs(r.start_ts - last_end) / 3600.0
                if fail_hours > 0 and gap > fail_hours:
                    status = "fail"
                elif gap > warn_hours:
                    status = "warning"
                else:
                    status = "ok"
            out.append((key[0], r.dataset, round(gap, 6), status))
            last_end = r.end_ts
        state.update((last_end,))
        yield pd.DataFrame(out, columns=["table", "dataset", "gap_hours", "status"])

    return files.groupBy("table").applyInPandasWithState(
        step, CONTINUITY_OUTPUT, CONTINUITY_STATE,
        outputMode="append", timeoutConf="NoTimeout")


def streaming_cdc_upload(spark: SparkSession, root: str, store,
                         table_name: str, key: str,
                         schema: T.StructType, file_tag: str,
                         checkpoint: str,
                         max_files_per_trigger: int | None = None,
                         view_group_cols: list[str] | None = None,
                         view_value_col: str | None = None,
                         view_minmax: bool = False,
                         view_join: dict | None = None,
                         view_hll_key: str | None = None,
                         view_cms_key: str | None = None,
                         view_topk: int | None = None,
                         view_distinct_col: str | None = None,
                         use_dataset_transaction: bool = False) -> None:
    """The poll-run upload loop as a stream: watch the level_5
    repository, and for every micro-batch of new dataset files run the
    REAL CDC merge (classify -> apply) against the versioned store via
    ``foreachBatch``.

    This is the Structured-Streaming re-expression of EP2: the
    checkpoint supplies the last_upload_dataset watermark (exactly-once
    per dataset file), foreachBatch supplies the batch-only operations
    (the keyed merge against the store) a pure streaming plan can't
    express. The stream triggers on the table's data file; the sibling
    xaud changeset is read batch-side from the same dataset directory
    (the completeness gate guarantees they arrive together). Datasets
    inside one micro-batch apply in dataset order, preserving the
    reference's sequential semantics; ``maxFilesPerTrigger`` bounds
    per-batch work.

    With ``view_group_cols``/``view_value_col`` set, a continuously-
    maintained aggregate view ``<table>__agg`` refreshes alongside
    every merge via the O(changes) delta algebra
    (operators/merge.maintain_aggregate): the STORED view is the old
    state, so each refresh touches only changed-key rows — a
    streaming materialized view. foreachBatch is at-least-once, so
    each view write sits behind a dataset-stamp replay guard (the
    store's C8 revision comment doubles as the watermark) and the
    base-table write comes last; a replayed batch either re-derives
    the identical delta from the still-pre-merge base or is skipped
    by the stamp — exactly-once view maintenance without any
    cross-table transaction. ``view_minmax=True`` additionally
    maintains ``<table>__minmax`` through the partial-refresh path
    (operators/merge.maintain_extrema): untouched groups carry
    forward from the stored view, touched groups recompute from the
    post-merge state.

    ``view_hll_key`` (requires ``view_group_cols``) additionally
    maintains a per-group distinct-count sketch view ``<table>__hll``
    (operators/sketches.maintain_hll — register max-merge on
    insert-only groups, touched-group recompute on row loss), the
    streaming distinct-users-per-segment materialization.

    ``view_cms_key`` additionally maintains a count-min frequency
    sketch view ``<table>__cms`` (operators/sketches.maintain_cms —
    a LINEAR sketch: deletes subtract, inserts add, no recompute
    branch at any granularity), the streaming token-frequency
    materialization. Needs no group columns.

    ``view_topk`` / ``view_distinct_col`` additionally maintain the
    per-group leaderboard ``<table>__topk`` (merge.maintain_topk,
    k rows per group, value DESC / key ASC total order) and the exact
    count-distinct ``<table>__distinct`` (merge.maintain_distinct,
    last-holder deletes recompute touched groups) — the same
    touched-group partial-refresh discipline as minmax/hll.

    ``view_join`` (keys: ``dim`` DataFrame, ``fact_col``, ``dim_col``,
    ``fact_cols``, ``dim_cols``) additionally maintains an enriched
    join view ``<table>__join`` via the delta-join rule
    (operators/merge.maintain_join): the stored view minus the
    batch's D/U/X keys plus the staged delta joined to the static
    dimension — per micro-batch the view refresh is O(|changes|) and
    never re-joins the base table. Same replay-guard discipline as
    the other views.
    """
    from linz_bde_uploader_spark.operators import merge as M
    from linz_bde_uploader_spark.operators.view_refresh import (
        ViewSpec, refresh_views, seed_views,
    )
    from linz_bde_uploader_spark.sources.crs import read_crs

    lines = stream_repository(spark, root, 5, schema, file_tag,
                              max_files_per_trigger)
    parsed = parse_crs_stream(lines, schema)

    # the replay guard + per-family maintenance live in
    # operators/view_refresh.py, SHARED with the batch CLI driver so
    # the two upload paths cannot drift (its module docstring carries
    # the ordered-guard correctness argument)
    spec = ViewSpec(group_cols=view_group_cols, value_col=view_value_col,
                    minmax=view_minmax, join=view_join,
                    hll_key=view_hll_key, cms_key=view_cms_key,
                    topk=view_topk, distinct_col=view_distinct_col)

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        batch = batch.cache()
        try:
            datasets = sorted(r["dataset"] for r in
                              batch.select("dataset").distinct().collect())
            for ds in datasets:
                stg = batch.filter(F.col("dataset") == ds) \
                           .select(*[f.name for f in schema.fields])
                if not store.exists(table_name):
                    # bootstrap: direct-recompute seed of every view,
                    # forced — a freshly-created base invalidates any
                    # leftover view state whatever its stamp says.
                    # Under the dataset transaction the base + seeds
                    # flip together, same as the CDC branch below.
                    with store.dataset_scope(use_dataset_transaction):
                        store.write(table_name, stg, key=key, dataset=ds)
                        seed_views(store, table_name, stg, ds, spec,
                                   key, force=True)
                    continue
                cur = store.read(spark, table_name)
                chg = M.prepare_change_table(
                    read_crs(spark, f"{root}/level_5/{ds}/xaud.crs"),
                    table_name)
                # carry view group columns (free in the classify
                # join) so partial-refresh views derive touched
                # groups O(changes) — same wiring as the batch driver
                carry = (sorted(set(spec.group_cols))
                         if spec.group_cols else None)
                actions = M.classify_actions(cur, stg, chg, key,
                                             cur.columns,
                                             carry_cols=carry).cache()
                merged = M.apply_actions(cur, stg, actions, key)
                # Views refresh BEFORE the base write, each behind its
                # dataset-stamp replay guard (see refresh_view). The
                # base write must come last: once the base is merged a
                # replay classifies all-'0' and the view delta is no
                # longer derivable, so any view still lagging at that
                # point would stay stale forever. With views-first +
                # guard, every crash window replays to the same state.
                # ``use_dataset_transaction`` additionally stages the
                # view + base flips and commits them TOGETHER (the C4
                # store scope the batch driver shares): atomic
                # view/base visibility per dataset on top of the
                # guard's replay correctness — the guard stays
                # load-bearing for foreachBatch redelivery either way.
                try:
                    with store.dataset_scope(use_dataset_transaction):
                        refresh_views(spark, store, table_name, cur,
                                      stg, actions, merged, ds, spec,
                                      key)
                        store.write(table_name, merged, key=key,
                                    dataset=ds)
                finally:
                    actions.unpersist()
        finally:
            batch.unpersist()

    q = (
        parsed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_corpus_prep(docs: DataFrame, benchmark: DataFrame,
                       out_path: str, checkpoint: str,
                       ts_col: str = "ts", text_col: str = "text",
                       id_col: str = "doc_id",
                       min_quality: float = 0.3, decontam_ngram: int = 8,
                       chunk_tokens: int = 32, stride: int = 24,
                       watermark: str = "1 hour",
                       model_weights: list[float] | None = None,
                       model_bias: float = 0.0,
                       min_margin: float = 0.0):
    """Always-on training-corpus ingestion: the streaming form of
    ``operators/corpus.prepare_training_corpus``.

    Engine-native stages run in the stream: the quality gate is a
    stateless column filter, exact dedup is
    ``dropDuplicatesWithinWatermark`` keyed on the content digest
    (state = one 16-byte digest per in-window distinct document,
    watermark-evicted). Decontamination + chunking + the shard append
    run per micro-batch inside ``foreachBatch`` using the SAME batch
    operators the offline chain uses — the benchmark shingle set is a
    static relation broadcast into each batch's anti join, exactly
    like the offline plan, and the sink append is covered by the
    checkpoint for exactly-once. ``benchmark`` is a static DataFrame.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from linz_bde_uploader_spark.operators import dedup as D
    from linz_bde_uploader_spark.operators.text_analysis import quality_score

    scored = (docs.withColumn("quality", quality_score(F.col(text_col)))
              .filter(F.col("quality") >= min_quality))
    deduped = stream_dedup(scored, ts_col, text_col, watermark)
    bench_sh = D._shingle_hashes(
        benchmark, text_col, id_col, decontam_ngram).select("h").distinct()
    wdf = None
    if model_weights is not None:
        # static weight relation, broadcast into every micro-batch's
        # margin join — same stage shape as the offline chain's 3b
        wdf = docs.sparkSession.createDataFrame(
            [(i, float(w)) for i, w in enumerate(model_weights)],
            ["feat", "w"])

    def prep_batch(batch: DataFrame, _batch_id: int) -> None:
        contaminated = (
            D._shingle_hashes(batch, text_col, id_col, decontam_ngram)
            .join(F.broadcast(bench_sh), "h")
            .select(F.col("id").alias(id_col)).distinct())
        kept = batch.join(contaminated, id_col, "left_anti")
        if wdf is not None:
            from linz_bde_uploader_spark.operators import classifier as C
            feats = C.hashed_features(kept, text_col, id_col,
                                      len(model_weights))
            pass_ids = (C.score_margin(feats, wdf, bias=model_bias)
                        .filter(F.col("margin") >= min_margin)
                        .select(F.col("id").alias(id_col)))
            kept = kept.join(pass_ids, id_col, "left_semi")
        nt = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        chunks = (
            kept.withColumn("_nt", nt)
            .withColumn("start", F.explode(
                F.sequence(F.lit(0), F.col("_nt") - 1, F.lit(stride))))
            .withColumn("chunk_len",
                        F.least(F.lit(chunk_tokens),
                                F.col("_nt") - F.col("start")))
            .drop("_nt"))
        chunks.write.mode("append").parquet(out_path)

    return (
        deduped.writeStream.foreachBatch(prep_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_lsh_dedup(docs: DataFrame, index_path: str, out_path: str,
                     checkpoint: str, text_col: str = "text",
                     id_col: str = "doc_id", num_perm: int = 16,
                     bands: int = 4, shingle_words: int = 3):
    """Always-on NEAR-deduplication against an incremental LSH index.

    Per micro-batch: compute each doc's MinHash band hashes
    (operators/dedup.lsh_band_hashes), drop docs that collide with
    the persistent index (near-dups of anything already ingested) or
    with an earlier doc of the same batch (min id per bucket
    survives), append survivors to ``out_path`` and THEIR band rows
    to ``index_path``. Matching history is one equi-join on (band,
    band_hash) — the index holds bands*1 rows per ingested doc, never
    signatures or text, so it stays a small fraction of corpus size
    and the probe broadcasts or hash-joins as AQE sees fit.

    Guarantees are candidate-level, like LSH itself: a band collision
    means probable near-dup (no verify step — the offline verified
    pipeline, ``dedup_near_survivors``, is the exact backstop).
    Replays are IDEMPOTENT: each batch writes its survivors and index
    rows into a ``batch=<querytag>x<id>`` subdirectory with
    ``overwrite``, so a crash between the two writes (or a
    foreachBatch redelivery) just rewrites the same subdirectories —
    no at-least-once duplicates in the output corpus, and no
    duplicated index keys. The history probe lists the index's
    ``batch=*`` directories explicitly and EXCLUDES the current
    batch's own — on a redelivery after both writes already succeeded
    (crash before the checkpoint commit), a whole-root read would
    match every survivor of the batch against its own just-written
    index rows, classify the entire batch as historical dups, and the
    ``overwrite`` would replace the previously written survivors with
    an empty set; excluding the self directory makes the replay
    recompute exactly the original kept set. The ``querytag`` (hash of the checkpoint
    path) is load-bearing: batch ids are PER-CHECKPOINT, so without
    it a fresh query writing into an existing index would restart at
    batch 0 and silently overwrite another query's history. Readers
    see the whole corpus/index via normal parquet partition discovery
    over the root path; ``compact_lsh_index`` bounds the directory
    count. This is the near-dup analog of ``stream_dedup``'s
    one-sided exact guarantee.

    Returns the started StreamingQuery (caller awaits/stops)."""
    import hashlib

    from linz_bde_uploader_spark.operators.dedup import lsh_band_hashes

    qtag = hashlib.md5(checkpoint.encode()).hexdigest()[:8]

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        bh = lsh_band_hashes(batch, text_col, id_col, num_perm, bands,
                             shingle_words)
        # explicit existence probe (Hadoop FS, so non-local paths work
        # too) — a bare try/except here would silently treat corrupt
        # footers or transient FS errors as "no index yet" and admit
        # near-duplicates with no signal; real read errors propagate
        jpath = spark._jvm.org.apache.hadoop.fs.Path(index_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        self_dir = f"batch={qtag}x{batch_id}"
        hist_dirs = []
        if fs.exists(jpath):
            # list batch=* dirs and read all EXCEPT this batch's own:
            # on replay the self directory already holds this batch's
            # index rows and must not be probed against itself
            hist_dirs = [
                st.getPath().toString()
                for st in fs.listStatus(jpath)
                if st.isDirectory()
                and st.getPath().getName().startswith("batch=")
                and st.getPath().getName() != self_dir]
        if hist_dirs:
            idx = spark.read.parquet(*hist_dirs) \
                .select("band", "band_hash").distinct()
            hist_hits = bh.join(idx, ["band", "band_hash"]) \
                          .select("id").distinct()
        else:  # first batch: no history yet
            hist_hits = bh.select("id").limit(0)
        keep_first = bh.groupBy("band", "band_hash") \
                       .agg(F.min("id").alias("keep_id"))
        batch_dups = (
            bh.join(keep_first, ["band", "band_hash"])
            .filter(F.col("id") != F.col("keep_id"))
            .select("id").distinct())
        drop = hist_hits.union(batch_dups).distinct() \
            .withColumnRenamed("id", id_col)
        kept = batch.join(drop, id_col, "left_anti")
        kept.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={qtag}x{batch_id}"))
        bh.join(drop.withColumnRenamed(id_col, "id"), "id", "left_anti") \
          .write.mode("overwrite").parquet(
              os.path.join(index_path, f"batch={qtag}x{batch_id}"))

    return (
        docs.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_lsh_index(spark: SparkSession, index_path: str,
                      keep_last: int = 1) -> int:
    """Small-files maintenance for the ``stream_lsh_dedup`` index: the
    idempotent per-batch layout accretes one ``batch=<n>`` directory
    per trigger, and an always-on stream means listing thousands of
    footers per history probe. Consolidate every batch directory
    except the ``keep_last`` most recent PER QUERY TAG into one
    distinct-rows directory named ``batch=c<generation>``.

    Replay safety: Structured Streaming only redelivers batches not
    yet committed to the checkpoint — at most the most recent one per
    query — so with ``keep_last >= 1`` a replayed overwrite can never
    target a compacted directory, and the consolidated directory's
    name (prefix ``c``) is outside the ``<tag>x<n>`` namespace. Prior
    consolidated dirs are folded in every time, so repeated
    compaction converges to one consolidated dir instead of
    accreting them. Dedup semantics are unchanged: the probe reads
    (band, band_hash) rows regardless of file layout. Concurrency:
    the consolidated directory becomes VISIBLE (rename to
    ``batch=c<gen>``) before any victim is deleted, so a stream's
    probe running concurrently always sees a superset of the history
    — a transient duplicate row is harmless (the probe does
    ``distinct``), whereas the reverse order would open a window
    where compacted history is missing and near-duplicates slip
    through. All file ops go through the Hadoop FS API, matching the
    probe, so non-local index paths work. Returns the number of
    source directories compacted."""
    import re

    jroot = spark._jvm.org.apache.hadoop.fs.Path(index_path)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    jp = spark._jvm.org.apache.hadoop.fs.Path
    entries = sorted(
        st.getPath().getName() for st in fs.listStatus(jroot)
        if st.isDirectory())
    tagged: dict[str, list[tuple[int, str]]] = {}
    for e in entries:
        if m := re.fullmatch(r"batch=(\w{8})x(\d+)", e):
            tagged.setdefault(m.group(1), []).append((int(m.group(2)), e))
    compacted = [(int(m.group(1)), e) for e in entries
                 if (m := re.fullmatch(r"batch=c(\d+)", e))]
    victims = []
    for runs in tagged.values():
        runs.sort()
        victims += [e for _, e in (runs[:-keep_last] if keep_last else runs)]
    if not victims and len(compacted) <= 1:
        return 0  # nothing to consolidate
    victims += [e for _, e in compacted]
    gen = (max((n for n, _ in compacted), default=0)) + 1
    paths = [os.path.join(index_path, e) for e in victims]
    merged = spark.read.parquet(*paths).distinct()
    # underscore prefix keeps the in-progress dir invisible to Spark's
    # partition discovery until the rename publishes it
    tmp_out = os.path.join(index_path, f"_compact_c{gen}")
    merged.write.mode("overwrite").parquet(tmp_out)
    if not fs.rename(jp(tmp_out), jp(os.path.join(index_path,
                                                  f"batch=c{gen}"))):
        raise IOError(f"compact rename failed: {tmp_out}")
    for p in paths:  # only after the consolidated dir is visible
        fs.delete(jp(p), True)
    return len(victims)


def run_available_now(stream_df: DataFrame, checkpoint: str, out_path: str,
                      output_mode: str = "append") -> None:
    """Drain everything currently available, then stop — the streaming
    equivalent of one reference upload run."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_drift_monitor(spark: SparkSession, src_dir: str, store,
                         name: str, checkpoint: str, schema,
                         source_col: str = "source",
                         len_col: str = "n_chars",
                         bucket_width: int = 100,
                         n_buckets: int = 8,
                         max_files_per_trigger: int | None = None) -> None:
    """Continuous corpus drift monitoring — the streaming form of
    ``q_docs_drift_report``: the FIRST micro-batch freezes the
    per-source reference length histogram (``<name>__ref``, the same
    freeze-at-bootstrap contract as the ANN index centroids); every
    later batch recomputes its own histogram and OVERWRITES the
    monitoring state ``<name>__state`` with per-source
    (n_ref, n_batch, drift_permille) — the total-variation distance
    in all-BIGINT cross-multiplied arithmetic. State overwrite (not
    an append log) is what makes at-least-once replay safe with no
    guard at all: a replayed batch recomputes byte-identical state.
    Histograms are fixed-width (``n_buckets``), so both stored
    tables are bounded by |sources| x n_buckets regardless of
    corpus size."""
    ref_t, state_t = f"{name}__ref", f"{name}__state"

    def hist(batch: DataFrame) -> DataFrame:
        b = F.expr(f"CAST(LEAST({len_col} DIV {bucket_width}, "
                   f"{n_buckets - 1}) AS INT)")
        return (batch.select(F.col(source_col).alias("source"),
                             b.alias("bucket"))
                .groupBy("source", "bucket")
                .agg(F.count("*").alias("n")))

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        h = hist(batch)
        if not store.exists(ref_t):
            store.write(ref_t, h)
            zero = (h.groupBy("source")
                    .agg(F.sum("n").alias("n_ref"))
                    .select("source", "n_ref",
                            F.col("n_ref").alias("n_batch"),
                            F.lit(0).cast("bigint")
                            .alias("drift_permille")))
            store.write(state_t, zero)
            return
        ref = store.read(spark, ref_t)
        a = ref.select("source", "bucket", F.col("n").alias("a"))
        b = h.select("source", "bucket", F.col("n").alias("b"))
        j = (a.join(b, ["source", "bucket"], "full_outer")
             .fillna(0, subset=["a", "b"]))
        tot = j.groupBy("source").agg(F.sum("a").alias("na"),
                                      F.sum("b").alias("nb"))
        state = (
            j.join(tot, "source")
            .groupBy("source")
            .agg(F.first("na").alias("n_ref"),
                 F.first("nb").alias("n_batch"),
                 F.sum(F.abs(F.col("a") * F.col("nb")
                             - F.col("b") * F.col("na")))
                 .alias("_l1x"))
            .withColumn(
                "drift_permille",
                F.expr("CASE WHEN n_ref = 0 OR n_batch = 0 THEN 1000 "
                       "ELSE CAST((1000 * _l1x) DIV (2 * n_ref * n_batch)"
                       " AS BIGINT) END"))
            .drop("_l1x"))
        store.write(state_t, state)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_hll_counts(spark: SparkSession, src_dir: str, store,
                      table: str, checkpoint: str, schema,
                      ts_col: str = "ts", key_col: str = "user_id"
                      ) -> None:
    """Continuously-maintained windowed distinct-count sketch: a
    file-source stream of event batches folds into a persistent
    ``(hour, idx, m)`` HLL register table via foreachBatch
    (availableNow trigger, the drain-what's-there contract). Read
    estimates with ``operators.sketches.hll_estimate``.

    The state story is the cleanest in the streaming family:
    register max-merge is IDEMPOTENT and commutative, so
    foreachBatch's at-least-once redelivery needs NO replay guard —
    re-merging a delivered batch changes nothing (max(a, a) = a),
    unlike the additive views whose double-apply the dataset-stamp
    guard exists to prevent. Window state is fixed-size (256
    registers per hour, integers) instead of one-entry-per-user,
    which is what lets an unbounded-cardinality stream keep a
    bounded distinct-count dashboard."""
    from pyspark.sql import functions as F

    from linz_bde_uploader_spark.operators.sketches import hll_registers

    stream = spark.readStream.schema(schema).parquet(src_dir)

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        keyed = (batch.filter(F.col(key_col).isNotNull()
                              & F.col(ts_col).isNotNull())
                 .select(F.date_format(
                     F.date_trunc("hour",
                                  F.col(ts_col).cast("timestamp")),
                     "yyyy-MM-dd HH:mm:ss").alias("hour"),
                     F.col(key_col).cast("string").alias("key")))
        regs = hll_registers(keyed, ["hour"], F.col("key"))
        if store.exists(table):
            regs = (store.read(spark, table).unionByName(regs)
                    .groupBy("hour", "idx").agg(F.max("m").alias("m")))
        store.write(table, regs, key="hour")

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_cms_counts(spark: SparkSession, src_dir: str, store,
                      table: str, checkpoint: str, schema,
                      token_col: str = "event_type") -> dict:
    """Continuously-maintained count-min frequency sketch — the
    ADDITIVE counterpart of ``stream_hll_counts``, and the reason
    the two exist side by side: CMS counters fold by SUM, and sums
    are NOT idempotent, so at-least-once redelivery would
    double-count without a guard. The guard here is the canonical
    Structured Streaming idempotent-sink pattern: foreachBatch's
    ``batch_id`` is monotone per checkpoint, so the sink records the
    last folded id in the store pointer's meta and skips any batch
    at or below it. (Contrast the HLL stream, whose max-merge needs
    NO guard; and the CDC upload views, whose guard is the
    dataset stamp because datasets — not batch ids — are their
    replay unit.) The checkpoint and the sink state travel together,
    per the standard foreachBatch contract: discarding the
    checkpoint while keeping the table makes earlier file batches
    replay with already-folded ids, which the guard then skips —
    and because the skip is by BATCH ID, not by content, any NEW
    source files that landed before the re-drain get bundled into
    those replayed ids and dropped with them. Do not add source
    files between discarding a checkpoint and re-draining under a
    fresh one (or fold them through a fresh checkpoint directory);
    each skip is logged as a warning so the loss is never silent,
    and the drain's return value carries the counts (r14 advice:
    per-skip warnings alone made the guard's activity invisible to
    a caller watching query progress) — ``{"folded_batches": n,
    "skipped_batches": m}``, with a run-end summary warning when any
    batch was skipped."""
    import logging

    from pyspark.sql import functions as F

    from linz_bde_uploader_spark.operators.sketches import cms_build

    stream = spark.readStream.schema(schema).parquet(src_dir)
    counts = {"folded_batches": 0, "skipped_batches": 0}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if store.exists(table):
            meta = store.table_meta(table) or {}
            last = meta.get("last_batch_id")
            if last is not None and batch_id <= last:
                # Redelivered batch: already folded. Loud, because a
                # reset checkpoint can bundle genuinely-new files
                # into a replayed id (see docstring contract).
                counts["skipped_batches"] += 1
                logging.getLogger(__name__).warning(
                    "stream_cms_counts[%s]: skipping batch_id=%d "
                    "(<= folded last_batch_id=%d); if the checkpoint "
                    "was reset with new source files present, drain "
                    "them under a fresh checkpoint", table, batch_id,
                    last)
                return
        delta = cms_build(batch.select(F.col(token_col).alias("tok")))
        if store.exists(table):
            delta = (store.read(spark, table).unionByName(delta)
                     .groupBy("row", "idx").agg(F.sum("c").alias("c")))
        store.write(table, delta, key="idx",
                    meta={"last_batch_id": batch_id})
        counts["folded_batches"] += 1

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if counts["skipped_batches"]:
        logging.getLogger(__name__).warning(
            "stream_cms_counts[%s]: drain complete — %d batch(es) "
            "folded, %d SKIPPED by the replay guard", table,
            counts["folded_batches"], counts["skipped_batches"])
    return counts
