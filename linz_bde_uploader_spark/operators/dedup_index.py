"""Persistent, incrementally-maintained dedup index over the versioned
TableStore — dedup-on-ingest: classify every document of an incoming
batch against the ALREADY-INGESTED corpus (exact content dup, MinHash
near-dup, or new) and admit only the new ones, without ever rescanning
the corpus. The dedup-family analog of operators/ann_index.py: the
same build / append-delta / compact service shape, applied to the
(content-hash, LSH-band) index rows `lsh_band_hashes` documents as
"the persistable near-dup index".

Reference analog: the reference maintains derived per-table artifacts
incrementally per dataset rather than rebuilding them per upload
(sql/02-bde_control_functions.sql.in table-maintenance blocks); this
applies that persist-and-maintain contract to corpus deduplication.

Scale design:
- The index stores ONLY hashes, aggregated to their decision form:
  one (content_hash, canonical_id) row per distinct content and one
  (bkey, min_id) row per distinct band bucket — text never enters
  the index, and index size tracks DISTINCT contents/buckets, not
  corpus bytes. Storing bucket minima instead of per-doc band rows
  is the boilerplate-skew guard: a verdict only ever needs the
  SMALLEST candidate id, and min is an algebraic aggregate, so a
  million-doc boilerplate bucket is one index row and the
  membership join's output is bounded by |batch| x bands no matter
  how hot the bucket — the index-side analog of the
  `max_bucket_size` star-edge cap the batch dedup family uses
  (which AQE cannot provide: the blow-up is join OUTPUT, invisible
  to input-bytes skew detection).
- Both tables are stored keyed (``content_hash`` / ``bkey``), so the
  store hash-clusters them (and registers bucketed catalog tables
  under ``use_catalog_buckets=True``): membership checks are
  equi-joins in which only the BATCH side shuffles — the corpus-sized
  index never moves per ingest.
- Ingest appends are LSM-shaped: new docs' rows land in small
  ``__*_delta`` tables stamped with the base version they extend
  (the ann_index crash-consistency discipline: a compact that crashed
  between its base fold and nothing else leaves the delta stamped for
  an OLDER base, and stale deltas are ignored everywhere);
  ``dedup_index_compact`` folds them into the bases in one O(index)
  rewrite when they grow past taste.
- Ingest is idempotent in STATE under at-least-once delivery: a
  replayed batch's docs find their own content hashes already in the
  index, classify as exact dups, and append nothing — the index never
  holds duplicate rows. (Verdicts are at-least-once: the replay
  reports exact_dup where the first delivery said new. Exactly-once
  verdict reporting belongs to the caller's ledger, as with the
  streaming views' dataset stamps.)
- Batch semantics are keep-first: a doc is suppressed by ANY
  smaller-id sharer in the same batch, whether or not that sharer
  itself survived — the standard batched approximation of sequential
  ingest (exact dups are sequential-exact this way; near-dup chains
  can over-suppress relative to one-doc-at-a-time ingest, which is
  precisely the ordering dependency batching exists to avoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators.dedup import lsh_band_hashes


def _tables(name: str) -> tuple[str, str, str, str]:
    return (f"{name}__content", f"{name}__bands",
            f"{name}__content_delta", f"{name}__bands_delta")


def _bkey() -> F.Column:
    # one join column folding (band, band_hash): a single-key
    # equi-join matches the store's single-column hash clustering
    return F.md5(F.concat_ws(":", F.col("band"), F.col("band_hash")))


def _band_rows(docs: DataFrame, id_col: str, text_col: str,
               num_perm: int, bands: int,
               shingle_words: int) -> DataFrame:
    return (lsh_band_hashes(docs, text_col, id_col, num_perm, bands,
                            shingle_words)
            .select("id", _bkey().alias("bkey")))


def _base_stamp(store, base_table: str) -> str:
    return f"base_v{store.current_version(base_table)}"


def _live_delta(spark: SparkSession, store, base_table: str,
                delta_table: str) -> DataFrame | None:
    if not store.exists(delta_table):
        return None
    if store.current_dataset(delta_table) != _base_stamp(store,
                                                         base_table):
        return None  # stale: already folded in by a compact
    return store.read(spark, delta_table)


def _with_delta(spark: SparkSession, store, base_table: str,
                delta_table: str) -> DataFrame:
    base = store.read(spark, base_table)
    delta = _live_delta(spark, store, base_table, delta_table)
    return base if delta is None else base.unionByName(delta)


def dedup_index_build(spark: SparkSession, store, docs: DataFrame,
                      name: str, num_perm: int = 16, bands: int = 4,
                      shingle_words: int = 3, id_col: str = "doc_id",
                      text_col: str = "text") -> None:
    """Materialize the index for an existing corpus: the distinct
    content map (content_hash -> canonical smallest id) and the LSH
    band rows. The (num_perm, bands, shingle_words) parameters are
    part of the index identity — ingests against this index must pass
    the same values (frozen banding, exactly as ann_index freezes its
    centroids)."""
    content_t, bands_t, _cd, _bd = _tables(name)
    d = docs.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("text"))
    content = (d.groupBy(F.md5("text").alias("content_hash"))
               .agg(F.min("id").alias("canonical_id")))
    store.write(content_t, content, key="content_hash")
    store.write(bands_t,
                _band_rows(d, "id", "text", num_perm, bands,
                           shingle_words)
                .groupBy("bkey").agg(F.min("id").alias("min_id")),
                key="bkey")


def dedup_index_ingest(spark: SparkSession, store, batch: DataFrame,
                       name: str, num_perm: int = 16, bands: int = 4,
                       shingle_words: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Classify a batch against the index and admit the new docs.

    Returns (id, verdict, dup_of): ``exact_dup`` (same content hash as
    a stored doc or a smaller-id batch doc), ``near_dup`` (shares an
    LSH band bucket with one, content differs), or ``new``. ``dup_of``
    is the smallest such sharer (stored canonical ids and batch ids
    compete on plain id order — deterministic), NULL for new docs.
    New docs' content rows and bucket-min updates are appended to the
    delta tables; dup docs append NOTHING, which is the whole point —
    the corpus stays deduplicated at ingest instead of via periodic
    full-corpus sweeps.

    Only the batch shuffles: both membership joins hit the stored
    tables on their clustering keys, and the appended delta is
    O(|new docs|)."""
    content_t, bands_t, cd_t, bd_t = _tables(name)
    b = (batch.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("text"))
         .persist())
    bh = None
    try:
        bc = b.select("id", F.md5("text").alias("content_hash"))
        # batch band rows feed four branches (stored join, bucket
        # minima, intra-batch join, new-doc append) — persist so the
        # minhash signature aggregate runs once per batch, not four
        # times
        bh = _band_rows(b, "id", "text", num_perm, bands,
                        shingle_words).persist()

        stored_content = _with_delta(spark, store, content_t, cd_t)
        exact_stored = (bc.join(stored_content, "content_hash")
                        .select("id",
                                F.col("canonical_id").alias("_cand")))
        batch_min = bc.groupBy("content_hash").agg(
            F.min("id").alias("_bmin"))
        exact_batch = (bc.join(batch_min, "content_hash")
                       .filter(F.col("id") > F.col("_bmin"))
                       .select("id", F.col("_bmin").alias("_cand")))
        exact = (exact_stored.unionByName(exact_batch)
                 .groupBy("id").agg(F.min("_cand").alias("exact_of")))

        # stored side is per-bucket minima (one row per distinct
        # bucket), and the intra-batch side pre-aggregates to its own
        # bucket minima — both joins' outputs are bounded by
        # |batch| x bands even when a boilerplate bucket holds
        # millions of corpus docs (dup_of needs only the min, and min
        # composes across base rows, delta rows, and batch rows in
        # the final per-doc aggregate)
        stored_bands = _with_delta(spark, store, bands_t, bd_t)
        near_stored = (bh.join(stored_bands, "bkey")
                       .select("id", F.col("min_id").alias("_cand")))
        bucket_min = bh.groupBy("bkey").agg(F.min("id").alias("_bbm"))
        near_batch = (bh.join(bucket_min, "bkey")
                      .filter(F.col("_bbm") < F.col("id"))
                      .select("id", F.col("_bbm").alias("_cand")))
        near = (near_stored.unionByName(near_batch)
                .groupBy("id").agg(F.min("_cand").alias("near_of")))

        verdicts = (
            b.select("id")
            .join(exact, "id", "left").join(near, "id", "left")
            .select(
                "id",
                F.when(F.col("exact_of").isNotNull(), F.lit("exact_dup"))
                .when(F.col("near_of").isNotNull(), F.lit("near_dup"))
                .otherwise(F.lit("new")).alias("verdict"),
                F.coalesce("exact_of", "near_of").alias("dup_of"))
            .persist())
        verdicts.count()

        new_ids = verdicts.filter(F.col("verdict") == "new") \
            .select("id")
        n_new = new_ids.count()
        if n_new:
            # BANDS delta commits FIRST — the crash-window ordering
            # that fails CONSERVATIVE. A crash between the two writes
            # leaves band minima present and content rows absent:
            # every future copy (exact or near) of the crashed batch's
            # docs still band-matches and stays suppressed; only the
            # verdict label degrades (an exact copy reports near_dup).
            # The reverse order would leave content present and bands
            # absent, and future NEAR-copies would be ADMITTED —
            # permanent corpus contamination, since the replay's docs
            # classify as dups and append nothing (no self-heal).
            # Pinned by test_crash_between_delta_writes_is_conservative.
            new_bands = (bh.join(new_ids, "id", "left_semi")
                         .groupBy("bkey")
                         .agg(F.min("id").alias("min_id")))
            live_b = _live_delta(spark, store, bands_t, bd_t)
            merged_b = (new_bands if live_b is None
                        else live_b.unionByName(new_bands)
                        .groupBy("bkey")
                        .agg(F.min("min_id").alias("min_id")))
            store.write(bd_t, merged_b, key="bkey",
                        dataset=_base_stamp(store, bands_t))
            new_content = (bc.join(new_ids, "id", "left_semi")
                           .select("content_hash",
                                   F.col("id").alias("canonical_id")))
            live_c = _live_delta(spark, store, content_t, cd_t)
            store.write(cd_t,
                        new_content if live_c is None
                        else live_c.unionByName(new_content),
                        key="content_hash",
                        dataset=_base_stamp(store, content_t))
        # safe to hand back the lazy plan: store.read binds to the
        # version files current at READ time, so a post-append
        # re-evaluation still joins the PRE-append index state —
        # deterministic, and batch-sized work, never a driver collect
        verdicts.unpersist()
        return verdicts
    finally:
        if bh is not None:
            bh.unpersist()
        b.unpersist()


def stream_dedup_ingest(spark: SparkSession, src_dir: str, store,
                        name: str, checkpoint: str, schema,
                        num_perm: int = 16, bands: int = 4,
                        shingle_words: int = 3, id_col: str = "doc_id",
                        text_col: str = "text") -> None:
    """Continuously-deduplicating ingest: a file-source stream of
    document batches drains into ``dedup_index_ingest`` via
    foreachBatch (``availableNow`` trigger — the drain-what's-there
    contract shared with the CDC upload and ANN index streams). The
    first batch bootstraps the index (its own intra-batch dups are
    collapsed by the keep-first build: the content map keeps the
    smallest id per content and the band rows of every doc — same
    classification surface a sequential ingest would leave). Later
    batches classify-then-append. foreachBatch is at-least-once; the
    ingest's state idempotency is the replay guard — a redelivered
    batch's docs classify exact_dup against their own earlier append
    and add nothing. What to DO with the verdicts (route admitted
    docs to the corpus sink, quarantine dups, count per source) is
    the caller's foreachBatch concern; this stream maintains the
    index itself."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    content_t = _tables(name)[0]

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        if not store.exists(content_t):
            dedup_index_build(spark, store, batch, name,
                              num_perm=num_perm, bands=bands,
                              shingle_words=shingle_words,
                              id_col=id_col, text_col=text_col)
        else:
            dedup_index_ingest(spark, store, batch, name,
                               num_perm=num_perm, bands=bands,
                               shingle_words=shingle_words,
                               id_col=id_col, text_col=text_col)

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def dedup_index_compact(spark: SparkSession, store, name: str) -> int:
    """Fold the deltas into the bases: one O(index) rewrite per table
    that restores pure-base reads. The base writes bump the base
    versions, which automatically STALES the deltas (their stamps
    name the old base) — a crash between the two folds leaves one
    stale delta, ignored everywhere, exactly the ann_index compact
    contract. Returns the number of delta rows folded."""
    content_t, bands_t, cd_t, bd_t = _tables(name)
    folded = 0
    live_c = _live_delta(spark, store, content_t, cd_t)
    if live_c is not None:
        folded += live_c.count()
        store.write(content_t,
                    store.read(spark, content_t).unionByName(live_c),
                    key="content_hash")
    live_b = _live_delta(spark, store, bands_t, bd_t)
    if live_b is not None:
        folded += live_b.count()
        store.write(bands_t,
                    store.read(spark, bands_t).unionByName(live_b)
                    .groupBy("bkey").agg(F.min("min_id")
                                         .alias("min_id")),
                    key="bkey")
    return folded
