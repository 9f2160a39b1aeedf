"""Persistent, incrementally-maintained IVF index over the versioned
TableStore — the composition that turns the ANN *query* operators into
an ANN *service* shape: build once, append micro-batches as the corpus
grows, query forever, with the store's atomic version pointer giving
readers a consistent index snapshot at every moment.

Reference analog: the reference persists derived per-table artifacts
(indexes, stats) alongside uploads and maintains them per dataset
(sql/02-bde_control_functions.sql.in table-maintenance blocks); this
applies the same persist-and-maintain contract to the similarity
index.

Scale design:
- The vectors table is stored ``key='cell'`` — hash-bucketed (and,
  with ``use_catalog_buckets=True``, registered as a BUCKETED catalog
  table), so a query's probe of ``nprobe`` cells is a bucket-pruned
  read of ~nprobe/n_centroids of the index, never a full scan.
- Centroids FREEZE at build time. An append assigns only the NEW
  vectors against the broadcast centroid table (one map-side pass over
  the batch — the corpus-sized inverted lists are unioned, not
  re-scored), exactly how FAISS's `add` works after `train`.
- Appends are idempotent: an anti join on the id drops vectors the
  index already holds, so an at-least-once upstream (a replayed
  micro-batch) cannot duplicate inverted-list entries. The check is
  cell-scoped (frozen centroids assign a re-delivered vector to the
  same cell), so the membership read bucket-prunes to the batch's
  cells instead of scanning the base id column — append cost stays
  flat as the base grows. Tombstoned ids are dropped too: delete
  wins until compaction, in every crash state.
- Appends are LSM-shaped: new vectors land in a small ``__delta``
  table (write amplification O(|delta|) per append, bounded by
  compaction cadence) and queries read base UNION delta;
  ``ivf_index_compact`` folds the delta into the base in one
  O(index) rewrite when the delta has grown past taste. Rewriting
  the whole base per append would make ingest cost O(index) — the
  100 TB mistake this split exists to avoid.
- Every write is a new store version behind the atomic pointer —
  concurrent readers keep the old snapshot; rollback is `vacuum`-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators.similarity import (
    _as_double, _cosine_pre, _norm, _rank_topk, ivf_assign,
    seed_centroids,
)


def _tables(name: str) -> tuple[str, str, str]:
    return f"{name}__centroids", f"{name}__vectors", f"{name}__delta"


def ivf_index_build(spark: SparkSession, store, corpus: DataFrame,
                    name: str, centroids: DataFrame | None = None,
                    n_centroids: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Train (or accept) centroids and materialize the inverted lists.
    ``centroids`` defaults to the deterministic seed set; pass
    ``kmeans_fit``/``kmeans_parallel_seeds`` output for trained cells
    — the stored structure is identical either way."""
    cent_t, vec_t, _delta_t = _tables(name)
    if centroids is None:
        centroids = seed_centroids(corpus, n_centroids, id_col, vec_col)
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("v"))
    inv = ivf_assign(c, centroids, "vec_id", "v", nprobe=1) \
        .select("vec_id", "cell", "v")
    store.write(cent_t, centroids)
    store.write(vec_t, inv, key="cell")


def _base_stamp(store, name: str) -> str:
    """The delta's consistency stamp: the base version it extends.
    A delta stamped for an OLDER base is stale — its rows were
    already folded in (a compact crashed between its two writes) —
    and must be ignored everywhere, or queries would see duplicate
    vectors (duplicate top-k rows) until the next compact."""
    _c, vec_t, _d = _tables(name)
    return f"base_v{store.current_version(vec_t)}"


def _live_delta(spark: SparkSession, store, name: str) -> DataFrame | None:
    _c, _v, delta_t = _tables(name)
    if not store.exists(delta_t):
        return None
    if store.current_dataset(delta_t) != _base_stamp(store, name):
        return None  # stale: already folded into the base
    return store.read(spark, delta_t)


def _index_vectors(spark: SparkSession, store, name: str) -> DataFrame:
    """Base UNION live delta — the current logical inverted lists."""
    _c, vec_t, _d = _tables(name)
    inv = store.read(spark, vec_t)
    delta = _live_delta(spark, store, name)
    return inv if delta is None else inv.unionByName(delta)


def ivf_index_append(spark: SparkSession, store, new_vectors: DataFrame,
                     name: str, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> int:
    """Incrementally add vectors to a built index: assign the batch
    against the FROZEN broadcast centroids (map-side, no re-scoring
    of the existing lists), anti-join away ids the index already
    holds (idempotent under replay), and commit into the small
    ``__delta`` table — the LSM write path: per-append cost is
    O(|delta|) on the write side, NEVER a rewrite of the
    corpus-sized base. Returns the number of vectors actually added.

    The idempotency check is CELL-SCOPED: the batch assigns to its
    cells first, and the membership anti-join reads only THOSE
    cells' inverted lists (the same bounded collect-and-IN-filter
    bucket-prune as the query path), not the full base id column —
    the r7 shape scanned and shuffled every base id per micro-batch,
    an O(index) read that contradicted the O(|delta|) claim and
    would have been the next bottleneck at 100 TB. Correctness:
    centroids are frozen, so a re-delivered vector re-assigns to the
    SAME cell and is caught there. (Corollary contract: re-appending
    an id with a *different* embedding is an update, not an append —
    it may assign to a different cell and must go through
    delete-then-compact-then-append.)

    Tombstoned ids are also anti-joined away (takedown-sized
    broadcast): a standing tombstone means "delete wins until
    compaction", and that must hold in every crash state — without
    it, a compact that crashed after its base fold but before its
    tombstone clear would let a re-append report n_added>0 while the
    standing tombstone hides the row and the next compact physically
    drops it (a row the caller was told was added, silently lost)."""
    cent_t, _vec_t, delta_t = _tables(name)
    cents = store.read(spark, cent_t)
    c = new_vectors.select(F.col(id_col).alias("vec_id"),
                           _as_double(F.col(vec_col)).alias("v"))
    assigned = ivf_assign(c, cents, "vec_id", "v", nprobe=1) \
        .select("vec_id", "cell", "v")
    batch_cells = [r["cell"] for r in
                   assigned.select("cell").distinct().collect()]
    old_ids = (_index_vectors(spark, store, name)
               .filter(F.col("cell").isin(batch_cells))
               .select("vec_id"))
    inv_new = assigned.join(old_ids, "vec_id", "left_anti")
    tomb_t = _tomb_table(name)
    if store.exists(tomb_t):
        inv_new = inv_new.join(store.read(spark, tomb_t), "vec_id",
                               "left_anti")
    n_added = inv_new.count()
    if n_added:
        live = _live_delta(spark, store, name)
        delta = inv_new if live is None else live.unionByName(inv_new)
        store.write(delta_t, delta, key="cell",
                    dataset=_base_stamp(store, name))
    return n_added


def ivf_index_compact(spark: SparkSession, store, name: str) -> int:
    """Fold the delta into the base: ONE O(index) rewrite that
    restores pure-base reads (no per-query union) and re-clusters
    every vector into its cell bucket. Returns the number of delta
    rows folded (0 = nothing to do). Run on a cadence — after the
    delta passes a fraction of the base — exactly like any LSM
    compaction. Crash safety is the delta's base-version stamp: the
    base fold commits first, which instantly STALES the delta (its
    stamp names the previous base version), so a crash between the
    two writes leaves readers seeing exactly the post-fold index —
    never base+delta duplicates — and the next compact (or append)
    simply discards the stale delta instead of re-folding."""
    _c, vec_t, delta_t = _tables(name)
    tomb_t = _tomb_table(name)
    n_tombs = (store.read(spark, tomb_t).count()
               if store.exists(tomb_t) else 0)
    delta = _live_delta(spark, store, name)
    if delta is None:
        if store.exists(delta_t) and store.current_dataset(delta_t) \
                != _base_stamp(store, name):
            # stale leftover from a crashed compact: retire it
            store.write(delta_t, store.read(spark, delta_t).limit(0),
                        key="cell", dataset=_base_stamp(store, name))
        if not n_tombs:
            return 0
        delta = None
    n = delta.count() if delta is not None else 0
    if not n and not n_tombs:
        return 0
    base = store.read(spark, vec_t)
    merged = base if delta is None else base.unionByName(delta)
    # physical purge: tombstoned rows leave the base here; queries
    # already excluded them logically, so crash ordering is free —
    # tombstones are cleared LAST and re-applying them is a no-op
    merged = _without_tombstones(spark, store, name, merged)
    store.write(vec_t, merged, key="cell")
    if delta is not None:
        store.write(delta_t, delta.limit(0), key="cell",
                    dataset=_base_stamp(store, name))
    if n_tombs:
        store.write(tomb_t,
                    store.read(spark, tomb_t).limit(0))
    return n


def ivf_index_query(spark: SparkSession, store, name: str,
                    queries: DataFrame, k: int = 3, nprobe: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Top-k against the STORED index: broadcast the centroid table,
    assign each query to its ``nprobe`` cells, bucket-pruned read of
    those cells' inverted lists, score, salted two-phase rank.
    Results are identical to ``ivf_topk`` over the same corpus and
    centroids (pytest-pinned), but the corpus is never re-assigned —
    the query cost is the probe, not the index. Reads base UNION
    delta, so un-compacted appends are immediately visible."""
    cent_t, _vec_t, _d = _tables(name)
    cents = store.read(spark, cent_t)
    inv = _without_tombstones(spark, store, name,
                              _index_vectors(spark, store, name))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    probes = ivf_assign(q, cents, "query_id", "qv", nprobe=nprobe) \
        .select("query_id", F.col("qv"), "cell")
    # The broadcast probe join alone would still SCAN every inverted
    # list (a join key is not a scan filter). Collect the probed cell
    # ids — bounded by |queries| * nprobe, the same driver-reduction
    # class as the centroid collects — and push them as an IN filter
    # so the parquet scan bucket-prunes and row-group-prunes to the
    # probed cells. THIS is what makes the probe read
    # ~nprobe/n_centroids of the index instead of all of it.
    # (re-running the tiny query-side assignment for this collect is
    # one extra map pass over a by-contract-small relation — cheaper
    # than holding a cache across the returned lazy plan)
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    inv = inv.filter(F.col("cell").isin(cells))
    scored = (
        F.broadcast(probes.withColumn("_qn", _norm(F.col("qv"))))
        .join(inv.withColumn("_cn", _norm(F.col("v"))), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                _cosine_pre(F.col("qv"), F.col("v"),
                            F.col("_qn"), F.col("_cn")).alias("sim")))
    return _rank_topk(scored, k)


def stream_ivf_index(spark: SparkSession, src_dir: str, store,
                     name: str, checkpoint: str, schema,
                     n_centroids: int = 8, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> None:
    """Continuously-maintained ANN index: a file-source stream of
    embedding batches drains into ``ivf_index_append`` via
    foreachBatch (``availableNow`` trigger — the same
    drain-what's-there contract as the CDC upload stream). The first
    batch bootstraps the index (centroids seeded from it and FROZEN
    thereafter — FAISS train-then-add). foreachBatch is
    at-least-once; the append's anti-join idempotency is exactly what
    makes replays safe here, with no extra guard state: a replayed
    batch adds 0 vectors and writes no version. Readers keep snapshot
    isolation through the store's atomic pointer — a query running
    mid-append sees the pre-append index, never a partial one."""
    stream = spark.readStream.schema(schema).parquet(src_dir)

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        if not store.exists(_tables(name)[1]):
            ivf_index_build(spark, store, batch, name,
                            n_centroids=n_centroids, id_col=id_col,
                            vec_col=vec_col)
        else:
            ivf_index_append(spark, store, batch, name,
                             id_col=id_col, vec_col=vec_col)

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def ivf_index_vacuum(spark: SparkSession, store, name: str,
                     keep: int = 2) -> dict[str, list[int]]:
    """Retention maintenance for the index's three tables (C7 applied
    to the ANN service): every append/compact commits a new store
    version, so a long-running ingest accretes revisions — vacuum
    drops all but the newest ``keep`` per table (readers pinned to a
    dropped version fail fast; keep >= 2 preserves one rollback
    step). Returns {table: [dropped versions]}."""
    out = {}
    for t in (*_tables(name), _tomb_table(name)):
        if store.exists(t):
            out[t] = store.vacuum(t, keep=keep, spark=spark)
    return out


def _tomb_table(name: str) -> str:
    return f"{name}__tombstones"


def ivf_index_delete(spark: SparkSession, store, ids: DataFrame,
                     name: str, id_col: str = "vec_id") -> int:
    """Logical deletion — the takedown path a training-data index
    needs (right-to-be-forgotten, dedup-loser eviction): ids land in
    a small tombstone table that every query anti-joins (tombstones
    are takedown-sized, AQE broadcasts them); the next ``compact``
    purges the rows physically and clears the tombstones. Deletes
    WIN until that compaction: re-appending a tombstoned id is a
    no-op while the tombstone stands (documented contract — purge,
    then re-add). Idempotent: the tombstone set is a distinct union.
    Returns the total tombstone count after the write."""
    t = _tomb_table(name)
    new = ids.select(F.col(id_col).alias("vec_id")).distinct()
    if store.exists(t):
        new = store.read(spark, t).unionByName(new).distinct()
    n = new.count()
    store.write(t, new)
    return n


def _without_tombstones(spark: SparkSession, store, name: str,
                        inv: DataFrame) -> DataFrame:
    t = _tomb_table(name)
    if not store.exists(t):
        return inv
    tombs = store.read(spark, t)
    return inv.join(tombs, "vec_id", "left_anti")
