"""Persistent incremental IVF index (operators/ann_index.py):
build == direct ivf_topk, append-then-query == rebuild-from-scratch,
and appends are idempotent under replay."""

import os

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators import ann_index as AI
from linz_bde_uploader_spark.operators import similarity as S
from linz_bde_uploader_spark.plans.tables import load_table
from linz_bde_uploader_spark.sources.store import TableStore

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").limit(60).cache()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_index_query_equals_direct_ivf_topk(spark, tmp_path, emb):
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    AI.ivf_index_build(spark, store, emb, "ann", n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    want = S.ivf_topk(emb, queries, k=3, n_centroids=8, nprobe=2)
    assert _rows(got) == _rows(want)


def test_append_equals_rebuild_and_is_idempotent(spark, tmp_path, emb):
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    # centroids must come from the indexed half so they are identical
    # to what a from-scratch build over the union would NOT retrain —
    # centroids freeze at build time by design
    cents = S.seed_centroids(half_a, 8)
    AI.ivf_index_build(spark, store, half_a, "ann", centroids=cents)
    v_built = store.current_version("ann__vectors")

    n = AI.ivf_index_append(spark, store, half_b, "ann")
    assert n == half_b.count()
    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    want = S.ivf_topk(emb, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(got) == _rows(want)

    # LSM shape: the append landed in the DELTA — the corpus-sized
    # base was NOT rewritten
    assert store.current_version("ann__vectors") == v_built
    assert store.exists("ann__delta")
    v_delta = store.current_version("ann__delta")
    # replayed batch: no new vectors, no new delta version
    assert AI.ivf_index_append(spark, store, half_b, "ann") == 0
    assert store.current_version("ann__delta") == v_delta
    # and the query answer is unchanged
    again = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    assert _rows(again) == _rows(got)

    # compaction folds the delta into the base in one rewrite and
    # empties it; answers unchanged, second compact is a no-op
    folded = AI.ivf_index_compact(spark, store, "ann")
    assert folded == half_b.count()
    assert store.read(spark, "ann__delta").count() == 0
    assert store.current_version("ann__vectors") == v_built + 1
    post = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    assert _rows(post) == _rows(got)
    assert AI.ivf_index_compact(spark, store, "ann") == 0


def test_readers_keep_snapshot_across_append(spark, tmp_path, emb):
    """The versioned store's contract applied to the index: a reader
    pinned to the pre-append version still sees the old lists."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    AI.ivf_index_build(spark, store, half_a, "ann", n_centroids=8)
    v0 = store.current_version("ann__vectors")
    old_pinned = store.read(spark, "ann__vectors", version=v0)
    n_before = old_pinned.count()
    AI.ivf_index_append(spark, store,
                        emb.filter(F.col("vec_id") % 2 == 1), "ann")
    assert store.read(spark, "ann__vectors", version=v0).count() == n_before
    # appends land in the delta; the logical index (base U delta) grew
    assert AI._index_vectors(spark, store, "ann").count() > n_before
    # compaction grows the base itself, old pinned version unchanged
    AI.ivf_index_compact(spark, store, "ann")
    assert store.read(spark, "ann__vectors").count() > n_before
    assert store.read(spark, "ann__vectors", version=v0).count() == n_before


def test_stream_ivf_index_matches_batch_build(spark, tmp_path, emb):
    """Streaming maintenance: two micro-batch drains (bootstrap +
    append) must leave the stored index answering queries exactly as
    a one-shot batch build over the full corpus with the SAME frozen
    centroids; a re-drain with a fresh checkpoint (full replay, the
    at-least-once worst case) must change nothing."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    schema = emb.schema

    half_a.write.mode("overwrite").parquet(src)
    AI.stream_ivf_index(spark, src, store, "ann", ckpt, schema)
    assert store.exists("ann__vectors")

    half_b.write.mode("append").parquet(src)
    AI.stream_ivf_index(spark, src, store, "ann", ckpt, schema)

    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    cents = store.read(spark, "ann__centroids")
    want = S.ivf_topk(emb, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(got) == _rows(want)

    # full replay: fresh checkpoint reprocesses every file; the
    # anti-join append must add nothing and commit no version
    v = store.current_version("ann__vectors")
    AI.stream_ivf_index(spark, src, store, "ann",
                        str(tmp_path / "ckpt2"), schema)
    assert store.current_version("ann__vectors") == v
    again = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    assert _rows(again) == _rows(got)


def test_index_probe_is_bucket_pruned(spark, tmp_path, emb):
    """The scale claim behind key='cell': with the catalog-bucketed
    store, a probe filtered to specific cells must PRUNE buckets at
    scan time — the physical plan advertises a SelectedBucketsCount
    strictly below the bucket count. This is the evidence for 'a
    probe reads ~nprobe/n_centroids of the index, never a full
    scan'."""
    store = TableStore(str(tmp_path / "store"), n_buckets=8,
                       use_catalog_buckets=True)
    AI.ivf_index_build(spark, store, emb, "ann", n_centroids=8)
    inv = store.read(spark, "ann__vectors")
    probe = inv.filter(F.col("cell").isin(0, 3))
    # autoBucketedScan converts bucketed scans back to plain ones
    # when no join/agg consumes the distribution, which also drops
    # bucket pruning — disable it to observe the pruned scan (the
    # pushed filter still prunes row groups either way)
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    try:
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
    assert "SelectedBucketsCount" in plan, plan
    import re
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) < int(m.group(2))


def test_knn_graph_multiprobe_recall_monotone(spark, emb):
    """knn_graph's n_probes knob: probing all 2^n_planes buckets must
    recover at least as many true-top-k edges as single-bucket
    probing, and full probing equals the exact graph (every pair is
    scored when every bucket is probed)."""
    from linz_bde_uploader_spark.operators.similarity import (
        cosine_topk, knn_graph)

    exact = {(r["vec_id"], r["neighbor_id"]) for r in
             cosine_topk(emb, emb, k=3)
             .withColumnRenamed("query_id", "vec_id").collect()}
    hits = {}
    for p in (1, 16):
        g = {(r["vec_id"], r["neighbor_id"]) for r in
             knn_graph(emb, k=3, n_planes=4, n_probes=p).collect()}
        hits[p] = len(g & exact)
    assert hits[16] >= hits[1]
    assert hits[16] == len(exact)  # full probing == exact


def test_compact_crash_window_never_duplicates(spark, tmp_path, emb):
    """Compaction crash safety: inject a failure BETWEEN the base
    fold and the delta-empty write. The freshly-folded base instantly
    stales the delta (its stamp names the previous base version), so
    queries must see each vector exactly once — never base+delta
    duplicates — a follow-up append ignores the stale delta's rows
    when deduping NEW ids against the logical index, and the next
    compact retires the stale delta without re-folding."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    cents = S.seed_centroids(half_a, 8)
    AI.ivf_index_build(spark, store, half_a, "ann", centroids=cents)
    AI.ivf_index_append(spark, store, half_b, "ann")

    orig_write = store.write

    def crashing(table, df, key=None, dataset=None):
        if table == "ann__delta":
            raise RuntimeError("injected crash before delta empty")
        return orig_write(table, df, key=key, dataset=dataset)

    store.write = crashing
    try:
        with pytest.raises(RuntimeError):
            AI.ivf_index_compact(spark, store, "ann")
    finally:
        store.write = orig_write

    # crash window on disk: base folded, delta stale (non-empty)
    assert store.read(spark, "ann__delta").count() > 0
    inv = AI._index_vectors(spark, store, "ann")
    assert inv.count() == inv.select("vec_id").distinct().count()
    assert inv.count() == emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    want = S.ivf_topk(emb, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(got) == _rows(want)

    # replayed append of already-indexed rows: no-op despite the
    # stale delta being ignored
    assert AI.ivf_index_append(spark, store, half_b, "ann") == 0
    # the next compact retires the stale delta without re-folding
    assert AI.ivf_index_compact(spark, store, "ann") == 0
    assert store.read(spark, "ann__delta").count() == 0
    assert AI._index_vectors(spark, store, "ann").count() == emb.count()


def test_index_vacuum_bounds_revisions(spark, tmp_path, emb):
    """Long-running ingest accretes a delta revision per append;
    vacuum must bound them while the current index keeps answering
    identically."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    parts = [emb.filter(F.col("vec_id") % 4 == i) for i in range(4)]
    cents = S.seed_centroids(parts[0], 4)
    AI.ivf_index_build(spark, store, parts[0], "ann", centroids=cents)
    for p in parts[1:]:
        AI.ivf_index_append(spark, store, p, "ann")
    assert len(store.versions("ann__delta")) == 3
    queries = emb.filter(F.col("vec_id") < 10)
    before = _rows(AI.ivf_index_query(spark, store, "ann", queries,
                                      k=3, nprobe=2))
    dropped = AI.ivf_index_vacuum(spark, store, "ann", keep=1)
    assert dropped["ann__delta"] == [1, 2]
    assert len(store.versions("ann__delta")) == 1
    after = _rows(AI.ivf_index_query(spark, store, "ann", queries,
                                     k=3, nprobe=2))
    assert after == before


def test_index_delete_tombstones_then_purge(spark, tmp_path, emb):
    """LSM delete path: tombstoned vectors vanish from query results
    immediately (logical delete), a re-append of a tombstoned id is a
    no-op while the tombstone stands, compact purges the rows
    physically and clears the tombstones, and after the purge the id
    can be re-added."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    cents = S.seed_centroids(emb, 8)
    AI.ivf_index_build(spark, store, emb, "ann", centroids=cents)
    queries = emb.filter(F.col("vec_id") < 6)
    victims = emb.filter(F.col("vec_id").isin(20, 22)).cache()

    n_t = AI.ivf_index_delete(spark, store, victims.select("vec_id"),
                              "ann")
    assert n_t == 2
    # idempotent delete
    assert AI.ivf_index_delete(spark, store, victims.select("vec_id"),
                               "ann") == 2

    got = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    kept = emb.filter(~F.col("vec_id").isin(20, 22))
    want = S.ivf_topk(kept, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(got) == _rows(want)

    # re-append while tombstoned: no-op (delete wins until compact)
    assert AI.ivf_index_append(spark, store, victims, "ann") == 0

    # compact purges physically and clears tombstones
    AI.ivf_index_compact(spark, store, "ann")
    assert store.read(spark, "ann__tombstones").count() == 0
    assert AI._index_vectors(spark, store, "ann") \
        .filter(F.col("vec_id").isin(20, 22)).count() == 0
    after = AI.ivf_index_query(spark, store, "ann", queries,
                               k=3, nprobe=2)
    assert _rows(after) == _rows(want)

    # after the purge the ids can come back
    assert AI.ivf_index_append(spark, store, victims, "ann") == 2
    back = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    full = S.ivf_topk(emb, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(back) == _rows(full)
    victims.unpersist()


def test_tombstone_survives_crashed_compact_blocks_reappend(
        spark, tmp_path, emb):
    """The crash state the append's tombstone anti-join exists for:
    compact folds the base (victims physically purged) but CRASHES
    before the tombstone clear. The standing tombstone must keep a
    re-append of the victim a NO-OP — without the anti-join the
    append would report n_added=2 (the purged base no longer holds
    the ids) while the tombstone hides the rows from every query and
    the next compact drops them physically: a row the caller was
    told was added, silently lost. 'Delete wins until compaction'
    must hold in every crash state."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    cents = S.seed_centroids(emb, 8)
    AI.ivf_index_build(spark, store, emb, "ann", centroids=cents)
    queries = emb.filter(F.col("vec_id") < 6)
    victims = emb.filter(F.col("vec_id").isin(20, 22)).cache()
    AI.ivf_index_delete(spark, store, victims.select("vec_id"), "ann")

    orig_write = store.write

    def crashing(table, df, key=None, dataset=None):
        if table == "ann__tombstones":
            raise RuntimeError("injected crash before tombstone clear")
        return orig_write(table, df, key=key, dataset=dataset)

    store.write = crashing
    try:
        with pytest.raises(RuntimeError):
            AI.ivf_index_compact(spark, store, "ann")
    finally:
        store.write = orig_write

    # crash window: base purged, tombstones standing
    assert AI._index_vectors(spark, store, "ann") \
        .filter(F.col("vec_id").isin(20, 22)).count() == 0
    assert store.read(spark, "ann__tombstones").count() == 2

    # re-append while the stale tombstone stands: still a no-op
    assert AI.ivf_index_append(spark, store, victims, "ann") == 0
    kept = emb.filter(~F.col("vec_id").isin(20, 22))
    got = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    want = S.ivf_topk(kept, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(got) == _rows(want)

    # the next compact clears the tombstones; the ids can come back
    AI.ivf_index_compact(spark, store, "ann")
    assert store.read(spark, "ann__tombstones").count() == 0
    assert AI.ivf_index_append(spark, store, victims, "ann") == 2
    back = AI.ivf_index_query(spark, store, "ann", queries, k=3, nprobe=2)
    full = S.ivf_topk(emb, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(back) == _rows(full)
    victims.unpersist()
