"""Cross-version index layout compatibility (reference analog:
t/test-upgrades.bash:6-63 replays pre-upgrade schemas through the
new code; here the r7 on-disk ANN index layout is replayed through
the current operators).

The r7 layout is pinned BY HAND, not by calling old code: three
store tables only — ``<name>__centroids``, ``<name>__vectors``
(key='cell'), and an optional live ``<name>__delta`` stamped
``dataset='base_v<N>'`` for the base version it extends — and NO
``<name>__tombstones`` table (tombstones arrived in r8). The current
read/append/compact/delete paths must open that layout unchanged: a
refactor that starts assuming the tombstone table exists, or changes
the delta's stamp format so old deltas read as stale, breaks an
in-place upgrade of a live index and fails here."""

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


def _write_r7_layout(spark, store, base, delta=None):
    """Materialize exactly the tables (and only the tables) the r7
    code wrote: centroids, cell-bucketed inverted lists, and — when
    ``delta`` is given — a live delta stamped for the current base
    version. Returns the frozen centroids."""
    cents = S.seed_centroids(base, 8)
    b = base.select(F.col("vec_id"),
                    F.col("embedding").cast("array<double>").alias("v"))
    inv = S.ivf_assign(b, cents, "vec_id", "v", nprobe=1) \
        .select("vec_id", "cell", "v")
    store.write("ann__centroids", cents)
    store.write("ann__vectors", inv, key="cell")
    if delta is not None:
        d = delta.select(
            F.col("vec_id"),
            F.col("embedding").cast("array<double>").alias("v"))
        dinv = S.ivf_assign(d, cents, "vec_id", "v", nprobe=1) \
            .select("vec_id", "cell", "v")
        stamp = f"base_v{store.current_version('ann__vectors')}"
        store.write("ann__delta", dinv, key="cell", dataset=stamp)
    assert not store.exists("ann__tombstones")
    return cents


def test_r7_layout_reads_and_queries(spark, tmp_path, emb):
    """A pre-tombstone index (base + live delta, no tombstone table)
    must answer queries identically to the direct operator over the
    full corpus."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    cents = _write_r7_layout(spark, store, half_a, delta=half_b)
    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.ivf_index_query(spark, store, "ann", queries,
                             k=3, nprobe=2)
    want = S.ivf_topk(emb, queries, k=3, centroids=cents, nprobe=2)
    assert _rows(got) == _rows(want)


def test_r7_layout_append_stays_idempotent(spark, tmp_path, emb):
    """The cell-scoped (r8) membership check must still see rows that
    an r7-written delta holds — a replayed batch adds nothing."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    _write_r7_layout(spark, store, half_a, delta=half_b)
    # every id in the old delta is already a member
    assert AI.ivf_index_append(spark, store, half_b, "ann") == 0
    # and the old base too
    assert AI.ivf_index_append(spark, store, half_a, "ann") == 0


def test_r7_layout_compact_folds_old_delta(spark, tmp_path, emb):
    """Compacting an r7-written delta folds it into the base and
    leaves a pure-base index (no tombstone table springs into
    existence as a side effect)."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    _write_r7_layout(spark, store, half_a, delta=half_b)
    assert AI.ivf_index_compact(spark, store, "ann") == half_b.count()
    base = store.read(spark, "ann__vectors")
    assert base.count() == emb.count()
    live = AI._live_delta(spark, store, "ann")
    assert live is None or live.count() == 0
    assert not store.exists("ann__tombstones")
    # second compact: nothing to do
    assert AI.ivf_index_compact(spark, store, "ann") == 0


def test_r7_layout_upgrades_in_place_via_delete(spark, tmp_path, emb):
    """The first delete against an old-layout index introduces the
    tombstone table cleanly; queries hide the row immediately and the
    next compact purges it physically — full r8 semantics on an r7
    index with no migration step."""
    store = TableStore(str(tmp_path / "store"), n_buckets=4)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    _write_r7_layout(spark, store, half_a, delta=half_b)
    victim = spark.createDataFrame([(0,)], "vec_id bigint")
    assert AI.ivf_index_delete(spark, store, victim, "ann") == 1
    assert store.exists("ann__tombstones")
    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.ivf_index_query(spark, store, "ann", queries,
                             k=3, nprobe=2)
    assert not any(r["neighbor_id"] == 0 for r in got.collect())
    AI.ivf_index_compact(spark, store, "ann")
    assert store.read(spark, "ann__vectors") \
        .filter(F.col("vec_id") == 0).count() == 0
    assert store.read(spark, "ann__tombstones").count() == 0
