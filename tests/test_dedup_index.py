"""Dedup-on-ingest service shape (operators/dedup_index.py): build an
index over a corpus, classify batches against it (exact / near / new),
admit only the new docs, stay idempotent in state under replay, and
survive compaction — the dedup-family analog of test_ann_index.py."""

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators import dedup_index as DI
from linz_bde_uploader_spark.sources.store import TableStore

# heavy module: excluded from the inner-loop run (pytest.ini, -m "not slow")
pytestmark = pytest.mark.slow

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "patient heron watches from the river bank and the morning "
        "light settles on the quiet water near the old stone bridge "
        "where travellers used to rest their horses every evening")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ingest(spark, store, batch, name, **kw):
    """Collect an ingest's verdicts honoring the module contract:
    the returned frame is persisted and the caller unpersists it."""
    df = DI.dedup_index_ingest(spark, store, batch, name, **kw)
    try:
        return df.collect()
    finally:
        df.unpersist()


@pytest.fixture()
def store(tmp_path):
    return TableStore(str(tmp_path / "store"), n_buckets=4)


def corpus(spark):
    return _docs(spark, [
        (1, BASE),
        (2, "completely unrelated second document about spark "
            "partitioning strategies and shuffle costs at scale "
            "with broadcast joins and adaptive execution plans "
            "tuned for very large clusters and skewed keys"),
        (3, "third doc with its own distinct content entirely "
            "concerning minhash signatures and band hashing for "
            "locality sensitive lookup of near duplicate text "
            "across enormous web scale document collections"),
    ])


def test_build_ingest_verdicts(spark, store):
    DI.dedup_index_build(spark, store, corpus(spark), "idx")
    batch = _docs(spark, [
        (10, BASE),                       # exact dup of corpus doc 1
        (11, BASE.replace("every evening", "each evening")),  # near
        (12, "a genuinely new document that shares no phrasing "
             "with anything already ingested into this corpus "
             "and speaks only of weather patterns over the sea "
             "and the slow migration of seabirds in autumn"),
        (13, "a genuinely new document that shares no phrasing "
             "with anything already ingested into this corpus "
             "and speaks only of weather patterns over the sea "
             "and the slow migration of seabirds in autumn"),  # = 12
    ])
    v = {r["id"]: (r["verdict"], r["dup_of"])
         for r in _ingest(spark, store, batch, "idx")}
    assert v[10] == ("exact_dup", 1)
    assert v[11] == ("near_dup", 1)
    assert v[12] == ("new", None)
    assert v[13] == ("exact_dup", 12)  # keep-first within the batch
    # only doc 12 was admitted
    delta = store.read(spark, "idx__content_delta")
    assert [r["canonical_id"] for r in delta.collect()] == [12]


def test_replay_is_idempotent_in_state(spark, store):
    DI.dedup_index_build(spark, store, corpus(spark), "idx")
    batch = _docs(spark, [
        (20, "fresh content about volcanic soil and the terraced "
             "gardens that thrive on it high above the valley "
             "floor where the fog gathers before sunrise and "
             "the farmers climb with baskets of seed"),
    ])
    v1 = {r["id"]: r["verdict"] for r in
          _ingest(spark, store, batch, "idx")}
    assert v1 == {20: "new"}
    n_content = store.read(spark, "idx__content_delta").count()
    n_bands = store.read(spark, "idx__bands_delta").count()

    # at-least-once redelivery: state unchanged, verdict degrades to
    # exact_dup (the doc now IS in the corpus)
    v2 = {r["id"]: (r["verdict"], r["dup_of"]) for r in
          _ingest(spark, store, batch, "idx")}
    assert v2 == {20: ("exact_dup", 20)}
    assert store.read(spark, "idx__content_delta").count() == n_content
    assert store.read(spark, "idx__bands_delta").count() == n_bands


def test_compact_folds_and_stales_delta(spark, store):
    DI.dedup_index_build(spark, store, corpus(spark), "idx")
    batch = _docs(spark, [
        (30, "entirely novel text on the repair of clockwork "
             "mechanisms and the patience required to seat a "
             "hairspring correctly under a loupe in a quiet "
             "workshop at the edge of the old town square"),
    ])
    _ingest(spark, store, batch, "idx")
    base_before = store.read(spark, "idx__content").count()
    folded = DI.dedup_index_compact(spark, store, "idx")
    assert folded > 0
    assert store.read(spark, "idx__content").count() == base_before + 1
    # deltas are now stale (stamped for the pre-compact bases) and
    # ignored: membership still holds purely from the bases
    v = {r["id"]: r["verdict"] for r in
         _ingest(spark, store, batch, "idx")}
    assert v == {30: "exact_dup"}
    # and a second compact folds nothing (stale deltas skipped)
    assert DI.dedup_index_compact(spark, store, "idx") == 0


def test_near_dup_suppressed_not_indexed(spark, store):
    """A near-dup contributes NO index rows: after ingesting a near
    variant, a doc matching only that variant's unique tail is still
    judged against the original corpus only."""
    DI.dedup_index_build(spark, store, corpus(spark), "idx")
    near = _docs(spark, [(40, BASE.replace("every evening",
                                           "each evening"))])
    v = {r["id"]: r["verdict"] for r in
         _ingest(spark, store, near, "idx")}
    assert v == {40: "near_dup"}
    assert not store.exists("idx__content_delta") or \
        store.read(spark, "idx__content_delta").count() == 0


def test_stream_dedup_ingest(spark, store, tmp_path):
    """Streaming form: the bootstrap drain creates an EMPTY index and
    classifies batch one through the normal ingest path (so
    intra-batch near-dups are suppressed at bootstrap — building the
    index FROM the raw batch would have admitted them wholesale), a
    later drain classifies-and-appends, and a full replay on a fresh
    checkpoint (the at-least-once worst case) leaves the index state
    unchanged — the ingest's state idempotency IS the replay guard."""
    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    b1 = corpus(spark).unionByName(_docs(spark, [
        # intra-batch near-dup of doc 1: must be suppressed at
        # bootstrap, not admitted
        (4, BASE.replace("every evening", "each evening"))]))
    b1.write.mode("overwrite").parquet(src)
    DI.stream_dedup_ingest(spark, src, store, "sidx",
                           str(tmp_path / "c1"), schema)
    assert store.exists("sidx__content")
    # bootstrap base is EMPTY; batch one's admitted docs land in the
    # delta via the normal ingest path, near-dup doc 4 suppressed
    assert store.read(spark, "sidx__content").count() == 0
    members = {r["canonical_id"] for r in
               store.read(spark, "sidx__content_delta").collect()}
    assert members == {1, 2, 3}

    b2 = _docs(spark, [
        (50, BASE),  # exact dup of streamed doc 1
        (51, "wholly new narrative concerning the harvest moon "
             "festival and the paper lanterns released over the "
             "harbour by children at dusk while the fishing "
             "boats return loaded with the day's silver catch"),
    ])
    b2.write.mode("append").parquet(src)
    DI.stream_dedup_ingest(spark, src, store, "sidx",
                           str(tmp_path / "c1"), schema)
    delta = {r["canonical_id"] for r in
             store.read(spark, "sidx__content_delta").collect()}
    assert delta == {1, 2, 3, 51}  # only the new doc joined

    # full replay, fresh checkpoint: every file reprocessed, index
    # unchanged (docs classify exact_dup against their own rows)
    vc = store.current_version("sidx__content_delta")
    DI.stream_dedup_ingest(spark, src, store, "sidx",
                           str(tmp_path / "c2"), schema)
    assert store.current_version("sidx__content_delta") == vc
    assert {r["canonical_id"] for r in
            store.read(spark, "sidx__content_delta").collect()} == \
        {1, 2, 3, 51}


def test_membership_join_moves_batch_side_only(spark, tmp_path):
    """The scale claim behind key='content_hash': with the
    catalog-bucketed store, the ingest's exact-membership join
    exchanges ONLY the batch side — the corpus-sized content table is
    scanned in place (one Exchange in the plan, not two). Same
    physical property test_store_catalog_buckets_elide_merge_shuffle
    pins for the CDC merge, applied to the dedup index."""
    store = TableStore(str(tmp_path / "s"), n_buckets=4,
                       use_catalog_buckets=True)
    docs = _docs(spark, [
        (i, f"alpha bravo charlie delta marker{i} echo foxtrot "
            f"golf hotel india juliet kilo lima")
        for i in range(60)])
    DI.dedup_index_build(spark, store, docs, "bidx")
    batch = _docs(spark, [(100, "some incoming batch text with "
                                "enough words to shingle properly "
                                "and exercise the membership join")])
    bc = batch.select(F.col("doc_id").alias("id"),
                      F.md5("text").alias("content_hash"))
    stored = DI._with_delta(spark, store, "bidx__content",
                            "bidx__content_delta")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (bc.join(stored, "content_hash")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# content keys: a doc's text is 15 unique words derived from its key,
# so two docs share shingles iff they share the key — near-dup
# coincides with exact-dup and the verdict model is exact arithmetic
_key = st.integers(min_value=0, max_value=5)
_corpus_tbl = st.dictionaries(st.integers(min_value=0, max_value=9),
                              _key, max_size=5)
_batch_tbl = st.dictionaries(st.integers(min_value=10, max_value=19),
                             _key, max_size=6)


def _text_for(k: int) -> str:
    return " ".join(f"w{k}x{i}" for i in range(15))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(cor=_corpus_tbl, bat=_batch_tbl)
def test_ingest_matches_keepfirst_model(spark, tmp_path_factory,
                                        cor, bat):
    """Property pin of the candidate/keep-first/dup_of logic: with
    disjoint-shingle texts (sharing iff same content key), the
    verdict must be exact_dup with dup_of = the smallest corpus id
    holding the key, else the smallest smaller batch id holding it,
    else new — for every random mix of corpus collisions, intra-batch
    collisions, and fresh keys. Also pins state idempotency: an
    immediate replay returns all exact_dup/self and appends nothing."""
    store = TableStore(str(tmp_path_factory.mktemp("pstore")),
                       n_buckets=2)
    corpus_df = _docs(spark, [(i, _text_for(k))
                              for i, k in sorted(cor.items())] or
                      [(99, _text_for(99))])
    batch_items = sorted(bat.items())
    if not batch_items:
        return
    batch_df = _docs(spark, [(i, _text_for(k)) for i, k in batch_items])
    DI.dedup_index_build(spark, store, corpus_df, "p")
    got = {r["id"]: (r["verdict"], r["dup_of"]) for r in
           _ingest(spark, store, batch_df, "p")}

    admitted = set()
    for i, k in batch_items:  # ascending id = keep-first order
        c_ids = [j for j, ck in cor.items() if ck == k] or \
            ([99] if not cor and k == 99 else [])
        b_ids = [j for j, bk in batch_items if bk == k and j < i]
        cands = c_ids + b_ids
        if cands:
            assert got[i] == ("exact_dup", min(cands)), (i, k, got)
        else:
            assert got[i] == ("new", None), (i, k, got)
            admitted.add(i)

    n_delta = (store.read(spark, "p__content_delta").count()
               if store.exists("p__content_delta") else 0)
    assert n_delta == len(admitted)
    replay = {r["id"]: r["verdict"] for r in
              _ingest(spark, store, batch_df, "p")}
    assert all(v == "exact_dup" for v in replay.values())
    assert (store.read(spark, "p__content_delta").count()
            if store.exists("p__content_delta") else 0) == n_delta


def test_crash_between_delta_writes_is_conservative(spark, store):
    """The three-table append's LAST crash window must fail
    CONSERVATIVE: bands + sigs deltas committed, content delta lost.
    After the crash, both exact and NEAR copies of the crashed
    batch's docs must still be suppressed (band minima present,
    signatures present so suppression verifies normally) — the
    reverse write order would admit near-copies forever, silently
    contaminating the corpus. The replay classifies the crashed docs
    as dups of themselves and appends nothing (state converges;
    verdict label degrades exact->near for copies, the documented
    trade)."""
    DI.dedup_index_build(spark, store, corpus(spark), "idx")
    novel = ("a wholly original passage describing the slow art of "
             "binding books by hand with linen thread and bone "
             "folder creasing each signature before sewing them "
             "onto cords stretched across the wooden press frame")
    batch = _docs(spark, [(60, novel)])

    orig_write = store.write

    def crashing_write(table, df, **kwargs):
        if table == "idx__content_delta":
            raise RuntimeError("injected crash after bands write")
        return orig_write(table, df, **kwargs)

    store.write = crashing_write
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            DI.dedup_index_ingest(spark, store, batch, "idx")
    finally:
        store.write = orig_write

    # crash window on disk: bands + sigs deltas landed, content absent
    assert store.exists("idx__bands_delta")
    assert store.exists("idx__sigs_delta")
    assert not store.exists("idx__content_delta")

    # exact copy: suppressed (as near_dup — the documented label
    # degradation); near copy: suppressed; nothing contaminates
    probe = _docs(spark, [
        (61, novel),                                    # exact copy
        (62, novel.replace("wooden press", "oak press"))])  # near
    v = {r["id"]: (r["verdict"], r["dup_of"]) for r in
         _ingest(spark, store, probe, "idx")}
    assert v[61] == ("near_dup", 60)
    assert v[62] == ("near_dup", 60)
    assert not store.exists("idx__content_delta")  # nothing admitted

    # replay of the crashed batch: dup of itself, appends nothing new
    rv = {r["id"]: (r["verdict"], r["dup_of"]) for r in
          _ingest(spark, store, batch, "idx")}
    assert rv[60] == ("near_dup", 60)


def test_crash_before_sigs_write_is_conservative(spark, store):
    """The FIRST crash window: bands delta committed, sigs AND
    content lost. Suppression then rests solely on the
    missing-signature-suppresses-unverified rule (the code path with
    the least redundancy): every copy of the crashed docs band-matches
    a candidate whose signature cannot be fetched, and
    ``_cand_sig IS NULL`` suppresses without verification. Exact and
    near copies must both be suppressed (labelled near_dup — no
    content row survived to call them exact), nothing may be
    admitted, and a replay of the crashed batch converges (suppresses
    itself, appends nothing)."""
    DI.dedup_index_build(spark, store, corpus(spark), "idx")
    novel = ("a fully original essay on the craft of dry stone "
             "walling where each stone is chosen for the gap it "
             "fills and the wall drains itself through a thousand "
             "small voids that frost can never seize upon")
    batch = _docs(spark, [(60, novel)])

    orig_write = store.write

    def crashing_write(table, df, **kwargs):
        if table == "idx__sigs_delta":
            raise RuntimeError("injected crash after bands write")
        return orig_write(table, df, **kwargs)

    store.write = crashing_write
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            DI.dedup_index_ingest(spark, store, batch, "idx")
    finally:
        store.write = orig_write

    # crash window on disk: bands delta ALONE landed
    assert store.exists("idx__bands_delta")
    assert not store.exists("idx__sigs_delta")
    assert not store.exists("idx__content_delta")

    # exact copy AND near copy both suppress via the missing-sig
    # branch; nothing contaminates the corpus
    probe = _docs(spark, [
        (61, novel),                                      # exact copy
        (62, novel.replace("dry stone", "drystack"))])    # near copy
    v = {r["id"]: (r["verdict"], r["dup_of"]) for r in
         _ingest(spark, store, probe, "idx")}
    assert v[61] == ("near_dup", 60)
    assert v[62] == ("near_dup", 60)
    assert not store.exists("idx__content_delta")  # nothing admitted

    # replay of the crashed batch converges: dup of itself, no appends
    rv = {r["id"]: (r["verdict"], r["dup_of"]) for r in
          _ingest(spark, store, batch, "idx")}
    assert rv[60] == ("near_dup", 60)
    assert not store.exists("idx__content_delta")


def test_frozen_banding_ingest_mismatch_raises(spark, store):
    """Frozen-banding enforcement (_check_params): an index built
    with non-default banding rejects an ingest under explicitly
    different parameters — mismatched band keys would corrupt
    membership silently — while a default-argument ingest RESOLVES
    the persisted identity (None-sentinel contract, same rule as
    the compact) and classifies correctly."""
    DI.dedup_index_build(spark, store, corpus(spark), "fidx",
                         num_perm=32, bands=8)
    assert store.table_meta("fidx__content") == {
        "num_perm": 32, "bands": 8, "shingle_words": 3,
        "key_layout": 2}
    batch = _docs(spark, [(70, BASE)])
    with pytest.raises(ValueError, match="frozen at build"):
        DI.dedup_index_ingest(spark, store, batch, "fidx",
                              num_perm=16, bands=4)
    with pytest.raises(ValueError, match="frozen at build"):
        DI.dedup_index_ingest(spark, store, batch, "fidx",
                              num_perm=32, bands=8, shingle_words=5)
    # absent args resolve from meta — not the literal defaults
    v = {r["id"]: (r["verdict"], r["dup_of"]) for r in
         _ingest(spark, store, batch, "fidx")}
    assert v[70] == ("exact_dup", 1)
    v = {r["id"]: (r["verdict"], r["dup_of"]) for r in
         _ingest(spark, store, batch, "fidx", num_perm=32, bands=8)}
    assert v[70] == ("exact_dup", 1)


def test_compact_explicit_mismatch_raises(spark, store):
    DI.dedup_index_build(spark, store, corpus(spark), "cidx",
                         num_perm=8, bands=4)
    with pytest.raises(ValueError, match="frozen at build"):
        DI.dedup_index_compact(spark, store, "cidx", num_perm=16)
    with pytest.raises(ValueError, match="frozen at build"):
        DI.dedup_index_compact(spark, store, "cidx", bands=2)


NOVEL31 = ("entirely novel text on the repair of clockwork "
           "mechanisms and the patience required to seat a "
           "hairspring correctly under a loupe in a quiet "
           "workshop at the edge of the old town square")


def test_purge_compact_recovers_banding_matches_fresh_build(
        spark, store, tmp_path):
    """The r10/r11 'done' criterion: under NON-default banding, a
    no-arg purge-compact recovers the banding from the persisted
    identity and rebuilds band minima IDENTICAL to a from-scratch
    build over the surviving docs — and the identity survives both
    the index compact and the store's own maintenance rewrite."""
    docs = corpus(spark)
    DI.dedup_index_build(spark, store, docs, "ridx",
                         num_perm=8, bands=4)
    _ingest(spark, store, _docs(spark, [(31, NOVEL31)]), "ridx",
            num_perm=8, bands=4)
    DI.dedup_index_delete(
        spark, store, spark.createDataFrame([(2,)], "doc_id long"),
        "ridx")
    DI.dedup_index_compact(spark, store, "ridx")  # NO args: recovered
    # key_layout rides along: frozen at build (r20), preserved by the
    # purge-compact's meta re-stamp
    assert store.table_meta("ridx__content") == {
        "num_perm": 8, "bands": 4, "shingle_words": 3,
        "key_layout": 2}

    fresh = TableStore(str(tmp_path / "freshstore"), n_buckets=4)
    survivors = docs.filter("doc_id != 2").unionByName(
        _docs(spark, [(31, NOVEL31)]))
    DI.dedup_index_build(spark, fresh, survivors, "f",
                         num_perm=8, bands=4)
    got = {(r["bkey"], r["min_id"]) for r in
           store.read(spark, "ridx__bands").collect()}
    want = {(r["bkey"], r["min_id"]) for r in
            fresh.read(spark, "f__bands").collect()}
    assert got == want and len(got) > 0
    got_c = {(r["content_hash"], r["canonical_id"]) for r in
             store.read(spark, "ridx__content").collect()}
    want_c = {(r["content_hash"], r["canonical_id"]) for r in
              fresh.read(spark, "f__content").collect()}
    assert got_c == want_c

    # identity survives the store's C7 maintenance rewrite too
    store.compact(spark, "ridx__content")
    assert store.table_meta("ridx__content")["num_perm"] == 8

    # suppression still works under the recovered banding
    probe = _docs(spark, [
        (90, BASE.replace("every evening", "each evening"))])
    v = {r["id"]: r["verdict"] for r in
         _ingest(spark, store, probe, "ridx", num_perm=8, bands=4)}
    assert v == {90: "near_dup"}


def test_auto_compact_under_nondefault_banding(spark, store, tmp_path):
    """The ADVICE.md residual gap, closed: an ingest-triggered
    auto-compact threads the ingest's (validated) banding through to
    the purge-rebuild, so standing tombstones are purged under the
    index's OWN band keys, not defaults."""
    docs = corpus(spark)
    DI.dedup_index_build(spark, store, docs, "aidx",
                         num_perm=8, bands=4)
    DI.dedup_index_delete(
        spark, store, spark.createDataFrame([(2,)], "doc_id long"),
        "aidx")
    # thresholds force the size trigger on this very ingest
    _ingest(spark, store, _docs(spark, [(31, NOVEL31)]), "aidx",
            num_perm=8, bands=4,
            auto_compact_ratio=0.01, auto_compact_min_rows=1)
    # the auto-compact ran: delta folded + tombstone purged into base
    assert {r["canonical_id"] for r in
            store.read(spark, "aidx__content").collect()} == {1, 3, 31}
    assert DI._live_delta(spark, store, "aidx__content",
                          "aidx__content_delta") is None
    assert DI._tombstones(spark, store, "aidx") is None
    # ...under the index's own banding: minima == from-scratch build
    fresh = TableStore(str(tmp_path / "afresh"), n_buckets=4)
    DI.dedup_index_build(
        spark, fresh,
        docs.filter("doc_id != 2").unionByName(
            _docs(spark, [(31, NOVEL31)])),
        "f", num_perm=8, bands=4)
    got = {(r["bkey"], r["min_id"]) for r in
           store.read(spark, "aidx__bands").collect()}
    want = {(r["bkey"], r["min_id"]) for r in
            fresh.read(spark, "f__bands").collect()}
    assert got == want and len(got) > 0


def test_premeta_index_fallback_and_identity_learning(spark, store):
    """Pre-meta compatibility (documented fallback) + the learning
    path: an index whose pointer predates meta stamping ingests and
    compacts unenforced under the caller's parameters; a compact
    given explicit values STAMPS them (identity learned once) and
    enforcement holds thereafter."""
    import json as _json
    DI.dedup_index_build(spark, store, corpus(spark), "pidx",
                         num_perm=8, bands=4)
    # simulate an index written before meta stamping
    p = store._pointer("pidx__content")
    with open(p) as fh:
        d = _json.load(fh)
    d["meta"] = None
    with open(p, "w") as fh:
        _json.dump(d, fh)
    assert store.table_meta("pidx__content") is None

    # fallback: _check_params no-ops; ingest under the true params
    v = {r["id"]: (r["verdict"], r["dup_of"]) for r in
         _ingest(spark, store, _docs(spark, [(70, BASE)]), "pidx",
                 num_perm=8, bands=4)}
    assert v[70] == ("exact_dup", 1)

    # compact with explicit correct banding LEARNS the identity
    DI.dedup_index_compact(spark, store, "pidx",
                           num_perm=8, bands=4, shingle_words=3)
    assert store.table_meta("pidx__content") == {
        "num_perm": 8, "bands": 4, "shingle_words": 3}
    # ...and it is enforced from now on (explicit mismatch raises;
    # a default-arg ingest resolves the learned identity instead)
    with pytest.raises(ValueError, match="frozen at build"):
        DI.dedup_index_ingest(spark, store,
                              _docs(spark, [(71, BASE)]), "pidx",
                              num_perm=16, bands=4)
    # the learned identity still classifies correctly
    v2 = {r["id"]: (r["verdict"], r["dup_of"]) for r in
          _ingest(spark, store, _docs(spark, [(71, BASE)]), "pidx",
                  num_perm=8, bands=4)}
    assert v2[71] == ("exact_dup", 1)


def test_premeta_auto_compact_never_stamps_defaults(spark, store):
    """The ADVICE.md None-sentinel gap, closed: a default-argument
    ingest on a pre-meta index forwards all-None banding to the
    auto-compact, so the compact runs under the historical defaults
    but does NOT stamp them as the frozen identity — the caller
    never asserted them. A later compact with the true parameters
    can therefore still learn the identity (previously the literal
    16/4/3 got frozen and the true-parameter compact raised)."""
    import json as _json
    DI.dedup_index_build(spark, store, corpus(spark), "nidx")
    # simulate an index written before meta stamping
    p = store._pointer("nidx__content")
    with open(p) as fh:
        d = _json.load(fh)
    d["meta"] = None
    with open(p, "w") as fh:
        _json.dump(d, fh)

    # thresholds force the size trigger on this very ingest
    _ingest(spark, store, _docs(spark, [(31, NOVEL31)]), "nidx",
            auto_compact_ratio=0.01, auto_compact_min_rows=1)
    # the auto-compact ran (delta folded)...
    assert DI._live_delta(spark, store, "nidx__content",
                          "nidx__content_delta") is None
    # ...but stamped NOTHING: the identity is still unlearned
    assert store.table_meta("nidx__content") is None

    # the index remains recoverable: the true parameters (here the
    # defaults, asserted explicitly) learn the identity
    DI.dedup_index_compact(spark, store, "nidx",
                           num_perm=16, bands=4, shingle_words=3)
    assert store.table_meta("nidx__content") == {
        "num_perm": 16, "bands": 4, "shingle_words": 3}


def test_verify_join_moves_candidate_side_only(spark, tmp_path):
    """The verify-before-suppress scale claim: the estimated-Jaccard
    verification joins the |batch| x bands candidate list against the
    id-clustered signature table, so with the catalog-bucketed store
    only the CANDIDATE side exchanges — the corpus-sized sigs table
    scans in place (one Exchange, not two). Sibling of
    test_membership_join_moves_batch_side_only, applied to the join
    the r10 hardening added."""
    store = TableStore(str(tmp_path / "s"), n_buckets=4,
                       use_catalog_buckets=True)
    docs = _docs(spark, [
        (i, f"alpha bravo charlie delta marker{i} echo foxtrot "
            f"golf hotel india juliet kilo lima")
        for i in range(60)])
    DI.dedup_index_build(spark, store, docs, "vidx")
    cand = spark.createDataFrame([(100, 3), (101, 7)],
                                 "id long, _cand long")
    stored_sigs = DI._with_delta(spark, store, "vidx__sigs",
                                 "vidx__sigs_delta")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (cand.join(stored_sigs.select(F.col("id").alias("_cand"),
                                             F.col("sig").alias("_cs")),
                          "_cand", "left")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
