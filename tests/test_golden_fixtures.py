"""Second-oracle golden fixtures for the five subtlest oracled
queries (funnel, contamination matrix, join IVM, dedup ingest, BPE).

The driver's correctness gate proves Spark == DuckDB twin; these
tests break the remaining failure mode — a CORRELATED-wrong pair,
where both twins implement the same wrong semantics. Each test runs
the real suite query on a tiny crafted table whose expected output is
derived BY HAND from the documented semantics (first-fail
attribution, keep-first model, delta-join rule, set-Jaccard, greedy
lexicographic BPE), never by running either engine. The fixtures are
designed so the hand derivation is exact arithmetic: disjoint-shingle
texts make near-dup coincide with exact-dup, one-character-per-step
words make every BPE argmax a lexicographic tie-break, etc."""

import os

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.plans.engine_suite import ENGINE_QUERIES
from linz_bde_uploader_spark.plans.pipeline_suite import PIPELINE_QUERIES


def _write_docs(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "documents.parquet"))


def _w(prefix, n, length=5):
    """n distinct alpha words of the given length."""
    base = "abcdefghijklmnopqrstuvwxyz"
    out = []
    for i in range(n):
        w = (prefix + base[i % 26] + base[(i * 7 + 3) % 26]
             + base[(i * 11 + 5) % 26])
        out.append((w + "x" * length)[:length])
    # ensure distinctness even after truncation
    return [f"{w[:length - 1]}{base[i % 26]}" for i, w in enumerate(out)]


def test_golden_filter_funnel(spark, tmp_path):
    """Hand-derived funnel: nine docs, one engineered to fail each
    stage FIRST (and only that stage among the earlier ones), one
    exact dup among survivors, two survivors. Expected ledger:
    rejected = 1 per stage, survivors = 8,7,6,5,4,3,2."""
    filler = _w("q", 20)          # 20 distinct 5-char alpha words
    f18 = _w("z", 18)
    survivor = "the " + " ".join(f18[:9]) + " and " + " ".join(f18[9:])
    rows = [
        # stage 1: word count 2 < 20
        (1, "alpha beta", "en", "web", 10),
        # stage 2: 20 words of length 2 -> sumlen 40 < 3*20
        (2, " ".join(["ab", "cd", "ef", "gh", "ij"] * 4), "en", "web", 1),
        # stage 3: 3 of 20 words start with '#' -> 30 > 20
        (3, " ".join(["#aaaa", "#bbbb", "#cccc"] + filler[:17]),
         "en", "web", 1),
        # stage 4: 5 digit words -> alpha 15*5=75 < 80
        (4, " ".join(["11111", "22222", "33333", "44444", "55555"]
                     + filler[:15]), "en", "web", 1),
        # stage 5: zero stopwords
        (5, " ".join(filler), "en", "web", 1),
        # stage 6: passes content rules ('the'+'and' give sw=2) but
        # lang != en
        (6, "the " + " ".join(filler[:9]) + " and "
            + " ".join(filler[9:18]), "de", "web", 1),
        # stage 7: exact dup (doc 8) of survivor doc 7
        (7, survivor, "en", "web", 1),
        (8, survivor, "en", "web", 1),
        # survivor #2
        (9, "of " + " ".join(f18[:9]) + " to " + " ".join(f18[9:]),
         "en", "web", 1),
    ]
    _write_docs(spark, str(tmp_path), rows)
    fn, _sql = PIPELINE_QUERIES["docs_filter_funnel"]
    got = {r["stage_no"]: (r["stage"], r["rejected"], r["survivors"])
           for r in fn(spark, str(tmp_path)).collect()}
    assert got == {
        1: ("word_count", 1, 8),
        2: ("mean_word_len", 1, 7),
        3: ("symbol_ratio", 1, 6),
        4: ("alpha_words", 1, 5),
        5: ("stopwords", 1, 4),
        6: ("lang_en", 1, 3),
        7: ("exact_dup", 1, 2),
    }


def test_golden_cross_source_overlap(spark, tmp_path):
    """Hand-derived contamination matrix. The query augments the
    corpus with mirror (doc_id%50==0) and crawl2 (doc_id%70==0)
    copies; ids are chosen to hit each rule: 50 -> mirror only,
    70 -> crawl2 only, 350 -> both, 1 -> neither, and doc 2 plants a
    genuine web/books shared content. Distinct (content, source)
    sets: X={books,mirror,web}, Y={crawl2,web}, Z={crawl2,mirror,web},
    W={web}; sizes web=4, books=1, mirror=2, crawl2=2. Every pair
    count and set-Jaccard below follows by hand."""
    rows = [
        (50, "content X words here", "en", "web", 1),
        (70, "content Y other words", "en", "web", 1),
        (350, "content Z third words", "en", "web", 1),
        (1, "content W unique words", "en", "web", 1),
        (2, "content X words here", "en", "books", 1),
    ]
    _write_docs(spark, str(tmp_path), rows)
    fn, _sql = PIPELINE_QUERIES["docs_cross_source_overlap"]
    got = {(r["source_a"], r["source_b"]): (r["n_shared"], r["jaccard"])
           for r in fn(spark, str(tmp_path)).collect()}
    assert got == {
        ("books", "mirror"): (1, 1 / 2),
        ("books", "web"): (1, 1 / 4),
        ("crawl2", "mirror"): (1, 1 / 3),
        ("crawl2", "web"): (2, 2 / 4),
        ("mirror", "web"): (2, 2 / 4),
    }


def test_golden_dedup_ingest(spark, tmp_path):
    """Hand-derived dedup-on-ingest verdicts via the keep-first
    model: texts are 15 disjoint key-derived words, so two docs share
    ANY shingle iff they share the key — near-dup coincides with
    exact-dup and the expected verdicts are pure arithmetic. Corpus
    side is doc_id%5!=0 (ids 1,2,3,4 with keys A,B,A,C), batch side
    doc_id%5==0 (5:A exact of corpus min 1; 10:D new; 15:D keep-first
    dup of batchmate 10; 20:E new)."""
    def text_for(k):
        return " ".join(f"w{k}x{i}" for i in range(15))

    rows = [
        (1, text_for("A"), "en", "web", 1),
        (2, text_for("B"), "en", "web", 1),
        (3, text_for("A"), "en", "web", 1),
        (4, text_for("C"), "en", "web", 1),
        (5, text_for("A"), "en", "web", 1),
        (10, text_for("D"), "en", "web", 1),
        (15, text_for("D"), "en", "web", 1),
        (20, text_for("E"), "en", "web", 1),
    ]
    _write_docs(spark, str(tmp_path), rows)
    fn, _sql = PIPELINE_QUERIES["docs_dedup_ingest"]
    got = {r["doc_id"]: (r["verdict"], r["dup_of"])
           for r in fn(spark, str(tmp_path)).collect()}
    assert got == {
        5: ("exact_dup", 1),
        10: ("new", -1),
        15: ("exact_dup", 10),
        20: ("new", -1),
    }


def test_golden_cdc_join_refresh(spark, tmp_path):
    """Hand-derived delta-join view. cdc_frames derives the scenario
    from key arithmetic: key 7 is INSERT (absent from cur), key 3
    DELETE (absent from stg), key 5 UPDATE (+10.0 price), key 11
    no-op '0', key 1 untouched. Expected view = merged state inner-
    joined to customer: key 3 gone, key 1 excluded (custkey 999 has
    no dimension row — inner-join semantics), keys 5 (price
    100.50+10 -> 11050 cents), 7 and 11 present."""
    orders = spark.createDataFrame(
        [(1, 999, "O", 11.00, "1995-01-01", "1-URGENT"),
         (3, 101, "F", 33.00, "1995-01-02", "2-HIGH"),
         (5, 102, "O", 100.50, "1995-01-03", "3-MEDIUM"),
         (7, 103, "P", 77.25, "1995-01-04", "2-HIGH"),
         (11, 104, "F", 44.10, "1995-01-05", "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string")
    orders.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(str(tmp_path), "orders.parquet"))
    customer = spark.createDataFrame(
        [(101, "AUTOMOBILE", 1), (102, "BUILDING", 2),
         (103, "MACHINERY", 3), (104, "HOUSEHOLD", 4)],
        "c_custkey long, c_mktsegment string, c_nationkey int")
    customer.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(str(tmp_path), "customer.parquet"))
    fn, _sql = ENGINE_QUERIES["cdc_join_refresh"]
    got = {r["o_orderkey"]:
           (r["o_orderstatus"], r["price_cents"],
            r["c_mktsegment"], r["c_nationkey"])
           for r in fn(spark, str(tmp_path)).collect()}
    assert got == {
        5: ("O", 11050, "BUILDING", 2),
        7: ("P", 7725, "MACHINERY", 3),
        11: ("F", 4410, "HOUSEHOLD", 4),
    }


def test_golden_bpe_merges(spark, tmp_path):
    """Hand-derived BPE merge table: a single word 'abcdefghi' makes
    every round's pair frequencies all-equal, so each argmax is the
    pure lexicographic tie-break on (a, b) — the merged prefix is
    always the smallest left symbol, giving the exact chain
    (a,b),(ab,c),...,(abcdefgh,i) for 8 merges."""
    _write_docs(spark, str(tmp_path),
                [(1, "abcdefghi", "en", "web", 9)])
    fn, _sql = PIPELINE_QUERIES["text_bpe_merges"]
    got = [(r["rank"], r["a"], r["b"])
           for r in fn(spark, str(tmp_path))
           .orderBy("rank").collect()]
    assert got == [
        (1, "a", "b"), (2, "ab", "c"), (3, "abc", "d"),
        (4, "abcd", "e"), (5, "abcde", "f"), (6, "abcdef", "g"),
        (7, "abcdefg", "h"), (8, "abcdefgh", "i"),
    ]


def test_golden_events_transition_matrix(spark, tmp_path):
    """Hand-derived per-user Markov matrix: three tiny journeys with
    known gaps, including a same-timestamp tie broken by event_id.
    user 1: view -(30s)-> click -(60s)-> buy; user 2:
    view -(10s)-> view -(60s)-> click; user 3: click -(0s, tie on
    ts, event_id order)-> view. Expected cells follow by hand;
    terminal events drop out."""
    from datetime import datetime

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return datetime(2024, 1, 1, 12, 0, sec)

    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, at(30), 1, "click", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 12, 1, 30), 1, "buy", 1.0, "{}"),
        (4, t0, 2, "view", 1.0, "{}"),
        (5, at(10), 2, "view", 1.0, "{}"),
        (6, datetime(2024, 1, 1, 12, 1, 10), 2, "click", 1.0, "{}"),
        (7, t0, 3, "click", 1.0, "{}"),
        (8, t0, 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    from linz_bde_uploader_spark.plans.analytics_suite import (
        ANALYTICS_QUERIES,
    )
    fn, _sql = ANALYTICS_QUERIES["events_transition_matrix"]
    got = {(r["from_type"], r["to_type"]): (r["n"], r["gap_total_us"])
           for r in fn(spark, str(tmp_path)).collect()}
    assert got == {
        ("view", "click"): (2, 90_000_000),
        ("click", "buy"): (1, 60_000_000),
        ("view", "view"): (1, 10_000_000),
        ("click", "view"): (1, 0),
    }


def test_golden_dedup_best_survivors(spark, tmp_path):
    """Hand-derived quality survivorship: doc 2 is doc 1 plus three
    extra tail words (shingle Jaccard 13/16 — a verified near-dup),
    so the cluster is {1, 2} labeled 1, and the LONGEST member (2)
    survives while keep-first would have kept 1. Docs 3 and 4 are
    identical twins (tie on length -> smallest id, 3, survives).
    Expected drops: (1, cluster 1, survivor 2) and
    (4, cluster 3, survivor 3)."""
    a_words = [f"w{i}" for i in range(15)]
    a = " ".join(a_words)
    b = " ".join(a_words + ["tail", "words", "extra"])
    c = " ".join(f"z{i}" for i in range(15))
    rows = [
        (1, a, "en", "web", 1),
        (2, b, "en", "web", 1),
        (3, c, "en", "web", 1),
        (4, c, "en", "web", 1),
    ]
    _write_docs(spark, str(tmp_path), rows)
    fn, _sql = PIPELINE_QUERIES["dedup_best_survivors"]
    got = {r["doc_id"]: (r["cluster_id"], r["survivor_id"])
           for r in fn(spark, str(tmp_path)).collect()}
    assert got == {1: (1, 2), 4: (3, 3)}


def test_golden_cdc_incremental_agg(spark, tmp_path):
    """Hand-derived IVM aggregate through the CDC merge, same crafted
    orders fixture as the join golden (key 3 deleted, key 5 price
    100.50 -> 110.50, key 7 inserted, key 11 no-op, key 1 untouched).
    Post-merge state by hand: O holds keys 1 (11.00) and 5 (110.50),
    P holds key 7 (77.25), F holds key 11 (44.10) — so the maintained
    view must read O:(2,2,12150), P:(1,1,7725), F:(1,1,4410) in
    integer cents."""
    orders = spark.createDataFrame(
        [(1, 999, "O", 11.00, "1995-01-01", "1-URGENT"),
         (3, 101, "F", 33.00, "1995-01-02", "2-HIGH"),
         (5, 102, "O", 100.50, "1995-01-03", "3-MEDIUM"),
         (7, 103, "P", 77.25, "1995-01-04", "2-HIGH"),
         (11, 104, "F", 44.10, "1995-01-05", "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string")
    orders.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(str(tmp_path), "orders.parquet"))
    fn, _sql = ENGINE_QUERIES["cdc_incremental_agg"]
    got = {r["o_orderstatus"]: (r["n"], r["n_vals"], r["total_cents"])
           for r in fn(spark, str(tmp_path)).collect()}
    assert got == {
        "O": (2, 2, 12150),
        "P": (1, 1, 7725),
        "F": (1, 1, 4410),
    }


def test_golden_hll_registers_pure_python(spark):
    """Engine-free third implementation of the HLL sketch: registers
    and estimate recomputed in pure Python over hashlib.md5 —
    independent of BOTH the Spark plan and the DuckDB oracle (which
    share their estimate expression text by design, so a differential
    match alone could hide a correlated-wrong formula). Pins hash
    extraction, register split, rho, the 2^(53-rho) sum, the
    linear-counting branch selection, and the micro-unit floor."""
    import hashlib
    import math

    from linz_bde_uploader_spark.operators.sketches import (
        hll_distinct, hll_registers)

    keys = [f"user{i}" for i in range(500)]
    df = spark.createDataFrame([("g", k) for k in keys],
                               "g string, k string")

    # pure-python registers
    P52 = 2 ** 52
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[17:32], 16)
        idx, w = h // P52, h % P52
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)

    got_regs = {r.idx: r.m for r in
                hll_registers(df, ["g"], F.col("k")).collect()}
    assert got_regs == regs

    # pure-python estimate (same algorithm, independent code path)
    s = sum(2 ** (53 - m) for m in regs.values()) \
        + (256 - len(regs)) * 2 ** 53
    v = 256 - len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 65536.0 / (float(s) / 9007199254740992.0)
    if raw <= 640.0 and v > 0:
        est = math.floor(256.0 * round(math.log(256.0 / float(v)), 12)
                         * 1000000.0)
    else:
        est = math.floor(raw * 1000000.0)
    (row,) = hll_distinct(df, ["g"], F.col("k")).collect()
    assert row.hll_est_micro == est
    # and the estimate is a sane distinct count for 500 keys
    assert abs(row.hll_est_micro / 1e6 - 500) <= 0.26 * 500


def test_golden_kmv_estimate_pure_python(spark):
    """Engine-free KMV: k-th smallest md5-derived hash and the
    (k-1)/kth-fraction estimate recomputed with hashlib + sorted()."""
    import hashlib
    import math

    from linz_bde_uploader_spark.operators.sketches import kmv_distinct

    keys = [f"item{i}" for i in range(300)]
    df = spark.createDataFrame([("g", k) for k in keys],
                               "g string, k string")
    hs = sorted({int(hashlib.md5(k.encode()).hexdigest()[17:32], 16)
                 for k in keys})
    kth = hs[63]
    est = math.floor(
        63.0 * (1152921504606846976.0 / float(kth)) * 1000000.0)
    (row,) = kmv_distinct(df, ["g"], F.col("k")).collect()
    assert row.kmv_est_micro == est
    assert abs(row.kmv_est_micro / 1e6 - 300) <= 0.51 * 300


def test_golden_bigram_logprob_pure_python(spark, tmp_path):
    """Engine-free third implementation of the bigram-LM scorer on a
    hand-crafted fixture that exercises ALL THREE probability
    branches: train doc (id 0) = 'a b a c'; score doc 1 = 'a b d'
    hits the seen-bigram branch (a,b -> 1/2) and the OOV branch
    (d -> 0.4/4); score doc 3 = 'c a' hits the backoff branch (c,a
    unseen, a seen -> 0.4 * 2/4). Expected means computed with
    math.log + Decimal in pure Python — independent of both the
    Spark plan and the DuckDB oracle."""
    import math
    from decimal import Decimal

    from linz_bde_uploader_spark.plans.pipeline_suite import (
        q_text_bigram_logprob)

    _write_docs(spark, str(tmp_path), [
        (0, "a b a c", "en", "s", 7),
        (1, "a b d", "en", "s", 5),
        (3, "c a", "en", "s", 3),
    ])

    def term(x):
        return Decimal(str(round(math.log(x), 12)))

    exp1 = round(float((term(1 / 2) + term(0.4 * (1 / 4))) / 2), 6)
    exp3 = round(float(term(0.4 * (2 / 4)) / 1), 6)

    got = {r.doc_id: (r.n_bigrams, r.mean_logprob) for r in
           q_text_bigram_logprob(spark, str(tmp_path)).collect()}
    assert got == {1: (2, exp1), 3: (1, exp3)}
