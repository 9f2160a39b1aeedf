"""Scale-slope soak: the measured answer to the r13 verdict's
largest verification gap ("every 100 TB claim rests on plan audits
and O(.) argument, never on a measured slope").

Runs a chosen query set at sf0.1 AND at the 10x dataset built by
`scripts/make_scale_data.py`, min-over-warm-reps at each scale, and
records the wall-time ratio next to the 10x data ratio. A
linear-time plan should land near 10x (usually below — fixed stage
costs amortize); anything superlinear is a scale bug the sf0.1
bench could never see. The set is the top-10 most expensive
headline queries plus the three BASELINE.md-adjudicated divergences
(`dedup_survivors`, `dedup_simhash`, `sim_lsh_topk`) whose standing
defense is "fixed stage constant, NOT slope" — the two data points
turn that argument into a measurement.

Also re-runs bench.py's `_ivm_soak` and `_hll_soak` at both scales:
at sf0.1 their sub-second fixed costs invert the
incremental-vs-full comparison (r13 verdict "what's wrong" #4);
the 10x point is where the crossover should appear.

Output: `SCALE_SOAK.json` at the repo root (committed), embedded
verbatim into `BENCH_DETAIL.json` by bench.py under "scale_soak"
with its recording provenance. Run:

    python scripts/make_scale_data.py   # once, ~1 min
    python scripts/scale_soak.py [--reps-small 3] [--reps-big 2]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(REPO, ".scale_data", "sf1")

# top-10 headline by r13 cost + the three adjudicated divergences
QUERIES = [
    "docs_dedup_ingest", "docs_contrastive_pairs",
    "sim_near_pairs_capped", "text_bpe_merges", "dedup_near_survivors",
    "dedup_clusters", "dedup_best_survivors", "emb_near_dedup",
    "dedup_simhash", "docs_split_leakage_safe",
    # adjudicated (dedup_simhash doubles as top-10 member)
    "dedup_survivors", "sim_lsh_topk",
    # r15: the densification-bounded twin of emb_near_dedup — its
    # ~1x wall ratio belongs beside the uncapped row's adjudicated
    # output-driven blow-up (see density_cap_soak for the A/B)
    "emb_near_dedup_capped",
    # one shuffle-heavy SQL representative + the flagship
    "q1_pricing_summary", "q18_large_orders",
]


def _time_query(fn, spark, sf_dir: str, reps: int) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def run_ivm_extension(ivm_dir: str, label: str) -> None:
    """Run ONLY bench's _ivm_soak/_hll_soak against ``ivm_dir`` (the
    orders-only 100x build) and merge the results into the existing
    SCALE_SOAK.json under ``ivm_soak_<label>``/``hll_soak_<label>``.
    The incremental-vs-full crossover needs a bigger factor than the
    query soak: at 1.5M orders a full groupBy rebuild is still
    ~0.4 s, under the incremental path's fixed stage costs."""
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import bench
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark("scale_soak_ivm")
    path = os.path.join(REPO, "SCALE_SOAK.json")
    try:
        with open(path) as f:
            out = json.load(f)
    except FileNotFoundError:
        out = {}  # --ivm-dir can run standalone; the merge starts fresh
    for soak_name, soak_fn in (("ivm_soak", bench._ivm_soak),
                               ("hll_soak", bench._hll_soak)):
        key = f"{soak_name}_{label}"
        try:
            out[key] = soak_fn(spark, ivm_dir)
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": str(e).splitlines()[0][:300]}
        print(f"# {key}: {json.dumps(out[key])}", file=sys.stderr,
              flush=True)
        bench.release_caches()
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in out if label in k}))


def run_pruned_soak() -> None:
    """Measure what the DPP-pruned touched-group recompute buys on a
    month-partitioned base with a LOCALIZED change batch — the
    workload partial refresh exists for (the reference's dataset
    loads touch recent audit windows; a training-corpus refresh
    touches the newest crawl). 15M orders (sf10) partitioned by
    o_orderdate month (80 partitions); the batch updates 10% of ONE
    mid-range month's keys, so 1 of 80 partitions is touched.

    Three timings per view family (extrema + HLL), min over reps:
    - full: from-scratch rebuild over the merged base;
    - incremental (DPP on): maintain_* against the partitioned
      merged read — the recompute branch's scan should prune to the
      touched month;
    - incremental (DPP off): same plan with
      spark.sql.optimizer.dynamicPartitionPruning.enabled=false —
      the pre-r14 behavior, isolating what pruning itself
      contributes.

    Merged into SCALE_SOAK.json under "pruned_recompute_soak"."""
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import bench
    from pyspark.sql import functions as F

    from linz_bde_uploader_spark.operators import merge as M
    from linz_bde_uploader_spark.operators import sketches as SK
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark("pruned_soak")
    src = os.path.join(REPO, ".scale_data", "sf10", "orders.parquet")
    base_dir = os.path.join(REPO, ".scale_data", "sf10_by_month")
    post_dir = os.path.join(REPO, ".scale_data", "sf10_by_month_post")
    month = "1998-06-01"
    key, grp, val = "o_orderkey", "o_month", "o_totalprice"

    def with_month(df):
        return df.withColumn(
            grp, F.date_format(F.date_trunc("month", "o_orderdate"),
                               "yyyy-MM-dd"))

    if not os.path.exists(base_dir):
        with_month(spark.read.parquet(src)) \
            .write.partitionBy(grp).parquet(base_dir)
    cur = spark.read.parquet(base_dir)
    upd = (cur.filter((F.col(grp) == month) & (F.col(key) % 10 == 0))
           .withColumn(val, F.col(val) + F.lit(1000.0)))
    # the realistic refresh configuration: actions CARRY the group
    # column (classify sees both rows, carrying is free), so touched
    # groups derive O(changes) from the actions frame — no key
    # semi-join rescan of the 15M-row base
    actions = upd.select(
        F.col(key).alias("key"), F.lit("U").alias("action"),
        F.col(grp).alias(f"_old_{grp}"),
        F.col(grp).alias(f"_new_{grp}")).persist()
    n_upd = actions.count()
    if not os.path.exists(post_dir):
        M.apply_actions(cur, upd, actions, key) \
            .write.partitionBy(grp).parquet(post_dir)
    merged = spark.read.parquet(post_dir)
    vt = "decimal(12,2)"
    old_mm = cur.groupBy(grp).agg(
        F.count("*").alias("n"),
        F.min(F.col(val).cast(vt)).alias("vmin"),
        F.max(F.col(val).cast(vt)).alias("vmax")).persist()
    old_mm.count()
    skey = F.col("o_custkey").cast("string")
    old_regs = SK.hll_registers(cur, [grp], skey).persist()
    old_regs.count()

    def best(fn, reps=3):
        t = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().count()
            dt = time.perf_counter() - t0
            t = dt if t is None else min(t, dt)
        return round(t, 3)

    out = {"rows_total": 15_000_000, "rows_changed": n_upd,
           "months_total": 80, "months_touched": 1,
           "loadavg_start": [round(x, 2) for x in os.getloadavg()],
           # hypervisor-steal provenance (bench.py r16): loadavg is
           # blind to a tenant holding the physical CPU; quiet ~0.1%
           "steal_probe_pct": bench._steal_probe_median()}

    def inc_mm(inline=0):
        return M.maintain_extrema(cur, upd, actions, key, [grp], val,
                                  merged, old_extrema=old_mm,
                                  value_type=vt,
                                  groups_nullable=False,
                                  touched_inline_threshold=inline)

    def full_mm():
        return merged.groupBy(grp).agg(
            F.count("*").alias("n"),
            F.min(F.col(val).cast(vt)).alias("vmin"),
            F.max(F.col(val).cast(vt)).alias("vmax"))

    def inc_hll(inline=0):
        return SK.maintain_hll(cur, upd, actions, key, [grp], skey,
                               merged, old_regs=old_regs,
                               groups_nullable=False,
                               touched_inline_threshold=inline)

    def full_hll():
        return SK.hll_registers(merged, [grp], skey)

    dpp = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    out["minmax_full_sec"] = best(full_mm)
    out["minmax_incremental_inline_sec"] = best(
        lambda: inc_mm(inline=128))
    out["minmax_incremental_dpp_sec"] = best(inc_mm)
    spark.conf.set(dpp, "false")
    out["minmax_incremental_unpruned_sec"] = best(inc_mm)
    spark.conf.set(dpp, "true")
    out["hll_full_sec"] = best(full_hll)
    out["hll_incremental_inline_sec"] = best(
        lambda: inc_hll(inline=128))
    out["hll_incremental_dpp_sec"] = best(inc_hll)
    spark.conf.set(dpp, "false")
    out["hll_incremental_unpruned_sec"] = best(inc_hll)
    spark.conf.set(dpp, "true")
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    for d in (actions, old_mm, old_regs):
        d.unpersist()
    bench.release_caches()

    path = os.path.join(REPO, "SCALE_SOAK.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {}  # --pruned can run standalone; the merge starts fresh
    doc["pruned_recompute_soak"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"pruned_recompute_soak": out}))


def run_density_soak(reps_small: int, reps_big: int) -> None:
    """The r14 verdict's open soak row, answered with a mechanism:
    emb_near_dedup went 23x wall at 10x data because near-neighbor
    DENSIFICATION grew the bucket join's output 90x. The capped
    variant (embedding_near_pairs max_bucket_size — over-cap buckets
    emit linear star edges) must hold its wall near the data ratio
    on the SAME 10x embeddings. Runs both at sf0.1 and sf1, merges
    into SCALE_SOAK.json under "density_cap_soak". The uncapped
    row's superlinear ratio is already recorded in queries/
    emb_near_dedup; this measures the bound, not the blow-up."""
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import bench
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        PIPELINE_QUERIES,
    )
    from linz_bde_uploader_spark.session import get_spark

    spark = get_spark("scale_soak_density")
    out = {
        "recorded_utc": datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "steal_probe_pct": bench._steal_probe_median(),
        "queries": {},
    }
    for name in ("emb_near_dedup_capped", "emb_near_dedup"):
        fn = PIPELINE_QUERIES[name][0]
        try:
            t_small, n_small = _time_query(fn, spark, SMALL, reps_small)
            t_big, n_big = _time_query(fn, spark, BIG, reps_big)
            out["queries"][name] = {
                "sf0.1_sec": round(t_small, 3),
                "sf1_sec": round(t_big, 3),
                "time_ratio": round(t_big / t_small, 2),
                "rows_small": n_small, "rows_big": n_big,
                "rows_ratio": round(n_big / max(n_small, 1), 1),
            }
        except Exception as e:  # noqa: BLE001
            out["queries"][name] = {
                "error": str(e).splitlines()[0][:300]}
        print(f"# {name}: {json.dumps(out['queries'][name])}",
              file=sys.stderr, flush=True)
        bench.release_caches()
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    path = os.path.join(REPO, "SCALE_SOAK.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {}  # --density can run standalone; the merge starts fresh
    doc["density_cap_soak"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"density_cap_soak": out}))


def run_density_f100(reps_small: int, reps_big: int) -> None:
    """r18 verdict order #5: ONE 100x-shaped point for the CAPPED
    pair-generation family — the operators the r17 cap-default flip
    protects (``lsh_candidate_pairs(max_bucket_size=)`` and
    ``embedding_near_pairs(max_bucket_size=)``). The standing
    density_cap_soak tops out at 10x; this builds documents +
    embeddings at factor=100 (500k docs / 200k vectors, fresh draws
    from the sf0.1 empirical distributions — same generator as the
    10x soak data) and times the two capped queries at sf0.1 and at
    f100. Done-bar: capped wall ratio <= data ratio (100).

    The UNCAPPED branches are DELIBERATELY OMITTED at this scale —
    not a silent cap: the 10x point already measured their quadratic
    blow-up (emb 16.8x wall / 89.9x output pairs, SCALE_SOAK
    density_cap_soak), and at 100x the uncapped all-pairs form IS
    the scale-killer the guard exists to prevent (projected
    ~10^4x output growth); running it would measure the bug, not the
    bound. The omission and its reason are recorded in the block
    itself (``uncapped_omitted``). Merges into SCALE_SOAK.json under
    ``density_cap_soak["f100"]``."""
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import bench
    from make_scale_data import build
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        PIPELINE_QUERIES,
    )
    from linz_bde_uploader_spark.session import get_spark

    f100_dir = os.path.join(REPO, ".scale_data", "cap_f100")
    build(f100_dir, factor=100, tables=("documents", "embeddings"))

    spark = get_spark("scale_soak_density_f100")
    out = {
        "recorded_utc": datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "data_ratio": 100.0,
        "f100_dir": f100_dir,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "steal_probe_pct": bench._steal_probe_median(),
        "uncapped_omitted": (
            "uncapped all-pairs at 100x is the measured quadratic "
            "scale-killer the cap prevents (10x point: emb 16.8x "
            "wall / 89.9x pairs) — running it measures the bug, not "
            "the bound; the 10x A/B above stays the blow-up record"),
        "queries": {},
    }
    for name in ("emb_near_dedup_capped", "dedup_lsh_capped"):
        fn = PIPELINE_QUERIES[name][0]
        try:
            t_small, n_small = _time_query(fn, spark, SMALL, reps_small)
            t_big, n_big = _time_query(fn, spark, f100_dir, reps_big)
            out["queries"][name] = {
                "sf0.1_sec": round(t_small, 3),
                "f100_sec": round(t_big, 3),
                "time_ratio": round(t_big / t_small, 2),
                "rows_small": n_small, "rows_big": n_big,
                "at_or_under_data_ratio": bool(
                    t_big / t_small <= 100.0),
            }
        except Exception as e:  # noqa: BLE001
            out["queries"][name] = {
                "error": str(e).splitlines()[0][:300]}
        print(f"# {name}: {json.dumps(out['queries'][name])}",
              file=sys.stderr, flush=True)
        bench.release_caches()
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    path = os.path.join(REPO, "SCALE_SOAK.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {}
    doc.setdefault("density_cap_soak", {})["f100"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"density_cap_soak.f100": out}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps-small", type=int, default=3)
    ap.add_argument("--reps-big", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--ivm-dir", default=None,
                    help="run only the IVM/HLL soaks against this dir "
                         "and merge into SCALE_SOAK.json")
    ap.add_argument("--ivm-label", default="sf10")
    ap.add_argument("--pruned", action="store_true",
                    help="run only the pruned-recompute soak and "
                         "merge into SCALE_SOAK.json")
    ap.add_argument("--density", action="store_true",
                    help="run only the densification-cap soak "
                         "(capped vs uncapped embedding near-dedup "
                         "at sf0.1 vs sf1) and merge into "
                         "SCALE_SOAK.json")
    ap.add_argument("--density-f100", action="store_true",
                    help="run only the 100x capped-pair-generation "
                         "point (builds documents+embeddings at "
                         "factor=100) and merge into SCALE_SOAK.json "
                         "under density_cap_soak.f100")
    args = ap.parse_args()
    if args.density_f100:
        run_density_f100(args.reps_small, args.reps_big)
        return
    if args.density:
        run_density_soak(args.reps_small, args.reps_big)
        return
    if args.pruned:
        run_pruned_soak()
        return
    if args.ivm_dir:
        run_ivm_extension(args.ivm_dir, args.ivm_label)
        return

    if not os.path.exists(os.path.join(BIG, "lineitem.parquet")):
        raise SystemExit(
            "10x data missing — run scripts/make_scale_data.py first")

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import bench
    from linz_bde_uploader_spark.plans.analytics_suite import (
        ANALYTICS_QUERIES,
    )
    from linz_bde_uploader_spark.plans.engine_suite import ENGINE_QUERIES
    from linz_bde_uploader_spark.plans.pipeline_suite import (
        PIPELINE_QUERIES,
    )
    from linz_bde_uploader_spark.session import get_spark

    allq = {**ENGINE_QUERIES, **PIPELINE_QUERIES, **ANALYTICS_QUERIES}
    spark = get_spark("scale_soak")
    allq["cdc_stats"][0](spark, SMALL).collect()  # warm JVM

    data_ratio = 10.0
    # an explicit --queries run RE-MEASURES a subset (e.g. after a
    # plan change) — merge into the standing document instead of
    # clobbering the other recordings and the ivm/hll sidecars
    partial = bool(args.queries)
    out = {
        "recorded_utc": datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "small_dir": SMALL, "big_dir": BIG, "data_ratio": data_ratio,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "steal_probe_pct": bench._steal_probe_median(),
        "queries": {},
    }
    if partial:
        try:
            with open(os.path.join(REPO, "SCALE_SOAK.json")) as f:
                prior = json.load(f)
        except FileNotFoundError:
            prior = {}
        out = {**prior, **{k: out[k] for k in
                           ("recorded_utc", "loadavg_start",
                            "steal_probe_pct")}}
        out.setdefault("queries", {})
    names = args.queries or QUERIES
    for name in names:
        fn = allq[name][0]
        try:
            t_small, n_small = _time_query(fn, spark, SMALL,
                                           args.reps_small)
            t_big, n_big = _time_query(fn, spark, BIG, args.reps_big)
            rec = {
                "sf0.1_sec": round(t_small, 3),
                "sf1_sec": round(t_big, 3),
                "time_ratio": round(t_big / t_small, 2),
                "rows_small": n_small, "rows_big": n_big,
                "sublinear": bool(t_big / t_small <= data_ratio),
            }
        except Exception as e:  # noqa: BLE001 — record, keep soaking
            rec = {"error": str(e).splitlines()[0][:300]}
        out["queries"][name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr,
              flush=True)
        bench.release_caches()

    if not partial:  # subset re-measures keep the standing sidecars
        for soak_name, soak_fn in (("ivm_soak", bench._ivm_soak),
                                   ("hll_soak", bench._hll_soak)):
            for scale, d in (("sf0.1", SMALL), ("sf1", BIG)):
                key = f"{soak_name}_{scale}"
                try:
                    out[key] = soak_fn(spark, d)
                except Exception as e:  # noqa: BLE001
                    out[key] = {"error": str(e).splitlines()[0][:300]}
                print(f"# {key}: {json.dumps(out[key])}",
                      file=sys.stderr, flush=True)
                bench.release_caches()

    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    # emb_near_dedup is kept UNCAPPED on purpose — the measured A/B
    # control for the densification guard (its capped twin is the
    # corpus-scale form; see SCALE.md). Name it so its superlinear
    # ratio is read as the control it is, and report the guard-family
    # summary both with and without it.
    controls = [q for q in ("emb_near_dedup",) if q in out["queries"]]
    out["uncapped_controls"] = controls
    ratios = [r["time_ratio"] for r in out["queries"].values()
              if "time_ratio" in r]
    non_ctrl = [r["time_ratio"] for q, r in out["queries"].items()
                if "time_ratio" in r and q not in controls]
    if ratios:
        out["summary"] = {
            "n": len(ratios),
            "median_time_ratio": round(sorted(ratios)[len(ratios) // 2],
                                       2),
            "max_time_ratio": round(max(ratios), 2),
            "all_at_or_under_data_ratio": bool(
                max(ratios) <= data_ratio),
            "max_time_ratio_excl_controls": round(max(non_ctrl), 2)
            if non_ctrl else None,
            "all_at_or_under_data_ratio_excl_controls": bool(
                max(non_ctrl) <= data_ratio) if non_ctrl else None,
        }
    # a full run refreshes the standard keys but must PRESERVE the
    # sidecars other entry points own (etl_soak, density_cap_soak,
    # pruned_recompute_soak, the sf10 ivm/hll extensions): clobbering
    # them silently erased committed scale evidence once (r16)
    path = os.path.join(REPO, "SCALE_SOAK.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {}
    doc.update(out)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out.get("summary", out)))


if __name__ == "__main__":
    main()
