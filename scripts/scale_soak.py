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
    with open(path) as f:
        out = json.load(f)
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps-small", type=int, default=3)
    ap.add_argument("--reps-big", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--ivm-dir", default=None,
                    help="run only the IVM/HLL soaks against this dir "
                         "and merge into SCALE_SOAK.json")
    ap.add_argument("--ivm-label", default="sf10")
    args = ap.parse_args()
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
    out = {
        "recorded_utc": datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "small_dir": SMALL, "big_dir": BIG, "data_ratio": data_ratio,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "queries": {},
    }
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

    for soak_name, soak_fn in (("ivm_soak", bench._ivm_soak),
                               ("hll_soak", bench._hll_soak)):
        for scale, d in (("sf0.1", SMALL), ("sf1", BIG)):
            key = f"{soak_name}_{scale}"
            try:
                out[key] = soak_fn(spark, d)
            except Exception as e:  # noqa: BLE001
                out[key] = {"error": str(e).splitlines()[0][:300]}
            print(f"# {key}: {json.dumps(out[key])}", file=sys.stderr,
                  flush=True)
            bench.release_caches()

    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    ratios = [r["time_ratio"] for r in out["queries"].values()
              if "time_ratio" in r]
    if ratios:
        out["summary"] = {
            "n": len(ratios),
            "median_time_ratio": round(sorted(ratios)[len(ratios) // 2],
                                       2),
            "max_time_ratio": round(max(ratios), 2),
            "all_at_or_under_data_ratio": bool(
                max(ratios) <= data_ratio),
        }
    with open(os.path.join(REPO, "SCALE_SOAK.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out.get("summary", out)))


if __name__ == "__main__":
    main()
