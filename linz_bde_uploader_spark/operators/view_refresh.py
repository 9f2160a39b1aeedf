"""Maintained-view refresh shared by the STREAMING upload
(streaming/events.streaming_cdc_upload) and the BATCH CLI driver
(driver.BdeUploader): one implementation of the dataset-stamp replay
guard and the per-family maintenance calls, so the two paths cannot
drift.

Reference contract: derived state stays consistent with the merge
inside the same dataset transaction — the reference runs its
bde_postupload_* maintenance functions within the dataset scope
(sql/02-bde_control_functions.sql.in:2595-2676) and wraps each
dataset's work in one transaction (lib/LINZ/BdeDatabase.pm:455-510).
Here the equivalent guarantee is recovery-based instead of
transactional: every view table carries the dataset it last
incorporated as its store revision comment (C8), a view write is
skipped when that stamp is AT OR PAST the incoming dataset, and the
base-table write always comes LAST. Datasets apply in sorted order,
so stamps are monotone and ">= ds" means "a crashed run already
applied this delta". The comparison must be ordered, not equality:
for a crashed multi-dataset run [d1, d2] that died after d2's view
write but before d2's base write, the re-run replays d1 first — its
all-'0' refresh is a no-op delta, but an equality guard would
re-STAMP the view back to d1, letting d2's delta apply a second time
and silently double-count the view. With the ordered guard the d1
replay leaves the d2 stamp in place. Before a view write the delta
is re-derivable from the still-pre-merge base; after it the stamp
skips the double-apply — every crash window replays to the same
state, with no cross-table transaction. (Dataset names are
fixed-width timestamps, so lexicographic order is chronological
order — the O1 repository-ordering invariant.)

Scale shape: each refresh is O(|changes|) — the delta algebra of
operators/merge.maintain_aggregate / maintain_extrema /
maintain_join — never a rescan of the merged base table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linz_bde_uploader_spark.operators import merge as M


@dataclass
class ViewSpec:
    """Which maintained views a table carries.

    - ``group_cols`` + ``value_col``: an aggregate view
      ``<table>__agg`` (group_cols, n, n_vals, total) maintained by
      the self-maintainable delta algebra, plus — when ``minmax`` —
      an extrema view ``<table>__minmax`` (group_cols, n, vmin, vmax)
      maintained by touched-group partial refresh.
    - ``join``: an enriched join view ``<table>__join`` maintained by
      the delta-join rule; keys ``dim`` (static dimension DataFrame),
      ``fact_col``, ``dim_col``, ``fact_cols``, ``dim_cols``.
    - ``hll_key`` (requires ``group_cols``): a distinct-count sketch
      view ``<table>__hll`` — the per-group HLL register table for
      ndv(hll_key) — maintained by ``operators/sketches.maintain_hll``
      (max-merge on insert-only groups, touched-group recompute on
      row loss). Read it with ``sketches.hll_estimate``.
    - ``cms_key``: a count-min frequency-sketch view
      ``<table>__cms`` — the 4x1024 counter table over cms_key —
      maintained by ``operators/sketches.maintain_cms``. CMS is a
      LINEAR sketch, so unlike hll_key it needs no group_cols and
      no recompute branch: deletes subtract, inserts add. Read it
      with ``sketches.cms_lookup``.
    - ``topk`` (requires ``group_cols`` + ``value_col``): a per-group
      leaderboard view ``<table>__topk`` (group_cols, rank, key,
      value) maintained by ``merge.maintain_topk`` (touched-group
      partial refresh; ranking is value DESC, key ASC — the
      set-deterministic total order ``merge.topk_view`` defines for
      both the seed and the refresh).
    - ``distinct_col`` (requires ``group_cols``): a per-group
      COUNT(DISTINCT distinct_col) view ``<table>__distinct``
      (group_cols, n, n_distinct) maintained by
      ``merge.maintain_distinct`` (last-holder deletes force the
      same touched-group recompute split).
    """

    group_cols: list[str] | None = None
    value_col: str | None = None
    minmax: bool = False
    join: dict | None = None
    value_type: str = "decimal(12,2)"
    hll_key: str | None = None
    cms_key: str | None = None
    topk: int | None = None
    distinct_col: str | None = None

    def __post_init__(self):
        # fail at registration, not as a silently-absent view
        if self.hll_key is not None and not self.group_cols:
            raise ValueError("ViewSpec.hll_key requires group_cols")
        if self.topk is not None and (
                not self.group_cols or self.value_col is None):
            raise ValueError(
                "ViewSpec.topk requires group_cols and value_col")
        if self.topk is not None and self.topk < 1:
            raise ValueError("ViewSpec.topk must be >= 1")
        if self.distinct_col is not None and not self.group_cols:
            raise ValueError("ViewSpec.distinct_col requires group_cols")


def _behind(store, view_table: str, ds: str) -> bool:
    stamp = store.current_dataset(view_table)
    return stamp is None or stamp < ds


def _enrich(fact: DataFrame, key: str, join: dict) -> DataFrame:
    dim = join["dim"]
    return (fact.join(dim, fact[join["fact_col"]] == dim[join["dim_col"]],
                      "inner")
            .select(fact[key], *[fact[c] for c in join["fact_cols"]],
                    *[dim[c] for c in join["dim_cols"]]))


def seed_views(store, table_name: str, df: DataFrame, ds: str,
               spec: ViewSpec, key: str, force: bool = False) -> None:
    """Direct-recompute seeding for snapshot semantics: the streaming
    bootstrap batch and the batch driver's level-0 replace both
    install the views as plain aggregates/joins of the new state —
    there is no prior view to delta against (bootstrap) or the whole
    base was just replaced (L0), so O(changes) does not apply.

    ``force=True`` (the snapshot-replace path) writes regardless of
    the stamp guard: a snapshot REPLACES the base, so any standing
    view state is invalid by definition — including a view stamped
    LATER than the incoming dataset (an operator-forced re-load over
    leftover derived state; dataset order says nothing there). The
    seed is a direct recompute of the staged frame, so re-running it
    on a crash replay is idempotent — the guard's double-apply
    hazard, which only exists for DELTAS, does not apply. Without
    force (no caller uses it today) the ordered guard applies as in
    the incremental path."""
    if spec.join is not None and (
            force or _behind(store, f"{table_name}__join", ds)):
        store.write(f"{table_name}__join", _enrich(df, key, spec.join),
                    dataset=ds)
    if spec.hll_key is not None and spec.group_cols and (
            force or _behind(store, f"{table_name}__hll", ds)):
        from linz_bde_uploader_spark.operators.sketches import (
            hll_registers)
        store.write(f"{table_name}__hll",
                    hll_registers(df, spec.group_cols,
                                  F.col(spec.hll_key).cast("string")),
                    dataset=ds)
    if spec.cms_key is not None and (
            force or _behind(store, f"{table_name}__cms", ds)):
        from linz_bde_uploader_spark.operators.sketches import cms_build
        store.write(f"{table_name}__cms",
                    cms_build(df.select(F.col(spec.cms_key)
                                        .cast("string").alias("tok"))),
                    dataset=ds)
    if spec.topk is not None and (
            force or _behind(store, f"{table_name}__topk", ds)):
        store.write(f"{table_name}__topk",
                    M.topk_view(df, spec.group_cols, key,
                                spec.value_col, spec.topk,
                                value_type=spec.value_type),
                    dataset=ds)
    if spec.distinct_col is not None and (
            force or _behind(store, f"{table_name}__distinct", ds)):
        store.write(f"{table_name}__distinct",
                    M.distinct_view(df, spec.group_cols,
                                    spec.distinct_col),
                    dataset=ds)
    if spec.group_cols is None or spec.value_col is None:
        return
    vv = F.col(spec.value_col).cast(spec.value_type)
    if force or _behind(store, f"{table_name}__agg", ds):
        # count the CAST column, not the raw one: maintain_aggregate
        # counts non-null of the cast, and a non-null value that casts
        # to NULL must not inflate the seed
        seed = df.groupBy(*spec.group_cols).agg(
            F.count("*").alias("n"),
            F.count(vv).alias("n_vals"),
            F.sum(vv).cast("decimal(38,2)").alias("total"))
        store.write(f"{table_name}__agg", seed, dataset=ds)
    if spec.minmax and (
            force or _behind(store, f"{table_name}__minmax", ds)):
        mm0 = df.groupBy(*spec.group_cols).agg(
            F.count("*").alias("n"),
            F.min(vv).alias("vmin"),
            F.max(vv).alias("vmax"))
        store.write(f"{table_name}__minmax", mm0, dataset=ds)


def refresh_views(spark: SparkSession, store, table_name: str,
                  cur: DataFrame, stg: DataFrame, actions: DataFrame,
                  merged: DataFrame, ds: str, spec: ViewSpec,
                  key: str) -> None:
    """O(changes) incremental refresh of every view in ``spec``
    against one CDC merge's (current, staged, actions, merged)
    quadruple, each write behind the ordered dataset-stamp guard.
    MUST be called BEFORE the base-table write: once the base is
    merged a replay classifies all-'0' and the view delta is no
    longer derivable, so any view still lagging at that point would
    stay stale forever."""
    if spec.join is not None and _behind(store, f"{table_name}__join", ds):
        jt = f"{table_name}__join"
        old_jv = store.read(spark, jt) if store.exists(jt) else None
        jv = M.maintain_join(cur, stg, actions, key,
                             spec.join["dim"], spec.join["fact_col"],
                             spec.join["dim_col"], spec.join["fact_cols"],
                             spec.join["dim_cols"], old_view=old_jv)
        store.write(jt, jv, dataset=ds)
    ht = f"{table_name}__hll"
    if spec.hll_key is not None and spec.group_cols \
            and _behind(store, ht, ds):
        from linz_bde_uploader_spark.operators.sketches import (
            maintain_hll)
        old_regs = store.read(spark, ht) if store.exists(ht) else None
        regs = maintain_hll(cur, stg, actions, key, spec.group_cols,
                            F.col(spec.hll_key).cast("string"),
                            merged, old_regs=old_regs)
        store.write(ht, regs, dataset=ds)
    ct = f"{table_name}__cms"
    if spec.cms_key is not None and _behind(store, ct, ds):
        from linz_bde_uploader_spark.operators.sketches import (
            cms_build, maintain_cms)
        if store.exists(ct):
            cms = maintain_cms(cur, stg, actions, key,
                               F.col(spec.cms_key).cast("string"),
                               old_cms=store.read(spark, ct))
        else:  # bootstrap: no prior sketch to delta against
            cms = cms_build(merged.select(F.col(spec.cms_key)
                                          .cast("string").alias("tok")))
        store.write(ct, cms, dataset=ds)
    tt = f"{table_name}__topk"
    if spec.topk is not None and _behind(store, tt, ds):
        old_tk = store.read(spark, tt) if store.exists(tt) else None
        tk = M.maintain_topk(cur, stg, actions, key,
                             spec.group_cols, spec.value_col,
                             merged, k=spec.topk, old_topk=old_tk,
                             value_type=spec.value_type)
        store.write(tt, tk, dataset=ds)
    dt = f"{table_name}__distinct"
    if spec.distinct_col is not None and _behind(store, dt, ds):
        old_dc = store.read(spark, dt) if store.exists(dt) else None
        dc = M.maintain_distinct(cur, stg, actions, key,
                                 spec.group_cols, spec.distinct_col,
                                 merged, old_distinct=old_dc)
        store.write(dt, dc, dataset=ds)
    if spec.group_cols is None or spec.value_col is None:
        return
    at = f"{table_name}__agg"
    if _behind(store, at, ds):
        old = store.read(spark, at) if store.exists(at) else None
        view = M.maintain_aggregate(cur, stg, actions, key,
                                    spec.group_cols, spec.value_col,
                                    value_type=spec.value_type,
                                    old_agg=old)
        store.write(at, view, dataset=ds)
    mt = f"{table_name}__minmax"
    if spec.minmax and _behind(store, mt, ds):
        old_mm = store.read(spark, mt) if store.exists(mt) else None
        mm = M.maintain_extrema(cur, stg, actions, key,
                                spec.group_cols, spec.value_col,
                                merged, old_extrema=old_mm,
                                value_type=spec.value_type)
        store.write(mt, mm, dataset=ds)
