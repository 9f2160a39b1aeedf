"""Deterministic scale-up generator: build an sfN directory (default
10x sf0.1 => "sf1") from the driver-provided sf0.1 fixtures, for the
scale-slope soak (`scripts/scale_soak.py`).

The r13 verdict's standing gap: every 100 TB claim rests on plan
audits and O(.) argument — never a measured slope. Two data points
(sf0.1 vs sf1) convert the BASELINE.md "constant, not slope"
adjudications into measurements. The driver's own generator is not
available, so this derives a 10x dataset from the provided one with
the workload SHAPE preserved:

- **TPC-H tables** (`customer supplier part orders lineitem`):
  10 replicas with per-key-domain strides (orderkey 1e6, custkey /
  partkey 1e5, suppkey 1e4 — all multiples of 100 so `key % 100`
  soak selections keep their selectivity). Each replica's foreign
  keys shift together, so join fan-outs are exactly the sf0.1 ones
  and every join stays within its replica. `region`/`nation` stay
  fixed, as in real TPC-H scaling (dimension tables are constant).
- **events**: 10 replicas, `event_id += r*100_000`,
  `user_id += r*1_500`, timestamps untouched — same 30-day window
  at 10x density, 10x disjoint users (sessionize/transition
  workloads scale linearly, windowed aggs get 10x-heavy windows).
- **documents**: 10x FRESH rows from the empirical distribution of
  the originals (31-word vocab frequencies, uniform 10-100 word
  lengths, lang/source marginals), hash-seeded numpy so the corpus
  is reproducible. Doc ids use stride 131: `_dup_corpus` plants
  exact dups at `doc_id + 10_000` for `doc_id % 50 == 0`, and
  131 does not divide 10_000, so planted ids NEVER collide with
  real ids while `i % 50 == 0` keeps the planted-dup rate at the
  same 2% of the corpus. (A naive dense 0..49_999 id range would
  alias planted ids onto real docs and corrupt every dedup query.)
- **embeddings**: 10x fresh unit-norm vectors from a per-label
  Gaussian fit (per-dimension mean/std of the originals), label
  sizes scaled 10x — preserves the 10-cluster geometry the
  IVF/LSH/kNN queries bucket on without duplicating any vector
  (replicated vectors would plant cosine=1 near-pairs and turn the
  near-pair workload quadratic in the replica count).

Output parquet is cast to the source file's Arrow schema so
`load_table` sees identical types. Idempotent: an existing target
with the expected row count is left alone. Run:

    python scripts/make_scale_data.py [--factor 10] [--out DIR]

Default out dir is `<repo>/.scale_data/sf1` (gitignored — data, not
source).
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = "/root/testdata/sf0.1"

# per-key-domain replica strides (multiples of 100 — see module doc)
STRIDES = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "partkey": 100_000,
    "suppkey": 10_000,
}

DOC_ID_STRIDE = 131  # coprime with 10_000's factor structure


def _copy_as_is(con, table: str, out_dir: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
        f"'{out_dir}/{table}.parquet' (FORMAT PARQUET)")


def _replicate_tpch(con, table: str, shifts: dict[str, int],
                    factor: int, out_dir: str) -> None:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + r.r * {shifts[c]} AS {c}" if c in shifts else c
        for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet', "
        f"range({factor}) AS r(r)) TO '{out_dir}/{table}.parquet' "
        f"(FORMAT PARQUET)")


def _gen_documents(factor: int, out_dir: str, seed: int = 42) -> None:
    src = pq.read_table(f"{SRC}/documents.parquet")
    n_out = src.num_rows * factor
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    # empirical distributions
    from collections import Counter
    wc: Counter[str] = Counter()
    lens: Counter[int] = Counter()
    for t in texts:
        ws = t.split(" ")
        wc.update(ws)
        lens[len(ws)] += 1
    vocab = sorted(wc)
    wp = np.array([wc[w] for w in vocab], dtype=np.float64)
    wp /= wp.sum()
    lvals = sorted(lens)
    lp = np.array([lens[v] for v in lvals], dtype=np.float64)
    lp /= lp.sum()
    lang_c = Counter(langs)
    lang_vals = sorted(lang_c)
    lang_p = np.array([lang_c[v] for v in lang_vals], dtype=np.float64)
    lang_p /= lang_p.sum()
    src_c = Counter(sources)
    src_vals = sorted(src_c)
    src_p = np.array([src_c[v] for v in src_vals], dtype=np.float64)
    src_p /= src_p.sum()

    rng = np.random.default_rng(seed)
    n_words = rng.choice(len(lvals), size=n_out, p=lp)
    out_texts: list[str] = []
    varr = np.array(vocab)
    for i in range(n_out):
        k = lvals[n_words[i]]
        out_texts.append(" ".join(varr[rng.choice(len(vocab), size=k,
                                                  p=wp)]))
    doc_ids = np.arange(n_out, dtype=np.int64) * DOC_ID_STRIDE
    tab = pa.table({
        "doc_id": pa.array(doc_ids),
        "text": pa.array(out_texts),
        "lang": pa.array([lang_vals[j] for j in
                          rng.choice(len(lang_vals), size=n_out,
                                     p=lang_p)]),
        "source": pa.array([src_vals[j] for j in
                            rng.choice(len(src_vals), size=n_out,
                                       p=src_p)]),
        "n_chars": pa.array(np.array([len(t) for t in out_texts],
                                     dtype=np.int64)),
    }).cast(src.schema)
    pq.write_table(tab, f"{out_dir}/documents.parquet")


def _gen_embeddings(factor: int, out_dir: str, seed: int = 43) -> None:
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.array(src.column("embedding").to_pylist(),
                   dtype=np.float64)
    labels = np.array(src.column("label").to_pylist())
    rng = np.random.default_rng(seed)
    out_vecs, out_labels = [], []
    for lab in sorted(set(labels.tolist())):
        rows = emb[labels == lab]
        mu, sd = rows.mean(axis=0), rows.std(axis=0)
        n = rows.shape[0] * factor
        v = rng.normal(mu, np.maximum(sd, 1e-9),
                       size=(n, rows.shape[1]))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        out_vecs.append(v)
        out_labels.append(np.full(n, lab))
    vecs = np.concatenate(out_vecs).astype(np.float32)
    labs = np.concatenate(out_labels)
    order = rng.permutation(len(labs))  # interleave labels like source
    vecs, labs = vecs[order], labs[order]
    tab = pa.table({
        "vec_id": pa.array(np.arange(len(labs), dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
        "label": pa.array(labs),
    }).cast(src.schema)
    pq.write_table(tab, f"{out_dir}/embeddings.parquet")


ALL_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings")


def build(out_dir: str, factor: int = 10,
          tables: tuple[str, ...] = ALL_TABLES) -> None:
    """Build (idempotently) the requested tables at ``factor``x.
    A subset build (e.g. ``tables=("orders",)`` at factor=100 for
    the IVM-crossover soak) skips the python-loop document/embedding
    generators, which dominate generation time at large factors."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    probe = "orders" if "orders" in tables else tables[-1]
    target = f"{out_dir}/{probe}.parquet"
    if os.path.exists(target):
        mult = factor if probe not in ("region", "nation") else 1
        expect = con.execute(
            f"SELECT COUNT(*) FROM '{SRC}/{probe}.parquet'"
        ).fetchone()[0] * mult
        have = con.execute(
            f"SELECT COUNT(*) FROM '{target}'").fetchone()[0]
        if have == expect and all(os.path.exists(
                f"{out_dir}/{t}.parquet") for t in tables):
            print(f"scale data up to date at {out_dir} "
                  f"({have} {probe} rows)")
            return
    print(f"building {factor}x scale data at {out_dir} "
          f"({len(tables)} tables) ...")
    shifts = {
        "customer": {"c_custkey": STRIDES["custkey"]},
        "supplier": {"s_suppkey": STRIDES["suppkey"]},
        "part": {"p_partkey": STRIDES["partkey"]},
        "orders": {"o_orderkey": STRIDES["orderkey"],
                   "o_custkey": STRIDES["custkey"]},
        "lineitem": {"l_orderkey": STRIDES["orderkey"],
                     "l_partkey": STRIDES["partkey"],
                     "l_suppkey": STRIDES["suppkey"]},
        "events": {"event_id": 100_000, "user_id": 1_500},
    }
    for t in tables:
        if t in ("region", "nation"):
            _copy_as_is(con, t, out_dir)
        elif t == "documents":
            _gen_documents(factor, out_dir)
        elif t == "embeddings":
            _gen_embeddings(factor, out_dir)
        else:
            _replicate_tpch(con, t, shifts[t], factor, out_dir)
    print("done:", sorted(os.listdir(out_dir)))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        REPO, ".scale_data", "sf1"))
    ap.add_argument("--tables", nargs="*", default=list(ALL_TABLES))
    args = ap.parse_args()
    build(args.out, args.factor, tuple(args.tables))
