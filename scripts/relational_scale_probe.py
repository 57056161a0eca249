"""10x relational/corpus scale probe (optimization round, guide §1/§2).

The driver's round-end measurement may use a larger, driver-generated
scale factor than the committed /root/testdata/sf0.1 — so the claim
"the r8 optimizations hold beyond 600k-row tables" needs evidence on
the *relational/streaming/embedding* axis too (the geo axis has
scripts/scale_probe.py at 10x, the corpus axis scripts/corpus_probe.py
at 100x).

This probe builds a 10x replica of the sf0.1 tables and times every
bench query against it with the noop sink:

- fact tables (lineitem, orders, customer, part, supplier, events)
  are replicated K times with disjoint key ranges (every foreign key
  offset by the same per-table stride), so joins stay consistent,
  group counts stay fixed and rows-per-group grow Kx — the shape a
  bigger TPC-H-like SF has;
- dimensions (nation, region) are copied;
- documents/embeddings replicas are *synthesized* from the empirical
  distributions (token unigram + length; per-label mean/std) with
  planted duplicate/near-duplicate rates mirroring the originals,
  NOT byte-copied — byte-copies would make every doc/vector a
  K-way duplicate cluster and grow dedup pair counts quadratically
  in K, which no real bigger crawl does.

Writes bench_runs/r8_relational_scale_probe.json with per-query
seconds at 10x, the sf0.1 comparison where r8_profile.json has it,
and a flag for anything growing superlinearly (>K x sf0.1 time after
subtracting nothing — conservative).

Usage:
  python scripts/relational_scale_probe.py              # build + run all
  python scripts/relational_scale_probe.py --k 10 --reps 1 d06 d07
  python scripts/relational_scale_probe.py --build-only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _stride(table: pa.Table, col: str) -> int:
    return int(pc.max(table[col]).as_py()) + 1


def _offset(table: pa.Table, cols: dict[str, int], r: int) -> pa.Table:
    for col, stride in cols.items():
        idx = table.schema.get_field_index(col)
        shifted = pc.add(table[col], pa.scalar(r * stride, table[col].type))
        table = table.set_column(idx, table.field(idx), shifted)
    return table


def _synth_documents(orig: pa.Table, r: int, d_stride: int) -> pa.Table:
    """Fresh docs drawn from the empirical token/length/lang/source
    distributions, with the original's exact-dup and near-dup rates
    planted *within* the replica (so cluster sizes stay constant and
    pair counts grow linearly in K)."""
    rng = np.random.default_rng(7_000 + r)
    texts = orig["text"].to_pylist()
    n = len(texts)
    toks = [t.split() for t in texts]
    lens = np.array([len(t) for t in toks])
    flat = np.concatenate([np.array(t, dtype=object) for t in toks])
    vocab, counts = np.unique(flat.astype(str), return_counts=True)
    probs = counts / counts.sum()
    langs = np.array(orig["lang"].to_pylist())
    sources = np.array(orig["source"].to_pylist())

    new_lens = rng.choice(lens, size=n)
    new_tokens = rng.choice(vocab, size=int(new_lens.sum()), p=probs)
    out_texts: list[str] = []
    pos = 0
    for ln in new_lens:
        out_texts.append(" ".join(new_tokens[pos:pos + ln]))
        pos += ln
    # planted exact dups (sf0.1 has 8/5000) and near-dups (~1%):
    # near-dup = copy with ~10% of tokens resampled
    for _ in range(max(n // 1250, 1) // 2 * 2):
        i, j = rng.integers(0, n, 2)
        out_texts[j] = out_texts[i]
    for _ in range(max(n // 100, 1)):
        i, j = rng.integers(0, n, 2)
        t = out_texts[i].split()
        for p in rng.integers(0, len(t), max(len(t) // 10, 1)):
            t[p] = str(rng.choice(vocab))
        out_texts[j] = " ".join(t)
    return pa.table(
        {
            "doc_id": pa.array(
                (np.arange(n) + r * d_stride).astype(np.int64)
            ),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=n), pa.string()),
            "source": pa.array(rng.choice(sources, size=n), pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in out_texts], dtype=np.int64)
            ),
        },
        schema=orig.schema,
    )


def _synth_embeddings(orig: pa.Table, r: int, v_stride: int) -> pa.Table:
    """Per-label diagonal-gaussian draws matching the original label
    counts, with ~1% planted near-dup copies inside the replica."""
    rng = np.random.default_rng(9_000 + r)
    arr = np.stack(
        [np.asarray(v, dtype=np.float32) for v in orig["embedding"].to_pylist()]
    )
    labels = np.asarray(orig["label"].to_pylist(), dtype=np.int32)
    out_vecs = np.empty_like(arr)
    out_labels = np.empty_like(labels)
    pos = 0
    for lab in np.unique(labels):
        sel = arr[labels == lab]
        m, s = sel.mean(axis=0), sel.std(axis=0)
        k = len(sel)
        out_vecs[pos:pos + k] = rng.normal(m, np.maximum(s, 1e-6), (k, len(m)))
        out_labels[pos:pos + k] = lab
        pos += k
    for _ in range(max(len(arr) // 100, 1)):
        i, j = rng.integers(0, len(arr), 2)
        out_vecs[j] = out_vecs[i] + rng.normal(0, 1e-3, arr.shape[1]).astype(
            np.float32
        )
        out_labels[j] = out_labels[i]
    emb_type = orig.schema.field("embedding").type
    return pa.table(
        {
            "vec_id": pa.array(
                (np.arange(len(arr)) + r * v_stride).astype(np.int64)
            ),
            "embedding": pa.array(
                [v for v in out_vecs.astype(np.float32)], emb_type
            ),
            "label": pa.array(out_labels, pa.int32()),
        },
        schema=orig.schema,
    )


def build_replica(dst: str, k: int) -> None:
    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker):
        print(f"# replica already built at {dst}")
        return
    os.makedirs(dst, exist_ok=True)
    t = {
        name: pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        for name in (
            "lineitem", "orders", "customer", "part", "supplier",
            "nation", "region", "events", "documents", "embeddings",
        )
    }
    strides = {
        "order": _stride(t["orders"], "o_orderkey"),
        "cust": _stride(t["customer"], "c_custkey"),
        "part": _stride(t["part"], "p_partkey"),
        "supp": _stride(t["supplier"], "s_suppkey"),
        "event": _stride(t["events"], "event_id"),
        "user": _stride(t["events"], "user_id"),
        "doc": _stride(t["documents"], "doc_id"),
        "vec": _stride(t["embeddings"], "vec_id"),
    }
    plans = {
        "lineitem": {
            "l_orderkey": strides["order"],
            "l_partkey": strides["part"],
            "l_suppkey": strides["supp"],
        },
        "orders": {
            "o_orderkey": strides["order"], "o_custkey": strides["cust"]
        },
        "customer": {"c_custkey": strides["cust"]},
        "part": {"p_partkey": strides["part"]},
        "supplier": {"s_suppkey": strides["supp"]},
        "events": {
            "event_id": strides["event"], "user_id": strides["user"]
        },
    }
    for name, cols in plans.items():
        parts = [_offset(t[name], cols, r) for r in range(k)]
        pq.write_table(pa.concat_tables(parts), os.path.join(dst, f"{name}.parquet"))
        print(f"# wrote {name} x{k}")
    for name in ("nation", "region"):
        pq.write_table(t[name], os.path.join(dst, f"{name}.parquet"))
    docs = [t["documents"]] + [
        _synth_documents(t["documents"], r, strides["doc"]) for r in range(1, k)
    ]
    pq.write_table(pa.concat_tables(docs), os.path.join(dst, "documents.parquet"))
    print(f"# wrote documents x{k} (synth replicas)")
    embs = [t["embeddings"]] + [
        _synth_embeddings(t["embeddings"], r, strides["vec"])
        for r in range(1, k)
    ]
    pq.write_table(pa.concat_tables(embs), os.path.join(dst, "embeddings.parquet"))
    print(f"# wrote embeddings x{k} (synth replicas)")
    with open(marker, "w") as fh:
        fh.write("ok\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--dst", default="/tmp/kblock_sf10x")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--burn", type=int, default=45)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    build_replica(args.dst, args.k)
    if args.build_only:
        return 0

    from bench import BENCH_QUERIES, _burn_host

    from kblock_spark.queries import REGISTRY
    from kblock_spark.session import get_spark

    if args.burn:
        _burn_host(args.burn)

    names = (
        [n for n in BENCH_QUERIES if any(n.startswith(w) for w in args.names)]
        if args.names
        else list(BENCH_QUERIES)
    )

    base = {}
    prof_path = os.path.join(REPO, "bench_runs", "r8_profile.json")
    if os.path.exists(prof_path):
        with open(prof_path) as fh:
            base = {r["q"]: r["best"] for r in json.load(fh)}

    spark = get_spark("kblock-scale-probe-10x")
    sc = spark.sparkContext
    for tbl in ("lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{args.dst}/{tbl}.parquet").count()
    import pandas as _pd

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(
        lambda it: (_pd.DataFrame({"x": [1]}) for _ in it), "x long"
    ).count()

    rows = []
    for name in names:
        fn, _sql = REGISTRY[name]
        sc.setJobDescription(f"scale10x:{name}")
        samples, err = [], None
        try:
            for _ in range(args.reps):
                t0 = time.time()
                fn(spark, args.dst).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 3))
        except Exception as ex:  # noqa: BLE001
            err = f"{type(ex).__name__}: {ex}"
        finally:
            sc.setJobDescription(None)
        best = min(samples) if samples else -1.0
        b = base.get(name)
        ratio = round(best / b, 2) if b and b > 0 and best > 0 else None
        rec = {
            "q": name,
            "best_10x": best,
            "samples": samples,
            "best_sf01": b,
            "ratio": ratio,
            "superlinear": bool(ratio and ratio > args.k),
            "err": err,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()

    path = os.path.join(REPO, "bench_runs", "r8_relational_scale_probe.json")
    # merge with any prior record (subset re-runs must not clobber the
    # full-suite rows); a re-measured query replaces its old row
    merged: dict[str, dict] = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                merged = {r["q"]: r for r in json.load(fh).get("rows", [])}
        except (OSError, ValueError, KeyError):
            merged = {}
    for r in rows:
        merged[r["q"]] = r
    rows = list(merged.values())
    out = {
        "k": args.k,
        "src": SRC,
        "dst": args.dst,
        "reps": args.reps,
        "sum_10x": round(sum(r["best_10x"] for r in rows if r["best_10x"] > 0), 1),
        "n_err": sum(1 for r in rows if r["err"]),
        "n_superlinear": sum(1 for r in rows if r["superlinear"]),
        "rows": rows,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {path}: sum={out['sum_10x']}s err={out['n_err']} "
          f"superlinear={out['n_superlinear']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
