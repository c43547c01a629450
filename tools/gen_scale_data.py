#!/usr/bin/env python
"""Generate sf1-scale rehearsal data under .scratch/sf1 (gitignored).

The driver's testdata tops out at sf0.1; the 100x-scale claims in
SCALE.md need at least one measured rung above it. This synthesizes a
10x step by replicating sf0.1 with REPLICA-DISJOINT keys, preserving
each table's per-replica distributions (the thing scaling behavior
depends on) while keeping generation deterministic (seed 42) and
dependency-free:

- lineitem/orders: 10 copies with orderkey/custkey/suppkey offsets —
  degree distributions per replica identical, graph ops see 10 disjoint
  components (the TPC-H scaling model: more suppliers, same skew);
- documents: 10 copies, replicas > 0 word-perturbed at p=0.3 (each word
  independently rewritten to a seeded vocab draw). 3-shingle survival is
  ~0.34, so cross-replica Jaccard lands ~0.2 — BELOW the dedup
  threshold 1/2 — keeping near-dup density per replica comparable to
  sf0.1 instead of exploding output quadratically in replicas;
- embeddings: 10 copies with 5%-sigma Gaussian noise per component —
  cluster structure (what IVF recall depends on) preserved.

Usage: python tools/gen_scale_data.py [out_dir] (default .scratch/sf1)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def _write(out_dir: str, name: str, tables: list[pa.Table]) -> None:
    t = pa.concat_tables(tables)
    pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {t.num_rows} rows")


def _offset(tab: pa.Table, col: str, off: int) -> pa.Table:
    import pyarrow.compute as pc

    i = tab.schema.get_field_index(col)
    return tab.set_column(i, col, pc.add(tab.column(col), off))


def gen_lineitem(out_dir: str) -> None:
    base = _read("lineitem")
    okey_span = 10_000_000
    skey_span = 1_000_000
    parts = []
    for r in range(REPLICAS):
        t = _offset(base, "l_orderkey", r * okey_span)
        t = _offset(t, "l_suppkey", r * skey_span)
        t = _offset(t, "l_partkey", r * skey_span)
        parts.append(t)
    _write(out_dir, "lineitem", parts)


def gen_orders(out_dir: str) -> None:
    base = _read("orders")
    parts = []
    for r in range(REPLICAS):
        t = _offset(base, "o_orderkey", r * 10_000_000)
        t = _offset(t, "o_custkey", r * 1_000_000)
        parts.append(t)
    _write(out_dir, "orders", parts)


def gen_documents(out_dir: str) -> None:
    base = _read("documents")
    texts = base.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.split()})
    n = base.num_rows
    rng = np.random.default_rng(42)
    parts = [base]
    for r in range(1, REPLICAS):
        new_texts = []
        for t in texts:
            words = t.split()
            mask = rng.random(len(words)) < 0.3
            draws = rng.integers(0, len(vocab), size=len(words))
            new_texts.append(" ".join(
                vocab[draws[i]] if mask[i] else w
                for i, w in enumerate(words)
            ))
        t = base.set_column(
            base.schema.get_field_index("text"), "text",
            pa.array(new_texts, type=pa.string()),
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(x) for x in new_texts], type=pa.int64()),
        )
        parts.append(_offset(t, "doc_id", r * 1_000_000))
    _write(out_dir, "documents", parts)


def gen_embeddings(out_dir: str) -> None:
    base = _read("embeddings")
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    sigma = 0.05 * vecs.std()
    rng = np.random.default_rng(4242)
    parts = [base]
    for r in range(1, REPLICAS):
        noisy = vecs + rng.normal(0.0, sigma, vecs.shape).astype(np.float32)
        t = base.set_column(
            base.schema.get_field_index("embedding"), "embedding",
            pa.array(noisy.tolist(), type=pa.list_(pa.float32())),
        )
        parts.append(_offset(t, "vec_id", r * 1_000_000))
    _write(out_dir, "embeddings", parts)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scratch" / "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    gen_lineitem(out_dir)
    gen_orders(out_dir)
    gen_documents(out_dir)
    gen_embeddings(out_dir)
    # small dims copied verbatim: queries only need them present
    for name in ("region", "nation", "customer", "supplier", "part",
                 "events"):
        src = os.path.join(SRC, f"{name}.parquet")
        if os.path.exists(src):
            _write(out_dir, name, [_read(name)])
    print(f"sf1 rehearsal data at {out_dir}")


if __name__ == "__main__":
    main()
