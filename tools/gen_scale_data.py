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


def gen_events(out_dir: str) -> None:
    """10 replicas with REPLICA-DISJOINT event_id/user_id and the SAME
    timestamps (r14): the streaming rehearsals (sessions, interval join,
    dedup) scale with per-user event density held constant — disjoint
    users add state cardinality without exploding any single user's join
    fan-out, the TPC-H-style scaling model the other tables use. ts is
    untouched so watermark horizons and window math match sf0.1."""
    base = _read("events")
    parts = []
    for r in range(REPLICAS):
        t = _offset(base, "event_id", r * 100_000_000)
        t = _offset(t, "user_id", r * 10_000_000)
        parts.append(t)
    _write(out_dir, "events", parts)


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


# -------------------------------------------------- zipfian documents (r08)
#
# The r07 rehearsal's one superlinear row (set_similarity_join 10-19x at
# 10x data) was diagnosed as saturated shingle entropy: the source corpus
# has a ~31-word vocabulary, so at sf1 EVERY 3-shingle is hot and prefix
# filtering's rare-token premise cannot hold. To discharge that diagnosis
# the generator can now synthesize documents over a realistic ~50k-token
# zipfian vocabulary (s ~ 1.3, the classic natural-language shape):
# per-document token sequences keep the source corpus's length
# distribution, and replicas > 0 perturb replica 0's tokens at p=0.3 —
# the same near-dup structure (3-shingle survival ~0.34, cross-replica
# Jaccard ~0.2) as the low-entropy generator, so ONLY the entropy
# changes between the two experiments.

VOCAB = 50_000
ZIPF_A = 1.3


def _zipf_tokens(rng: "np.random.Generator", n: int) -> "np.ndarray":
    """n token ids, zipf(ZIPF_A)-distributed over [0, VOCAB)."""
    out = np.empty(0, dtype=np.int64)
    while out.size < n:
        draw = rng.zipf(ZIPF_A, size=int((n - out.size) * 1.3) + 16)
        out = np.concatenate([out, draw[draw <= VOCAB] - 1])
    return out[:n]


def gen_documents_zipf(out_dir: str, replicas: int) -> None:
    base = _read("documents")
    lengths = [len(t.split()) for t in base.column("text").to_pylist()]
    rng = np.random.default_rng(4208)
    base_tokens = [_zipf_tokens(rng, ln) for ln in lengths]
    parts = []
    for r in range(replicas):
        toks = base_tokens
        if r > 0:
            toks = []
            for bt in base_tokens:
                mask = rng.random(bt.size) < 0.3
                repl = _zipf_tokens(rng, int(mask.sum()))
                t = bt.copy()
                t[mask] = repl
                toks.append(t)
        # 10% of each replica's docs get an in-replica near-dup twin
        # (perturbed at p=0.1 -> 3-shingle survival ~0.73, Jaccard ~0.57,
        # ABOVE the 1/2 join threshold), so the verify stage has work
        # proportional to corpus size at every scale
        twins = []
        for k, bt in enumerate(toks):
            if k % 10 == 7:
                mask = rng.random(bt.size) < 0.1
                tw = bt.copy()
                tw[mask] = _zipf_tokens(rng, int(mask.sum()))
                twins.append(tw)
        texts = [" ".join(f"w{i}" for i in t) for t in toks]
        t = base.set_column(
            base.schema.get_field_index("text"), "text",
            pa.array(texts, type=pa.string()),
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(x) for x in texts], type=pa.int64()),
        )
        parts.append(_offset(t, "doc_id", r * 1_000_000))
        twin_texts = [" ".join(f"w{i}" for i in t) for t in twins]
        tw = base.slice(0, len(twins))
        tw = tw.set_column(
            tw.schema.get_field_index("text"), "text",
            pa.array(twin_texts, type=pa.string()),
        )
        tw = tw.set_column(
            tw.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(x) for x in twin_texts], type=pa.int64()),
        )
        parts.append(_offset(tw, "doc_id", r * 1_000_000 + 500_000))
    _write(out_dir, "documents", parts)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else str(
        Path(__file__).resolve().parent.parent / ".scratch" / "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    zipf = next((a for a in sys.argv[1:] if a.startswith("--zipf-docs")),
                None)
    if zipf is not None:
        # documents-only zipfian corpus at the requested replica count
        gen_documents_zipf(out_dir, int(zipf.split("=")[1]))
        return
    if next((a for a in sys.argv[1:] if a.startswith("--events-only")),
            None) is not None:
        # refresh just the scaled events table into an existing rehearsal dir
        gen_events(out_dir)
        return
    gen_lineitem(out_dir)
    gen_orders(out_dir)
    gen_documents(out_dir)
    gen_embeddings(out_dir)
    gen_events(out_dir)
    # small dims copied verbatim: queries only need them present
    for name in ("region", "nation", "customer", "supplier", "part"):
        src = os.path.join(SRC, f"{name}.parquet")
        if os.path.exists(src):
            _write(out_dir, name, [_read(name)])
    print(f"sf1 rehearsal data at {out_dir}")


if __name__ == "__main__":
    main()
