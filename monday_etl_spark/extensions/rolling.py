"""Rabin-Karp rolling window hashes — the O(1)-per-position upgrade of
substring_dedup's O(W)-per-position md5-of-slice (TODO r02 #2).

Per document, token j maps to a 60-bit integer t_j (first 15 hex chars of
md5(token) — exact in int64 everywhere), and the W-token window at offset i
hashes to the polynomial

    H_i = (t_i·B^(W-1) + t_{i+1}·B^(W-2) + ... + t_{i+W-1}) mod P

computed with ONE rolling pass per document inside ``mapInPandas`` (Arrow
batches; Python big-ints make the mulmods exact):

    H_{i+1} = (H_i·B − t_i·B^W + t_{i+W}) mod P

The DuckDB oracle verifies the same VALUES through the direct per-window sum
(a mathematical identity of the rolling recurrence), with HUGEINT mulmods —
so the streaming-style rolling computation is checked by a closed-form twin
rather than trusted.

Parameters: P = 2^61 − 1 (Mersenne prime — collision odds for n windows are
~n²/2^62: ~10⁻⁸ per 10⁹ windows), B = 1e9+7. Both sides reduce mod P per
term, so every intermediate fits 128-bit and the final hash fits BIGINT.

Scale shape: the pandas stage is a pure map (no shuffle, no state across
rows); each task emits (doc_id, off, h) rows — identical downstream shape to
the md5-window variant, so the duplicate-window shuffle and span-coverage
logic are shared.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

P = (1 << 61) - 1  # Mersenne prime 2^61-1
B = 1_000_000_007

WINS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("off", T.IntegerType()),
        T.StructField("h", T.LongType()),
    ]
)


def token_int(tok: str) -> int:
    """60-bit token fingerprint: int(md5[:15], 16) — fits int64 on every
    engine (16 nibbles would overflow a signed-int64 hex fold)."""
    import hashlib

    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)


def rolling_hashes(toks: list[str], w: int) -> list[int]:
    """Window hashes at offsets 0..len-w via the Rabin-Karp recurrence."""
    n = len(toks)
    if n < w:
        return []
    t = [token_int(x) for x in toks]
    bw = pow(B, w, P)  # B^W mod P
    h = 0
    for j in range(w):
        h = (h * B + t[j]) % P
    out = [h]
    for i in range(1, n - w + 1):
        h = (h * B - t[i - 1] * bw + t[i + w - 1]) % P
        out.append(h)
    return out


def rolling_window_hashes(base: DataFrame, w: int,
                          toks_col: str = "toks",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_id, off, h) — 1-based window offsets, one row per position, via
    one O(L) rolling pass per document in mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            offs: list[int] = []
            hs: list[int] = []
            for doc_id, toks in zip(pdf[id_col], pdf[toks_col]):
                for i, h in enumerate(rolling_hashes(list(toks), w)):
                    ids.append(int(doc_id))
                    offs.append(i + 1)
                    hs.append(h)
            # explicit dtypes: an all-empty batch would otherwise yield
            # float64 columns and fight the Arrow long/int schema
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "off": pd.Series(offs, dtype="int32"),
                    "h": pd.Series(hs, dtype="int64"),
                }
            )

    return base.select(id_col, toks_col).mapInPandas(gen, schema=WINS_SCHEMA)


def sql_rolling_window_hashes(w: int, sql_toks: str, sql_ntok: str,
                              hex2int) -> str:
    """DuckDB CTE fragment computing the SAME window-hash values by the
    direct polynomial sum (identity twin of the rolling recurrence):
    emits ``wins(doc_id, off, h)`` plus a ``t`` CTE with (toks, n_tokens).
    ``hex2int`` is the caller's hex→BIGINT SQL helper."""
    powers = [pow(B, w - 1 - j, P) for j in range(w)]
    # term j: (t_{i+j} mod P)·B^(W-1-j) mod P in HUGEINT, summed then reduced
    terms = " + ".join(
        f"(CAST({hex2int(f'substr(md5(toks[u.i + {j}]), 1, 15)')} AS HUGEINT)"
        f" * {powers[j]}) % {P}"
        for j in range(w)
    )
    return f"""t AS (
        SELECT doc_id, {sql_toks} AS toks, {sql_ntok} AS n_tokens
        FROM documents
    ), wins AS (
        SELECT doc_id, u.i AS off,
               CAST(({terms}) % {P} AS BIGINT) AS h
        FROM t, UNNEST(range(1, greatest(n_tokens - {w} + 1, 0) + 1)) u(i)
    )"""
