"""Streaming IVF index maintenance (streaming/ivf_maintenance.py): any
micro-batch split of the embedding ingest builds the SAME store as one
batch build (frozen quantizer, exact int64 assignment), replays are no-ops,
and late-arriving vectors append without touching indexed rows."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from monday_etl_spark.extensions.ivf import kmeans_fit
from monday_etl_spark.extensions.ivf_store import (
    build_ivf_index,
    query_ivf_index,
)
from monday_etl_spark.io import load_table
from monday_etl_spark.streaming.ivf_maintenance import run_ivf_maintenance

SF = "/root/testdata/sf0.001"


def _store_rows(spark, table):
    return sorted(
        (r.neighbor_id, r.cell, tuple(round(x, 9) for x in r.cv))
        for r in spark.table(table).collect()
    )


def test_split_drain_equals_batch_build_and_is_replay_safe(spark, tmp_path):
    import pyarrow.parquet as pq

    emb = load_table(spark, SF, "embeddings")
    cents = kmeans_fit(emb, k=8, iterations=3)
    suffix = uuid.uuid4().hex[:8]

    # batch twin: one-shot build over the full corpus
    batch_table = f"ivf_twin_{suffix}"
    build_ivf_index(emb, cents, table=batch_table)
    want = _store_rows(spark, batch_table)

    # adversarial 2-file split drained one file per micro-batch
    ingest = str(tmp_path / "ingest")
    os.makedirs(ingest)
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half),
                   os.path.join(ingest, "p1.embeddings.parquet"))
    pq.write_table(t.slice(half),
                   os.path.join(ingest, "p2.embeddings.parquet"))

    stream_table = f"ivf_stream_{suffix}"
    ckpt = str(tmp_path / "ckpt")
    n = run_ivf_maintenance(spark, ingest, cents, stream_table, ckpt,
                            glob="*.embeddings.parquet",
                            max_files_per_trigger=1)
    assert n == len(want)
    assert _store_rows(spark, stream_table) == want

    # re-drain with no new files: checkpoint makes it a no-op
    assert run_ivf_maintenance(spark, ingest, cents, stream_table, ckpt,
                               glob="*.embeddings.parquet") == n

    # a REPLAYED batch (same ids, fresh checkpoint) is membership-filtered
    # to nothing — decisions are exactly-once in effect
    assert run_ivf_maintenance(spark, ingest, cents, stream_table,
                               str(tmp_path / "ckpt2"),
                               glob="*.embeddings.parquet") == n
    assert _store_rows(spark, stream_table) == want

    # the maintained store answers queries exactly like the batch store
    queries = emb.filter(F.col("vec_id") < 4)
    a = query_ivf_index(spark, queries, cents, table=batch_table, k=5)
    b = query_ivf_index(spark, queries, cents, table=stream_table, k=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    # late vectors append under the frozen quantizer; indexed rows untouched
    extra = emb.limit(3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).toPandas()
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(extra),
                   os.path.join(ingest, "p3.embeddings.parquet"))
    n2 = run_ivf_maintenance(spark, ingest, cents, stream_table, ckpt,
                             glob="*.embeddings.parquet")
    assert n2 == n + 3
    got = _store_rows(spark, stream_table)
    assert [r for r in got if r[0] < 1_000_000] == want

    for tbl in (batch_table, stream_table):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
