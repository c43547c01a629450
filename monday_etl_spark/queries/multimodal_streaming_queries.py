"""Registry entries: multimodal decode plumbing + Structured Streaming rollup.

The multimodal decode runs through a real mapInPandas (Arrow-batched Python)
with a deterministic md5-derived fake decoder, so its oracle can re-derive
the exact same features in SQL — the Spark-side plumbing (binary columns,
UDF batch shape, schema) is what's actually under test.

The streaming rollup executes a real Structured Streaming query
(Trigger.AvailableNow, watermark, dropDuplicatesWithinWatermark) whose
drained result equals the batch aggregate — giving it a plain SQL oracle.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..extensions.multimodal import attach_payload, decoded_features, frame_sample_plan
from ..functions import sql_money_sum
from ..io import load_table
from .registry import register

# hex nibble fold: DuckDB twin of Python's int(hex_str, 16)
def _hex2int(expr: str) -> str:
    return (
        f"list_reduce(list_transform(string_split({expr}, ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        f"(a, b) -> a * 16 + b)"
    )


@register(
    "multimodal_decode",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(1 + {_hex2int("substr(md5(text), 1, 4)")} % 2048 AS INTEGER) AS width,
           CAST(1 + {_hex2int("substr(md5(text), 5, 4)")} % 2048 AS INTEGER) AS height,
           CAST(1 + {_hex2int("substr(md5(text), 9, 2)")} % 16 AS INTEGER) AS n_frames
    FROM documents
    """,
    doc="Multimodal decode plumbing: binary payload + metadata struct → "
        "mapInPandas (Arrow batches) → typed features. The decoder is a "
        "deterministic md5 fake (container has no media libs; the real-"
        "decoder seam is decode_image_real). Pure map, no shuffle.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decoded_features(attach_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               CAST(1 + {_hex2int("substr(md5(text), 9, 2)")} % 16 AS INTEGER)
                   AS n_frames
        FROM documents
    )
    SELECT doc_id, n_frames, CAST(u.f AS INTEGER) AS frame_index
    FROM d, UNNEST(range(0, n_frames, 4)) AS u(f)
    """,
    doc="Frame-sampling grid: every-4th frame index per document, exploded "
        "JVM-side (the per-frame decode fans out from this at scale).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(decoded_features(attach_payload(docs)), every_nth=4)


_stream_counter = itertools.count()


@register(
    "streaming_stateful_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
    FROM flagged
    """,
    doc="Custom stateful streaming operator (SURVEY §2.10 extension point): "
        "gap sessionization via applyInPandasWithState — per-user (last_ts, "
        "session_no) state across micro-batches, Arrow-batched groups. On a "
        "drained AvailableNow source it equals the batch window sessionizer, "
        "which is the SQL oracle.",
)
def streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful_sessions import run_stateful_sessions

    name = f"stateful_sessions_q{next(_stream_counter)}"
    # durable parquet sink + lazy read: the drained result never transits the
    # driver (at 100x the sessions a toPandas round-trip is a driver OOM).
    # mkdtemp outlives the call so the returned lazy frame stays readable;
    # the checkpoint lives beside the data (exactly-once on restart).
    out_root = tempfile.mkdtemp(prefix=f"{name}_")
    return run_stateful_sessions(
        spark, sf_dir, f"{out_root}/ckpt", name=name,
        out_path=f"{out_root}/out",
    )


@register(
    "streaming_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us, epoch_us(v.ts) AS view_ts_us
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
    doc="Stream-STREAM watermarked interval join (the flavor stream-static "
        "enrichment can't express): purchases attributed to every prior "
        "view by the same user within 1 hour, both sides watermarked so "
        "join state stays bounded by the window+delay horizon, drained "
        "AvailableNow into a durable append sink. Equals the batch range "
        "join, which is the oracle; the 2-micro-batch cross-boundary case "
        "is pinned by tests/test_interval_join.py "
        "(streaming/interval_join.py).",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.interval_join import run_view_purchase_attribution

    name = f"interval_join_q{next(_stream_counter)}"
    out_root = tempfile.mkdtemp(prefix=f"{name}_")
    return run_view_purchase_attribution(
        spark, sf_dir, f"{out_root}/ckpt", f"{out_root}/out"
    )


@register(
    "streaming_daily_rollup",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           COUNT(*) AS n_events,
           {sql_money_sum('value')} AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
    doc="Structured Streaming daily rollup (SURVEY §2.10): AvailableNow "
        "drain, 1-day watermark, dropDuplicatesWithinWatermark(event_id), "
        "1-day tumbling window per event_type. Drained result == the batch "
        "daily aggregate, which is the oracle.",
)
def streaming_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.snapshot_stream import run_available_now

    name = f"daily_rollup_stream_{next(_stream_counter)}"
    # foreachBatch-overwritten parquet + lazy read: executor-side end-to-end
    # (see streaming_stateful_sessions for the driver-OOM rationale)
    out_root = tempfile.mkdtemp(prefix=f"{name}_")
    return run_available_now(
        spark, sf_dir, f"{out_root}/ckpt", out_table=name,
        out_path=f"{out_root}/out",
    )


def _incremental_dedup_oracle() -> str:
    """Single-drain twin of the streaming incremental dedup: reject doc b iff
    some a < b shares a band bucket with est_jaccard >= 0.5 (signature CTEs
    identical to the green dedup_minhash_lsh oracle)."""
    from .extensions_queries import _DIGS, _NORM, _SHINGLES, _SIG

    return f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    digs AS (SELECT doc_id, {_DIGS} AS digs FROM sh),
    sigs AS (SELECT doc_id, {_SIG} AS sig FROM digs),
    banded AS (
        SELECT doc_id, sig, b,
               md5(array_to_string(sig[b*4+1 : b*4+4], '|')) AS bh
        FROM sigs, UNNEST(range(0, 4)) AS u(b)
    ),
    rejected AS (
        SELECT DISTINCT r.doc_id
        FROM banded l JOIN banded r
          ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id
        WHERE CAST(len([i for i in range(1, 17) if l.sig[i] = r.sig[i]])
                   AS DOUBLE) / 16.0 >= 0.5
    )
    SELECT d.doc_id, rej.doc_id IS NULL AS is_kept
    FROM documents d LEFT JOIN rejected rej ON d.doc_id = rej.doc_id
    """


@register(
    "streaming_incremental_dedup",
    oracle=_incremental_dedup_oracle(),
    doc="Streaming incremental near-dup dedup (crawl-dedup shape): each "
        "micro-batch probes the bucketed MinHash signature store for "
        "collisions with everything seen so far, resolves within-batch "
        "collisions by doc_id, emits keep/reject decisions executor-side, "
        "and appends its signatures to the store. A fresh-store AvailableNow "
        "drain equals the batch rule — reject b iff some a < b collides at "
        "est_jaccard >= 0.5 — which is the SQL oracle.",
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental_dedup import run_incremental_dedup

    name = f"incdedup_{next(_stream_counter)}"
    out_root = tempfile.mkdtemp(prefix=f"{name}_")
    # store table name derived from the unique mkdtemp so a leftover
    # warehouse table from an earlier session can never be probed by mistake
    store = f"sigstore_{os.path.basename(out_root).lower()}"
    result = run_incremental_dedup(
        spark, sf_dir, store_table=store,
        out_path=f"{out_root}/out", checkpoint_dir=f"{out_root}/ckpt",
        threshold=0.5,
    )
    # the decisions sink doesn't depend on the store; this call's one-shot
    # store would otherwise accumulate in the warehouse run over run
    # (a real incremental deployment calls run_incremental_dedup directly
    # and KEEPS its store — that's the point of it)
    spark.sql(f"DROP TABLE IF EXISTS {store}")
    return result


@register(
    "streaming_trending_topk",
    oracle="""
    WITH counts AS (
        SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS window_start_us,
               event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT window_start_us, event_type, n_events, rnk
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY window_start_us
                   ORDER BY n_events DESC, event_type) AS INTEGER) AS rnk
        FROM counts
    ) t WHERE rnk <= 3
    """,
    doc="Streaming trending-now: watermarked 6h tumbling counts per "
        "event_type (complete mode), top-3 per window ranked inside "
        "foreachBatch on each emission — ranking runs over the aggregate "
        "(windows x types), never over raw events. AvailableNow drain of "
        "the static dir == the batch tumbling top-3, which is the oracle. "
        "Durable parquet sink + lazy read (streaming/trending.py).",
)
def streaming_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.trending import run_trending_topk

    name = f"trending_topk_{next(_stream_counter)}"
    out_root = tempfile.mkdtemp(prefix=f"{name}_")
    return run_trending_topk(
        spark, sf_dir, f"{out_root}/ckpt", out_path=f"{out_root}/out"
    )


@register(
    "streaming_enriched_rollup",
    oracle=f"""
    SELECT CAST(e.ts AS DATE) AS event_date, c.c_mktsegment,
           COUNT(*) AS n_events,
           {sql_money_sum('e.value')} AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY CAST(e.ts AS DATE), c.c_mktsegment
    """,
    doc="Stream-static enrichment rollup: the events stream joined to the "
        "broadcast customer dimension (STATELESS stream-static join — the "
        "static side re-resolves per micro-batch, so dimension updates are "
        "picked up without restarts) -> watermarked daily rollup per "
        "market segment. AvailableNow drain == the batch join+aggregate, "
        "which is the oracle. Durable sink + lazy read "
        "(streaming/enriched.py).",
)
def streaming_enriched_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.enriched import run_enriched_rollup

    name = f"enriched_rollup_{next(_stream_counter)}"
    out_root = tempfile.mkdtemp(prefix=f"{name}_")
    return run_enriched_rollup(
        spark, sf_dir, f"{out_root}/ckpt", out_path=f"{out_root}/out"
    )
