"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio/video libraries, so the *decode* step is a
deterministic fake (md5-derived dimensions) behind a clearly marked seam —
``decode_image_real`` raises NotImplementedError where Pillow/ffmpeg would
plug in. Everything Spark-side is real and tested: the binary column schema,
the metadata struct, the Arrow batch shapes, and the partition-parallel
``mapInPandas`` execution.

Scale notes:
- payloads travel as parquet BINARY; the scan prunes to (id, payload) only;
- ``mapInPandas`` streams Arrow batches (no per-row pickling) and is a pure
  map — no shuffle; at 100 TB this is exactly how frame-sampling / resizing
  fans out across executors;
- metadata extraction that doesn't need the payload bytes stays in JVM
  expressions (length, md5) — Python touches bytes only when it must.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal-shaped table from ``documents``: the utf-8 bytes of
    ``text`` stand in for an image payload, with a typed metadata struct the
    way a real ingest would carry (modality, byte size, content hash)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("content_md5"),
        ).alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Seam for a real decoder (Pillow / libvips / ffmpeg). Not available in
    this environment by design — see decode_image_fake for the deterministic
    stand-in the pipeline tests run with."""
    raise NotImplementedError(
        "real image decoding requires Pillow/libvips, not installed here; "
        "wire it in by replacing decode_image_fake in decoded_features()"
    )


def decode_image_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the payload md5 —
    same answer on every engine/worker, so the plumbing is testable without
    media libraries."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[:4], 16) % 2048
    height = 1 + int(h[4:8], 16) % 2048
    n_frames = 1 + int(h[8:10], 16) % 16
    return width, height, n_frames


def decoded_features(mm: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches of payload
    bytes → typed feature rows)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image_fake(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame index (JVM-side
    sequence explode — the expensive per-frame decode would hang off this
    grid in a real pipeline)."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_index"),
    )
