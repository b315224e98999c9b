"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched ``mapInPandas``
transforms, partition-friendly layout; only the codec kernels are stubbed
(image/audio libraries are not available in this environment) behind
``DETERMINISTIC_FAKE`` so the distributed path is testable end-to-end.

Design: media rows are ``(media_id, kind, payload binary, meta struct)``.
Decode / resize / frame-sample are ``mapInPandas`` stages: one Arrow
batch in, one out, no driver involvement, scale = partition count. At
100 TB the payload column stays opaque to Catalyst (never shuffled unless
the transform needs it) and metadata predicates prune before decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("content_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha256", StringType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

# Set True to use the deterministic fake decoder (hash-seeded features)
# instead of raising NotImplementedError for real codec work.
DETERMINISTIC_FAKE = True
FEATURE_DIM = 16


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: real deployment would decode via Pillow/torchaudio/ffmpeg.

    The deterministic fake derives a FEATURE_DIM float vector from the
    payload digest so tests exercise the full distributed pipeline with
    stable outputs.
    """
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError(
            f"{kind} decoding requires codec libraries not present here"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((4 * FEATURE_DIM) // len(digest) + 1))[: 4 * FEATURE_DIM], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over media rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = [
                _decode_stub(p if p is not None else b"", k).tolist()
                for p, k in zip(payloads, pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing: payload -> payload, metadata updated.

    The pixel transform is stubbed (real deployment: Pillow/opencv inside
    the same batch loop); what is real and tested is the Arrow-batched
    binary-in/binary-out shape — the payload column round-trips through
    ``mapInPandas`` untouched by Catalyst, and the output schema carries
    the new dimensions.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not DETERMINISTIC_FAKE:
                raise NotImplementedError(
                    "image resize requires codec libraries not present here"
                )
            out = pdf.copy()
            # STUB: deterministic fake "resize" tags the payload with the
            # target dims; a real kernel decodes + resamples + re-encodes.
            out["payload"] = [
                (p if p is not None else b"")
                + b"|resized:%dx%d" % (width, height)
                for p in pdf["payload"]
            ]
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return df.where(F.col("kind") == "image").mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    Frame extraction itself is stubbed (payload digest + frame index);
    the explode/fan-out shape — the part that matters for partitioning —
    is real.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame_sha256", StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_sha256": []}
            for _, row in pdf.iterrows():
                duration = row["duration_ms"] or 0
                n_frames = max(int(duration // every_ms), 0)
                payload = row["payload"] if row["payload"] is not None else b""
                for i in range(n_frames):
                    rows["media_id"].append(row["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame_sha256"].append(
                        hashlib.sha256(payload + i.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.where(F.col("kind") == "video").mapInPandas(batches, schema=out_schema)
