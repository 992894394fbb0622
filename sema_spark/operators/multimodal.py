"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The Spark-side contract is real and tested — schemas, Arrow batch shape,
partition-stable UDF signatures, frame-sample fan-out — while the actual
codec work is stubbed (no image/audio libs in this container): decoders
either raise ``NotImplementedError`` (``strict=True``) or produce a
deterministic fake derived from the content bytes, so the pipeline shape
can be exercised end-to-end and a real decoder (PIL/ffmpeg) can be
dropped into ``_decode_*`` without touching any Spark plumbing.
"""

from __future__ import annotations

import hashlib

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

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("meta", StructType(
            [
                StructField("width", IntegerType(), True),
                StructField("height", IntegerType(), True),
                StructField("duration_ms", LongType(), True),
                StructField("sample_rate", IntegerType(), True),
            ]
        ), True),
    ]
)

FEATURE_DIM = 64


def _fake_feature(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-feature vector: sha256 of the
    payload's HEX encoding, bytes scaled to [0,1].  Stable across
    processes; hashing the hex string (not the raw bytes) keeps the
    whole derivation expressible in the DuckDB oracle, whose sha256 only
    accepts VARCHAR."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.sha256(payload.hex().encode()).digest()
    reps = (dim // len(digest)) + 1
    raw = (digest * reps)[:dim]
    return [b / 255.0 for b in raw]


def decode_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """media rows → (media_id, kind, feature array<float>).

    ``strict=True`` raises NotImplementedError where a real decoder
    belongs; ``strict=False`` emits the deterministic fake so the
    downstream plumbing (similarity, dedup) can run.
    """

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg; wire it in here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": pdf["bytes"].map(lambda b: _fake_feature(bytes(b) if b is not None else None)),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("feature", ArrayType(FloatType(), False), False),
        ]
    )
    return df.select("media_id", "kind", "bytes").mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """video rows → one row per sampled frame (media_id, frame_idx, ts_ms,
    frame_bytes).  Fan-out shape is real; frame extraction is stubbed as
    content-derived fake bytes."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_bytes": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["bytes"], pdf["meta"]):
                if strict:
                    raise NotImplementedError("real frame sampling requires ffmpeg")
                duration = (meta["duration_ms"] if meta is not None and meta["duration_ms"] is not None else 0)
                n_frames = max(int(duration // every_ms), 1)
                base = bytes(payload) if payload is not None else b""
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_bytes"].append(hashlib.sha256(base + i.to_bytes(4, "little")).digest())
            yield pd.DataFrame(out)

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("frame_bytes", BinaryType(), False),
        ]
    )
    return df.filter(F.col("kind") == "video").select("media_id", "bytes", "meta").mapInPandas(
        run, schema=schema
    )


def synthetic_media(spark, n: int = 24) -> DataFrame:
    """Deterministic fake media table for tests/demos."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "duration_ms": 3500 if kind == "video" else (2000 if kind == "audio" else None),
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, f"application/x-fake-{kind}", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA)
