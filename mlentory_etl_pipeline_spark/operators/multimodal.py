"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (this container has no image/audio
libs): ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (content-hash
derived features) exercises the real Spark plumbing — schema contract,
batch iteration, partition-parallel execution — exactly as a real
decoder would.

Scale notes: media bytes never pass through Python row-at-a-time; Arrow
moves whole column batches. Partition by content-size bands upstream so
decode batches are uniform; keep ``spark.sql.files.maxPartitionBytes``
small for wide binary rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real feature extractor: bytes of the
    sha256 digest scaled to [0, 1)."""
    digest = hashlib.sha256(content or b"").digest()
    return [digest[i] / 255.0 for i in range(dim)]


def decode_media(df: DataFrame, fake: bool = False, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract media rows via ``mapInPandas``.

    ``fake=True`` runs the deterministic fake decoder; ``fake=False``
    requires real codec libraries (not available here) and raises at
    plan-execution time with a clear message.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio codecs not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b or b"")),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": content.map(lambda b: _fake_features(b, feature_dim)),
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode of each frame is the stubbed step above). Pure
    ``sequence``+``explode`` — the fan-out happens JVM-side."""
    return df.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64):
    """Small deterministic media table for tests."""
    rows = []
    for i in range(n):
        media_type = ["image", "audio", "video"][i % 3]
        content = bytes([(i * 37 + j) % 256 for j in range(64 + i)])
        rows.append(
            (
                i,
                media_type,
                content,
                {"image": "png", "audio": "wav", "video": "mp4"}[media_type],
                64 if media_type == "image" else None,
                48 if media_type == "image" else None,
                3000 if media_type == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
