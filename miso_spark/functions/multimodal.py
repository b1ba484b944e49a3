"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature-extraction as Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the actual byte→pixels
decode is STUBBED: real formats raise NotImplementedError with a clear
message, while the ``fake`` format decodes deterministically so the
Spark-side plumbing (schema, mapInPandas batching, partitioning) is
fully exercised and tested. Swapping ``_decode_payload`` for a real
PIL/ffmpeg call is the only change needed on a real cluster.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media table schema: payload is opaque bytes; meta is typed
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("format", StringType(), False),  # fake|png|jpeg|wav|mp4...
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("feature_hash", StringType()),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media rows for exercising the pipeline."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        meta = (64 + i % 32, 48 + i % 24, 1000 * (1 + i % 30))
        rows.append((i, kind, "fake", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_payload(fmt: str, payload: bytes) -> np.ndarray:
    """Byte→sample decode. Real codecs are unavailable in this
    environment; only the deterministic ``fake`` format decodes."""
    if fmt == "fake":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"decode for format {fmt!r} requires an image/audio codec library "
        "(PIL/ffmpeg) not present in this environment; plug it into "
        "_decode_payload on a real cluster"
    )


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, one python
    worker per partition — scales with executor count, no driver path).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [
                _decode_payload(fmt, bytes(p))
                for fmt, p in zip(pdf["format"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(a) for a in arrs],
                    "mean_byte": [float(a.mean()) if len(a) else 0.0 for a in arrs],
                    "feature_hash": [
                        hashlib.md5(a.tobytes()).hexdigest() for a in arrs
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Sampled frame timeline for video rows — pure built-ins (sequence
    + explode), no decode required; the downstream decode of individual
    frames would go through extract_features."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


def resize_meta(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning as metadata arithmetic (aspect-preserving target
    dims); the pixel resample itself is part of the stubbed decode."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return df.select(
        "media_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("target_width"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("target_height"),
    )
