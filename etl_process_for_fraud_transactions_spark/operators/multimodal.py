"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches via
mapInPandas.

The Spark-side machinery here is real and tested — schema contracts,
batch iteration, partition-preserving transforms, deterministic
fake featurization. The actual codec calls are stubbed behind
`_decode_image_bytes` (the image/audio libraries are not available in
this container); swapping in PIL/torchaudio/ffmpeg changes only that
one function, not the distributed plumbing.

Design notes for 100 TB of media:
- binary payloads stay columnar in parquet; metadata (width/height/
  format) lives beside them so planning-time filters (e.g. min size)
  prune row groups WITHOUT decoding;
- mapInPandas streams Arrow record batches — decode memory is bounded
  by spark.sql.execution.arrow.maxRecordsPerBatch, not partition size;
- feature extraction emits fixed-length float arrays ready for the
  similarity operators in .similarity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a multimodal asset table
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("media_format", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_bytes(payload: bytes) -> list[float]:
    """STUB decode/featurize. Real deployments replace this with
    PIL/torchvision; the container has no image codecs, so this
    produces a deterministic byte-histogram feature instead, keeping
    every distributed code path real and testable."""
    hist = [0.0] * FEATURE_DIM
    if payload:
        for b in payload:
            hist[b % FEATURE_DIM] += 1.0
        total = float(len(payload))
        hist = [h / total for h in hist]
    return hist


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.
    Partitioning is preserved (narrow transform); only the payload
    column is decoded, and only for rows that survived upstream
    metadata pruning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _decode_image_bytes(p or b"")
                    ),
                }
            )
            yield out

    return assets.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def _resize_bytes(payload: bytes, width: int, height: int) -> bytes:
    """STUB resampler (no PIL in this container): cycles the source
    bytes to exactly width*height output bytes — deterministic, size-
    correct, and replaced wholesale by a real resampler in deployment."""
    n = width * height
    if not payload:
        return bytes(n)
    reps = n // len(payload) + 1
    return (payload * reps)[:n]


def resize_images(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Arrow-batched image resize: narrow transform (no shuffle), only
    image-modality rows are decoded, output metadata carries the new
    dimensions so downstream planning filters keep working without
    touching payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_format": pdf["media_format"],
                    "payload": pdf["payload"].map(
                        lambda p: _resize_bytes(p or b"", width, height)
                    ),
                    "meta": [
                        {"width": width, "height": height, "duration_ms": m["duration_ms"] if m else None}
                        for m in pdf["meta"]
                    ],
                }
            )

    return assets.filter(F.col("modality") == "image").mapInPandas(
        run, RESIZED_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) to
    decode, derived from metadata only — the planning half of frame
    extraction, which prunes work before any codec runs. Decoding the
    planned frames is the same mapInPandas pattern as
    extract_features."""
    v = assets.filter(F.col("modality") == "video")
    return v.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def make_asset_table(
    spark, n: int = 64, payload_fn: Callable[[int], bytes] | None = None
) -> DataFrame:
    """Deterministic synthetic asset table for tests/benchmarks (no
    media libs in the container; payloads are seeded byte strings)."""
    payload_fn = payload_fn or (lambda i: bytes((i * 7 + j) % 251 for j in range(100 + i)))
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                modality,
                {"image": "png", "audio": "wav", "video": "mp4"}[modality],
                payload_fn(i),
                (64 + i, 48 + i, 5000 + 1000 * i) if modality == "video" else (64 + i, 48 + i, None),
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
