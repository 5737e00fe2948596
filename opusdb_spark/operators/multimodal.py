"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

The Spark-side machinery — schemas, partition-size control, UDF
signatures, batch shapes — is real and tested; the codec itself is
stubbed behind `decode_image` (the image/audio libraries are not in
this container) with a deterministic fake so the pipeline shape can be
verified end-to-end. Swap `_fake_decode` for a real PIL/ffmpeg call to
productionize; nothing else changes.

At 100 TB: binaries ride in parquet binary columns (or pointers to
object storage); mapInPandas processes them in Arrow batches sized by
`spark.sql.execution.arrow.maxRecordsPerBatch`, so executor memory is
bounded by batch_size × max_blob_size, and feature extraction is a pure
map — no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_luma", DoubleType()),
        StructField("aspect", DoubleType()),
    ]
)


def synthesize_media(spark, n: int = 256) -> DataFrame:
    """Deterministic fake media table (seeded by media_id) so the binary
    pipeline is exercisable without real assets."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.RandomState(int(i) % (2**31))
                kind = ["image", "audio", "video"][int(i) % 3]
                w, h = 16 + int(i) % 32, 16 + (int(i) // 2) % 32
                blob = rng.bytes(w * h)
                rows.append((int(i), kind, blob, w, h, 1 + int(i) % 8))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "content",
                    "width",
                    "height",
                    "n_frames",
                ],
            )

    # Partition count sized to the data (a few hundred synthetic rows),
    # not defaultParallelism: 32 near-empty partitions × 2 chained
    # mapInPandas stages = 64 Python-worker round-trips for ~256 rows.
    # A real 100 TB media table gets its parallelism from file splits.
    n_parts = max(1, min(8, n // 32))
    return spark.range(0, n, 1, n_parts).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder. Real pipelines put PIL.Image.open / soundfile /
    pyav here; this deterministic fake reinterprets the blob as a
    uint8 luma plane so downstream math is testable."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    return arr[: width * height].reshape(height, width)


def decode_image(blob: bytes, width: int, height: int) -> np.ndarray:
    """Decode an image blob to HxW luma. NotImplemented for real codecs
    in this container — tests run through the deterministic fake."""
    if blob[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError(
            "real image codecs unavailable in this environment; "
            "swap in PIL/pillow here"
        )
    return _fake_decode(blob, width, height)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each pandas batch decodes its blobs and emits one
    feature row per media row. Pure map — scales linearly, no shuffle.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "mean_luma": [
                    float(decode_image(b, w, h).mean())
                    for b, w, h in zip(pdf["content"], pdf["width"], pdf["height"])
                ],
                "aspect": (pdf["width"] / pdf["height"]).astype("float64"),
            }
            yield pd.DataFrame(out)

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, target: int = 8) -> DataFrame:
    """Resize/frame-sample plumbing: emits (media_id, frame_id, thumb)
    rows — one per sampled frame — showing the 1→N explode shape a real
    video pipeline uses. Thumbnail payloads are downsampled fakes."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, thumbs = [], [], []
            for _, row in pdf.iterrows():
                plane = decode_image(row["content"], row["width"], row["height"])
                small = plane[:: max(1, plane.shape[0] // target), :: max(1, plane.shape[1] // target)]
                for f in range(int(row["n_frames"])):
                    ids.append(int(row["media_id"]))
                    frames.append(f)
                    thumbs.append(small.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_id": frames, "thumb": thumbs}
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_id", IntegerType()),
            StructField("thumb", BinaryType()),
        ]
    )
    return media.mapInPandas(resize, schema=schema)


def media_summary(media: DataFrame) -> DataFrame:
    """Feature-extract then aggregate per kind — the standard QA rollup."""
    feats = extract_features(media)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.col("mean_luma").cast("decimal(27,6)"))
            .cast("double")
            .alias("sum_luma"),
        )
        .orderBy("kind")
    )
