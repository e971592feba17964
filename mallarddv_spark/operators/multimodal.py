"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched Pandas UDFs.

The Spark-side architecture is fully real — schemas, partitioning, UDF
signatures, batch shapes, metadata propagation. The media *decode* kernels
are stubbed behind deterministic fakes (this container ships no image/audio
libraries): each stub documents exactly where PIL/ffmpeg/torchvision would
plug in, and raises/flags cleanly rather than pretending.

Scale notes (100 TB of media):
* media bytes live in the table (or as object-store URIs for >2 GB blobs);
  either way the *metadata* columns are what queries filter on, so wide
  scans prune to metadata-only column groups (parquet column pruning);
* decode/feature-extraction runs in ``mapInPandas`` — one Python worker per
  partition, Arrow-batched, with ``maxRecordsPerBatch`` bounding memory;
* never ``collect()`` media to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-column schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("byte_len", IntegerType(), True),
        StructField("content_md5", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_len", IntegerType(), True),
        StructField("content_md5", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("decode_ok", StringType(), True),  # ok|stubbed|error
    ]
)


def attach_media_metadata(
    df: DataFrame, id_col: str, payload_col: str, modality: str, mime: str | None = None
) -> DataFrame:
    """Wrap a raw binary column in the canonical media schema — metadata
    (length, content hash) computed JVM-side, payload untouched."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime_type"),
        F.col(payload_col).alias("payload"),
        F.length(payload_col).cast("int").alias("byte_len"),
        F.md5(payload_col).alias("content_md5"),
    )


def _decode_stub(payload: bytes, modality: str) -> dict:
    """STUB: deterministic fake decode.

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))`` for images,
    ``soundfile``/``ffmpeg`` for audio/video. Neither library ships in this
    container, so we derive deterministic fake dimensions from the content
    hash — keeping every downstream join/groupBy/test real and reproducible.
    """
    h = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192 if modality in ("image", "video") else None,
        "height": 64 + h[1] % 192 if modality in ("image", "video") else None,
        "n_frames": 1 + h[2] % 300 if modality in ("video", "audio") else 1,
        "decode_ok": "stubbed",
    }


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    The partition-iterator shape is the real production pattern: the worker
    streams record batches, decodes each payload, emits a narrow feature
    frame. Swap ``_decode_stub`` for a real kernel and nothing else changes.
    """
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            out.insert(2, "byte_len", pdf["byte_len"].values)
            out.insert(3, "content_md5", pdf["content_md5"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize. Real kernel: PIL ``Image.resize`` inside the same
    mapInPandas shape as :func:`extract_features`; here payloads pass
    through and the target dims are recorded (schema/plumbing exercised)."""
    return media.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling — records the sampling spec; the ffmpeg
    kernel slots into the mapInPandas pattern above."""
    return media.withColumn("frame_stride", F.lit(every_n))
