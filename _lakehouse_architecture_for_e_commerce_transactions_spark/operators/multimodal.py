"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — schema contract, Arrow
batch shape, ``mapInPandas`` partition-parallel decode, partition sizing —
while the actual codec calls are stubbed (PIL/ffmpeg are not in this
container): ``decode_image_meta`` derives deterministic fake metadata from
the bytes, and ``decode_image_stub`` raises ``NotImplementedError`` where a
real decoder would run. Swapping in a real decoder changes only the body of
the per-batch function, not the plumbing.

Design for 100 TB of media: binary payloads stay columnar (parquet binary
with metadata columns for pruning), decode runs inside ``mapInPandas`` so
bytes never leave the executor, and ``spark.sql.files.maxPartitionBytes``
bounds the per-task working set.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("media_type", StringType(), False),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)


def decode_image_stub(payload: bytes) -> object:
    """Where a real decoder (PIL.Image.open etc.) would run."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "swap in PIL/torchvision here"
    )


def _fake_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decoded (width, height, format): derived
    from the content hash so tests are stable and distribution-friendly."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    fmt = ("jpeg", "png", "webp")[h[2] % 3]
    return width, height, fmt


def extract_image_meta(media: DataFrame) -> DataFrame:
    """Partition-parallel metadata extraction over binary payloads.

    ``mapInPandas``: one Arrow batch in, one out — the payload column is
    dropped from the output so only small metadata crosses any shuffle.

    The batch function is deliberately self-contained (its own imports, no
    references to module globals): cloudpickle then ships it by value, so
    executors never need this package importable on their PYTHONPATH.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def fake_meta(payload: bytes) -> tuple[int, int, str]:
            h = _hl.sha256(payload).digest()
            return (
                64 + h[0] % 192,
                64 + h[1] % 192,
                ("jpeg", "png", "webp")[h[2] % 3],
            )

        for pdf in it:
            payloads = pdf["payload"]
            metas = [fake_meta(bytes(p)) for p in payloads]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": [
                        _hl.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return media.mapInPandas(batches, IMAGE_META_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: the row-explosion plumbing (media_id →
    frame_idx rows) with the decode left as a stub column. Real frame
    extraction would replace the payload-derived fake frame count."""
    n_frames = (F.length("payload") % 240 + 1).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn("n_frames", n_frames)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Test-fixture helper: a media table with real binary payloads (UTF-8
    document bytes) so the plumbing runs on actual data in this container."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("video"))
        .when(F.col("doc_id") % 3 == 1, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("media_type"),
    )
