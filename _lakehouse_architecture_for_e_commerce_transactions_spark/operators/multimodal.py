"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — schema contract, Arrow
batch shape, ``mapInPandas`` partition-parallel decode, partition sizing.
Container-header decode is REAL: ``parse_media_header`` reads PNG / BMP /
GIF / WAV / JPEG dimensions and audio rates in pure Python (magic bytes +
fixed fields + chunk/segment walks — no codec library needed), and
``extract_media_headers`` runs it partition-parallel. Full pixel/sample
decode (PIL/ffmpeg are not in this container) stays behind
``decode_image_stub``, which now returns header metadata for the parsed
containers and raises ``NotImplementedError`` only for formats that
genuinely need an entropy decoder. ``extract_image_meta`` keeps the
sha-derived deterministic metadata used by the oracle-checked catalog rows.

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


def _make_header_parser():
    """Build the container-header parse function as a DYNAMIC closure.

    Single source of truth for PNG / BMP / GIF / WAV / JPEG header
    logic: both the driver-side ``parse_media_header`` and the
    executor-side ``extract_media_headers`` batch function call this, and
    because the returned function is dynamically created, cloudpickle
    ships it BY VALUE — executors never need this package importable
    (the same rationale as ``extract_image_meta``), without restating the
    parser in two places.

    Unsigned 32-bit dimension/rate fields that exceed int32 (a corrupt
    or crafted header) are treated as unparseable rather than returned —
    the extractor's output columns are int32 and a poison value must not
    kill the task."""
    import struct

    _INT32_MAX = 2**31 - 1

    def parse(payload: bytes) -> dict | None:
        b = bytes(payload)
        if (
            b[:8] == b"\x89PNG\r\n\x1a\n"
            and len(b) >= 24
            and b[12:16] == b"IHDR"
        ):
            w, h = struct.unpack(">II", b[16:24])
            if w > _INT32_MAX or h > _INT32_MAX:
                return None
            return {"format": "png", "width": w, "height": h}
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            # negative height encodes top-down row order
            return {"format": "bmp", "width": w, "height": abs(h)}
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return {"format": "gif", "width": w, "height": h}
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            off = 12
            while off + 8 <= len(b):  # chunk walk: id, size, payload
                cid = b[off : off + 4]
                (size,) = struct.unpack("<I", b[off + 4 : off + 8])
                if cid == b"fmt " and off + 16 <= len(b):
                    ch, sr = struct.unpack("<HI", b[off + 10 : off + 16])
                    if sr > _INT32_MAX:
                        return None
                    return {
                        "format": "wav",
                        "sample_rate": sr,
                        "n_channels": ch,
                    }
                off += 8 + size + (size & 1)  # chunks are word-aligned
            return None
        if b[:2] == b"\xff\xd8":  # JPEG: segment walk to the first SOFn
            sof = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
            off = 2
            while off + 4 <= len(b) and b[off] == 0xFF:
                marker = b[off + 1]
                if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                    off += 2  # standalone markers carry no length
                    continue
                (seglen,) = struct.unpack(">H", b[off + 2 : off + 4])
                if marker in sof and off + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[off + 5 : off + 9])
                    return {"format": "jpeg", "width": w, "height": h}
                off += 2 + seglen
            return None
        return None

    return parse


def parse_media_header(payload: bytes) -> dict | None:
    """Pure-Python container-header parse: PNG / BMP / GIF / WAV / JPEG.

    Returns ``{"format", "width", "height"}`` for images,
    ``{"format", "sample_rate", "n_channels"}`` for WAV, or ``None`` when
    the magic bytes match no supported container (or the header is
    truncated/corrupt/out-of-int32-range). Only fixed header fields and
    chunk/segment walks are read — never entropy-coded payload — so this
    is dependency-free and O(header) per file.
    """
    return _make_header_parser()(payload)


def decode_image_stub(payload: bytes) -> object:
    """Header-level decode for the containers ``parse_media_header``
    understands; full pixel decode (PIL.Image.open etc.) would replace
    the NotImplementedError branch."""
    meta = parse_media_header(payload)
    if meta is not None:
        return meta
    raise NotImplementedError(
        "full image codecs are not available in this environment; "
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


MEDIA_HEADER_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
    ]
)


def extract_media_headers(media: DataFrame) -> DataFrame:
    """Partition-parallel REAL header parse over binary payloads: one
    Arrow batch in, header metadata out (payloads never leave the task).
    Unparseable payloads yield null fields, not failures — at corpus
    scale a poison file must not kill the job. The parse closure comes
    from ``_make_header_parser`` and ships by value (dynamic function),
    so executors still never need this package importable and the parser
    has a single source of truth."""
    parse_core = _make_header_parser()
    _fields = ("format", "width", "height", "sample_rate", "n_channels")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def parse(b: bytes) -> dict:
            meta = parse_core(b) or {}
            return {k: meta.get(k) for k in _fields}

        for pdf in it:
            metas = [parse(bytes(p)) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "n_channels": [m["n_channels"] for m in metas],
                }
            )

    return media.mapInPandas(batches, MEDIA_HEADER_SCHEMA)


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
